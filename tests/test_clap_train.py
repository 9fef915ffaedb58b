"""CLAP contrastive pre-training recipe (reference open_clap training stack:
model.py CLAP + loss.py ClipLoss w/ distributed feature gathering). Runs on
the 8-device virtual mesh so the sharded-batch global similarity matrix
(GSPMD all-gather) is exercised."""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np

from audiogpt_tpu.models.textenc.clap import CLAPTextConfig
from audiogpt_tpu.train import Trainer, TrainerConfig
from audiogpt_tpu.train.optim import OptimConfig
from audiogpt_tpu.train.tasks import CLAPTask, CLAPTaskConfig


def _tiny_task():
    from audiogpt_tpu.models.caption.cnn14 import Cnn14Config
    from audiogpt_tpu.models.textenc.bert import BertConfig

    tc = CLAPTextConfig(
        bert=BertConfig(vocab_size=200, hidden_size=32, num_layers=1,
                        num_heads=2, intermediate_size=64),
        d_proj=16)
    # narrow audio tower: the full 64→2048-channel Cnn14 made each step take
    # ~60 s on the 1-core CI host, staggering the 8 device threads past XLA
    # CPU's 40 s in-process all-gather rendezvous termination window
    # (rendezvous.cc F-abort) — the contrastive mechanics are width-agnostic
    return CLAPTask(CLAPTaskConfig(
        text=tc, d_proj=16,
        audio=Cnn14Config(channels=(8, 8, 16, 16, 32, 32)),
        optim=OptimConfig(schedule="constant", lr=2e-3)))


def _batch(rng, b=8, t=10240, l=8):
    return {
        "wav": rng.normal(size=(b, t)).astype(np.float32) * 0.1,
        "text_ids": rng.integers(3, 200, (b, l)).astype(np.int32),
        "text_mask": np.ones((b, l), np.int32),
        "weight": np.ones(b, np.float32),
    }


def test_masked_infonce_ignores_dummy_rows():
    logits = jnp.asarray(np.eye(4, dtype=np.float32) * 5.0)
    w_all = jnp.ones(4)
    w_half = jnp.asarray([1.0, 1.0, 0.0, 0.0])
    l_all = CLAPTask._masked_infonce(logits, w_all)
    l_half = CLAPTask._masked_infonce(logits, w_half)
    assert np.isfinite(float(l_all)) and np.isfinite(float(l_half))
    # with fewer negatives the diagonal softmax is easier → lower loss
    assert float(l_half) <= float(l_all) + 1e-6
    # a dummy diagonal with huge wrong logits must not leak into the loss
    bad = logits.at[2, 0].set(100.0)
    assert abs(float(CLAPTask._masked_infonce(bad, w_half)) -
               float(l_half)) < 1e-5


def test_clap_trainer_learns_pairing(tmp_path):
    task = _tiny_task()
    tcfg = TrainerConfig(work_dir=str(tmp_path), max_updates=12,
                         val_check_interval=100, log_interval=3,
                         num_sanity_val_steps=0, use_tensorboard=False)
    trainer = Trainer(task, tcfg)
    rng = np.random.default_rng(0)
    batch = _batch(rng)

    def gen():
        while True:
            yield batch

    state = trainer.fit(gen())
    assert int(jax.device_get(state["step"])) == 12
    lines = [json.loads(l) for l in open(os.path.join(tmp_path, "metrics.jsonl"))]
    tr = [l for l in lines if l["prefix"] == "tr"]
    assert all(l["nonfinite"] == 0 for l in tr)
    # memorizing a fixed batch: symmetric InfoNCE must drop
    assert tr[-1]["total_loss"] < tr[0]["total_loss"]
    assert 0.0 < tr[0]["scale"] < 100.0
