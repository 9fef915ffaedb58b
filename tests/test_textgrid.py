"""TextGrid forced-alignment ingestion (VERDICT r1 missing#4): parse MFA
TextGrids into mel2ph like the reference (``base_binarizer.py:188`` →
``data_gen_utils.py:274 get_mel2ph``), keep uniform alignment as fallback.
Includes a direct oracle-parity check against the reference implementation.
"""

import sys
import textwrap

import numpy as np
import pytest

from audiogpt_tpu.data.textgrid import (
    is_sil_phoneme, mel2ph_from_textgrid, parse_textgrid,
)

sys.path.insert(0, "tests") if "tests" not in sys.path else None


def _tg(intervals, words=(("0.0", "1.0", "hello"),)):
    """Render a long-format TextGrid with a words tier + a phones tier."""
    def tier(name, items):
        body = ""
        for i, (a, b, t) in enumerate(items, 1):
            body += textwrap.dedent(f"""\
                intervals [{i}]:
                    xmin = {a}
                    xmax = {b}
                    text = "{t}"
            """)
        return textwrap.dedent(f"""\
            item [{{n}}]:
                class = "IntervalTier"
                name = "{name}"
                xmin = 0.0
                xmax = 1.0
                intervals: size = {len(items)}
            """) + body

    head = textwrap.dedent("""\
        File type = "ooTextFile"
        Object class = "TextGrid"

        xmin = 0.0
        xmax = 1.0
        tiers? <exists>
        size = 2
        item []:
    """)
    return head + tier("words", words).replace("{n}", "1") + \
        tier("phones", intervals).replace("{n}", "2")


PHONES = ["<BOS>", "HH", "AH0", "L", "OW1", "<EOS>"]
INTERVALS = [
    ("0.00", "0.10", "sil"),
    ("0.10", "0.20", "HH"),
    ("0.20", "0.35", "AH0"),
    ("0.35", "0.50", "L"),
    ("0.50", "0.80", "OW1"),
    ("0.80", "1.00", "sp"),
]
SR, HOP, FRAMES = 22050, 256, 87


def test_parse_textgrid_tiers():
    tiers = parse_textgrid(_tg(INTERVALS))
    assert [name for name, _ in tiers] == ["words", "phones"]
    assert len(tiers[1][1]) == 6
    assert tiers[1][1][1] == (0.10, 0.20, "HH")


def test_mel2ph_boundaries_and_durations():
    mel2ph, dur = mel2ph_from_textgrid(_tg(INTERVALS), PHONES, FRAMES,
                                       SR, HOP)
    assert mel2ph.shape == (FRAMES,) and mel2ph.min() >= 1
    assert dur.sum() == FRAMES
    # <BOS> covers the leading silence: 0.1 s = ~9 frames
    assert dur[0] == int(0.10 * SR / HOP + 0.5)
    # HH starts exactly at its xmin frame
    start_hh = int(0.10 * SR / HOP + 0.5)
    assert mel2ph[start_hh] == 2 and mel2ph[start_hh - 1] == 1
    # trailing silence belongs to <EOS>
    assert mel2ph[-1] == len(PHONES)


def test_mismatch_raises():
    with pytest.raises(ValueError, match="mismatch"):
        mel2ph_from_textgrid(_tg(INTERVALS), ["<BOS>", "HH", "AH0", "<EOS>"],
                             FRAMES, SR, HOP)


def test_sil_phone_without_gap_gets_zero_duration():
    # no gap between OW1 and the next phone: mid-sentence punctuation phone
    phones = ["<BOS>", "HH", "AH0", ",", "L", "OW1", "<EOS>"]
    ivs = INTERVALS  # no extra sil interval for the comma
    mel2ph, dur = mel2ph_from_textgrid(_tg(ivs), phones, FRAMES, SR, HOP)
    assert dur[3] == 0                    # the comma
    assert dur.sum() == FRAMES


def test_oracle_parity_vs_reference_get_mel2ph(tmp_path):
    """Same TextGrid + phones through the reference get_mel2ph → identical
    mel2ph and durations."""
    import ref_torch

    dg = ref_torch.load_data_gen_utils()
    hp = {"audio_sample_rate": SR, "hop_size": HOP}
    tg_path = tmp_path / "item.TextGrid"
    tg_path.write_text(_tg(INTERVALS))
    mel = np.zeros((FRAMES, 80), np.float32)
    want_m2p, want_dur = dg.get_mel2ph(str(tg_path), " ".join(PHONES), mel,
                                       hp)
    got_m2p, got_dur = mel2ph_from_textgrid(_tg(INTERVALS), PHONES, FRAMES,
                                            SR, HOP)
    np.testing.assert_array_equal(got_m2p, want_m2p)
    np.testing.assert_array_equal(got_dur, want_dur)


def test_binarizer_ingests_textgrid_and_fs2_trains(tmp_path):
    """End-to-end: binarize with a TextGrid → records carry aligned mel2ph →
    FS2Task runs one real step on them (VERDICT r1 #6 done-condition)."""
    import jax

    from audiogpt_tpu.data import (
        BinarizeConfig, BucketSpec, Item, TTSBinarizer, TTSDataLoader,
        load_split,
    )
    from audiogpt_tpu.models.tts.fastspeech2 import FastSpeech2Config
    from audiogpt_tpu.train import OptimConfig, Trainer, TrainerConfig
    from audiogpt_tpu.train.tasks import FS2Task, FS2TaskConfig

    rng = np.random.default_rng(0)
    wav = (rng.normal(size=SR) * 0.1).astype(np.float32)  # 1 s
    items = [Item(name=f"u{i}", wav=wav, phones=PHONES,
                  textgrid=_tg(INTERVALS)) for i in range(4)]
    out = str(tmp_path / "bin")
    TTSBinarizer(BinarizeConfig(valid_fraction=0.0)).binarize(items, out)

    ds = load_split(out, "train")
    rec = ds[0]
    assert "mel2ph" in rec and rec["mel2ph"].max() == len(PHONES)
    # alignment came from the TextGrid, not uniform: HH boundary is exact
    assert rec["mel2ph"][int(0.10 * SR / HOP + 0.5)] == 2

    task = FS2Task(FS2TaskConfig(
        model=FastSpeech2Config(
            vocab_size=64, hidden_size=16, enc_layers=1, dec_layers=1,
            num_heads=2, enc_ffn_kernel_size=3, dec_ffn_kernel_size=3,
            dur_predictor_layers=1, predictor_layers=1, predictor_hidden=8,
            max_frames=128),
        lambda_ssim=0.0, optim=OptimConfig(schedule="constant", lr=1e-3)))
    trainer = Trainer(task, TrainerConfig(
        work_dir=str(tmp_path / "exp"), max_updates=1, val_check_interval=50,
        log_interval=1, num_sanity_val_steps=0, use_tensorboard=False))
    loader = TTSDataLoader(ds, spec=BucketSpec.dyadic(128, 8, min_batch=8))
    state = trainer.fit(iter(loader))
    assert int(jax.device_get(state["step"])) == 1
