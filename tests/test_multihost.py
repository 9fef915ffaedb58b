"""Two-process multi-host integration test (SURVEY.md §2.6 / VERDICT r3
next #6): ``parallel/mesh.py distributed_init`` + ``local_batch_slice`` were
the only distributed surfaces with zero test coverage — multi-host was
asserted, not tested.

Shape: two local CPU processes (4 virtual devices each) join via
``jax.distributed`` with a local coordinator — the per-host runtime of a TPU
pod — build the global 8-device ``('data','model')`` mesh, and run tiny-FS2
trainer steps where each process materializes ONLY its half of the global
batch (``local_batch_slice`` + ``jax.make_array_from_process_local_data``,
the DistributedSampler replacement). The per-step losses must equal a
single-process 8-device run of the identical config: pure-DP gradient psum
over two processes is the same reduction as over one.
"""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CHILD = os.path.join(REPO, "tests", "_multihost_child.py")
STEPS = 3


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def _single_process_losses(steps: int = STEPS) -> list[float]:
    """The oracle: same task/config/batch on this process's own 8-device
    mesh (conftest), same lower-level step path as the children."""
    import jax

    from audiogpt_tpu.parallel.mesh import make_mesh, shard_batch
    from audiogpt_tpu.train import Trainer, TrainerConfig
    from test_train import _fs2_batch, _tiny_fs2_task

    mesh = make_mesh()
    trainer = Trainer(_tiny_fs2_task(), TrainerConfig(
        work_dir="/tmp/mh_single", use_tensorboard=False), mesh=mesh)
    state = trainer.init_state()
    full = _fs2_batch(np.random.default_rng(0), b=8)
    step_fn = trainer.train_step("model")
    rng = jax.random.PRNGKey(0)
    losses = []
    for _ in range(steps):
        state, metrics = step_fn(state, shard_batch(full, mesh), rng)
        losses.append(float(jax.device_get(metrics["total_loss"])))
    return losses


@pytest.mark.slow
def test_two_process_mesh_matches_single_process(tmp_path):
    port = _free_port()
    out = tmp_path / "child0.json"
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)  # children set their own 4-device flag
    procs = [
        subprocess.Popen(
            [sys.executable, CHILD, "--coord", f"127.0.0.1:{port}",
             "--process-id", str(i), "--num-processes", "2",
             "--steps", str(STEPS), "--out", str(out)],
            cwd=REPO, env=env,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT)
        for i in range(2)
    ]
    logs = []
    for p in procs:
        try:
            stdout, _ = p.communicate(timeout=900)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        logs.append(stdout.decode(errors="replace"))
    for i, p in enumerate(procs):
        assert p.returncode == 0, \
            f"child {i} failed:\n{logs[i][-4000:]}"
    report = json.loads(out.read_text())
    assert report["process_count"] == 2
    assert report["device_count"] == 8

    oracle = _single_process_losses()
    np.testing.assert_allclose(report["losses"], oracle, rtol=1e-5,
                               err_msg="two-process DP diverged from "
                                       "single-process 8-device run")
