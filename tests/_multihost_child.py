"""Child process for the two-process multi-host integration test
(``tests/test_multihost.py``). Each process owns 4 virtual CPU devices;
``jax.distributed`` joins them into one 8-device job (the local-coordinator
shape of a TPU pod's per-host runtime — ``parallel/mesh.py
distributed_init``), the global ``('data','model')`` mesh is built over ALL
devices, and one tiny-FS2 trainer step stack runs with per-process input
sharding via ``local_batch_slice`` (the DistributedSampler replacement,
``mesh.py:131``) + ``jax.make_array_from_process_local_data`` — each process
materializes ONLY its half of the global batch, exactly how a pod host
feeds its local chips.

Process 0 writes the per-step losses to ``--out`` so the parent can assert
they equal a single-process 8-device run bit-for-bit (pure DP: the psum
over ICI must be numerically identical to the single-process psum).
"""

from __future__ import annotations

import argparse
import json
import os
import sys


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--coord", required=True)
    ap.add_argument("--process-id", type=int, required=True)
    ap.add_argument("--num-processes", type=int, default=2)
    ap.add_argument("--local-devices", type=int, default=4)
    ap.add_argument("--steps", type=int, default=3)
    ap.add_argument("--out", default="")
    args = ap.parse_args()

    # same dance as tests/conftest.py: the image's sitecustomize pins
    # JAX_PLATFORMS=axon, so both the env var AND jax.config must say cpu
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags
            + f" --xla_force_host_platform_device_count={args.local_devices}"
        ).strip()
    os.environ["JAX_PLATFORMS"] = "cpu"

    import jax

    jax.config.update("jax_platforms", "cpu")
    # cross-process CPU collectives (TPU uses ICI; CPU needs gloo)
    try:
        jax.config.update("jax_cpu_collectives_implementation", "gloo")
    except Exception:
        pass

    from audiogpt_tpu.parallel.mesh import (
        distributed_init, local_batch_slice, make_mesh,
    )

    distributed_init(coordinator_address=args.coord,
                     num_processes=args.num_processes,
                     process_id=args.process_id)
    assert jax.process_count() == args.num_processes, (
        f"distributed init failed: process_count={jax.process_count()}")
    assert jax.local_device_count() == args.local_devices
    assert jax.device_count() == args.num_processes * args.local_devices

    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P

    from test_train import _fs2_batch, _tiny_fs2_task
    from audiogpt_tpu.train import Trainer, TrainerConfig

    mesh = make_mesh()  # global: all 8 devices on the data axis
    task = _tiny_fs2_task()
    trainer = Trainer(task, TrainerConfig(
        work_dir=os.path.join("/tmp", f"mh_child_{args.process_id}"),
        use_tensorboard=False), mesh=mesh)
    state = trainer.init_state()  # same seed everywhere -> identical params

    global_batch = 8
    sl = local_batch_slice(global_batch, mesh)
    # disjoint covering slices: process i feeds rows [i*4, (i+1)*4)
    assert sl == slice(args.process_id * 4, args.process_id * 4 + 4), sl

    full = _fs2_batch(np.random.default_rng(0), b=global_batch)
    shard = NamedSharding(mesh, P("data"))

    def to_global(x):
        x = np.asarray(x)
        local = x[sl]
        s = shard if x.ndim else NamedSharding(mesh, P())
        return jax.make_array_from_process_local_data(
            s, local if x.ndim else x)

    step_fn = trainer.train_step("model")
    rng = jax.random.PRNGKey(0)
    losses = []
    for i in range(args.steps):
        gbatch = {k: to_global(v) for k, v in full.items()}
        state, metrics = step_fn(state, gbatch, rng)
        losses.append(float(jax.device_get(metrics["total_loss"])))

    if args.process_id == 0 and args.out:
        with open(args.out, "w") as f:
            json.dump({"losses": losses,
                       "process_count": jax.process_count(),
                       "device_count": jax.device_count()}, f)
    print(f"[child {args.process_id}] losses={losses}", flush=True)


if __name__ == "__main__":
    _here = os.path.dirname(os.path.abspath(__file__))
    sys.path.insert(0, os.path.dirname(_here))  # repo root (audiogpt_tpu)
    sys.path.insert(0, _here)                   # tests dir (test_train)
    main()
