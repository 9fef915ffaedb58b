"""Device mesh + sharding runtime — the TPU-native distributed layer.

Replaces the reference's single-node DDP stack (``mp.spawn`` per GPU at
``NeuralSeq/utils/pl_utils.py:479``, NCCL init at
``NeuralSeq/tasks/base_task.py:291``, ``DistributedDataParallel`` wrapper at
``pl_utils.py:179``) with a single-process SPMD model:

  * one ``jax.sharding.Mesh`` over all chips, axes ``('data', 'model')``,
  * batches sharded on ``data`` via ``NamedSharding`` (replaces
    ``DistributedSampler``),
  * parameters replicated (DP) or sharded on ``model`` (TP headroom the
    reference never had — SURVEY.md §2.6),
  * gradient allreduce is compiler-inserted ``psum`` over ICI — no explicit
    barriers (cf. ``pl_utils.py:528,622,1104``).

Multi-host: call :func:`distributed_init` once per process; everything else is
identical (``jax.process_index() == 0`` replaces rank-0 checks).
"""

from __future__ import annotations

import dataclasses
import os
from typing import Any, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


@dataclasses.dataclass(frozen=True)
class MeshSpec:
    """Logical mesh shape. ``data=-1`` means 'all remaining devices'."""

    data: int = -1
    model: int = 1
    axis_names: tuple[str, str] = ("data", "model")

    def resolve(self, n_devices: int) -> tuple[int, int]:
        d, m = self.data, self.model
        if d == -1 and m == -1:
            raise ValueError("at most one mesh axis may be -1")
        if d == -1:
            d = n_devices // m
        if m == -1:
            m = n_devices // d
        if d * m != n_devices:
            raise ValueError(
                f"mesh {d}x{m} != {n_devices} devices (spec={self})"
            )
        return d, m


def make_mesh(
    spec: MeshSpec | None = None,
    devices: Sequence[jax.Device] | None = None,
) -> Mesh:
    """Build a Mesh over the given (default: all) devices.

    Device order is kept as ``jax.devices()`` order, which JAX guarantees is
    ICI-contiguous on TPU slices, so the ``data`` axis rides ICI.
    """
    spec = spec or MeshSpec()
    devices = list(devices if devices is not None else jax.devices())
    d, m = spec.resolve(len(devices))
    arr = np.array(devices).reshape(d, m)
    return Mesh(arr, spec.axis_names)


def distributed_init(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
) -> None:
    """Multi-host bring-up. On TPU pods with standard env vars the arguments
    are auto-detected; this replaces the reference's MASTER_ADDR/NCCL
    rendezvous (``base_task.py:283-291``).

    NOTE: the already-initialized probe must NOT touch the backend —
    ``jax.process_count()`` would lazily initialize it single-process and
    make the subsequent ``jax.distributed.initialize`` raise (found by
    ``tests/test_multihost.py``). With explicit arguments a failure is a
    real bring-up error and propagates; only the zero-arg auto-detect path
    degrades silently to single-process."""
    if jax.distributed.is_initialized():
        return  # already initialized
    kw: dict[str, Any] = {}
    if coordinator_address:
        kw.update(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
        jax.distributed.initialize(**kw)
        return
    try:
        jax.distributed.initialize()
    except (ValueError, RuntimeError):
        # single-process run (tests, single chip) — nothing to do
        pass


def shard_batch(batch: Any, mesh: Mesh, axis: str = "data") -> Any:
    """Place a host batch onto the mesh, sharded along the leading dim."""

    def _put(x):
        x = np.asarray(x)
        ndim = x.ndim
        spec = P(axis, *([None] * (ndim - 1))) if ndim else P()
        return jax.device_put(x, NamedSharding(mesh, spec))

    return jax.tree.map(_put, batch)


def replicate(tree: Any, mesh: Mesh) -> Any:
    """Fully replicate a pytree (e.g. DP parameters) across the mesh."""
    sharding = NamedSharding(mesh, P())
    return jax.tree.map(lambda x: jax.device_put(x, sharding), tree)


def param_sharding(tree: Any, mesh: Mesh, rules=None) -> Any:
    """NamedShardings for a param pytree.

    ``rules`` is an optional callable ``(path, leaf) -> PartitionSpec`` for TP;
    default is full replication (pure DP — reference parity, §2.6).
    """
    flat = jax.tree_util.tree_flatten_with_path(tree)[0]
    if rules is None:
        return jax.tree.map(lambda _: NamedSharding(mesh, P()), tree)
    specs = {}
    for path, leaf in flat:
        specs[path] = NamedSharding(mesh, rules(path, leaf))
    leaves, treedef = jax.tree_util.tree_flatten(tree)
    paths = [p for p, _ in flat]
    return jax.tree_util.tree_unflatten(
        treedef, [specs[p] for p in paths]
    )


def local_batch_slice(global_batch: int, mesh: Mesh, axis: str = "data") -> slice:
    """The slice of the global batch this host should feed (multi-host input
    pipeline; replaces DistributedSampler sharding, ``pl_utils.py:1318``)."""
    n = mesh.shape[axis]
    per = global_batch // n
    # which mesh positions along `axis` live on this process
    procs = jax.process_count()
    per_proc = global_batch // procs
    start = jax.process_index() * per_proc
    del n, per
    return slice(start, start + per_proc)
