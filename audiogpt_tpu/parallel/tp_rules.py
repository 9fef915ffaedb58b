"""Tensor-parallel PartitionSpec rules for model parameters.

SURVEY.md §2.6: the reference has no intra-layer sharding (models ≤ ~160 M
params); TP here is headroom, provided as a first-class component. The rules
follow the Megatron pattern applied at the parameter level:

  * Dense/Conv kernels: shard the OUTPUT-channel (last) axis over ``model``
    when it tiles evenly — column parallelism; XLA inserts the all-gather /
    reduce-scatter where the activation sharding demands it,
  * large embeddings: shard the feature axis,
  * biases/norm scales: replicated (tiny).

``tp_rules(tp)`` returns a callable usable with
:func:`audiogpt_tpu.parallel.mesh.param_sharding` and with pjit
``in_shardings`` trees. Because XLA propagates shardings through the jitted
program, annotating parameters alone is enough to engage collective-backed
TP — verified by the equivalence test in ``tests/test_mesh.py``.
"""

from __future__ import annotations

from typing import Any

from jax.sharding import PartitionSpec as P


def _path_str(path) -> str:
    return "/".join(str(getattr(k, "key", getattr(k, "idx", k))) for k in path)


def tp_rules(tp: int, min_dim: int = 64, axis: str = "model"):
    """→ ``rules(path, leaf) -> PartitionSpec``.

    Shards the trailing (output) axis of ≥2-D kernels when divisible by
    ``tp`` and at least ``min_dim`` wide; embeddings shard the feature axis;
    everything else replicates.
    """

    def rules(path: Any, leaf: Any) -> P:
        shape = getattr(leaf, "shape", ())
        if tp <= 1 or len(shape) < 2:
            return P()
        name = _path_str(path).lower()
        if "embed" in name and shape[-1] % tp == 0 and shape[-1] >= min_dim:
            return P(*([None] * (len(shape) - 1)), axis)
        if name.endswith("kernel") or "conv" in name or "dense" in name:
            if shape[-1] % tp == 0 and shape[-1] >= min_dim:
                return P(*([None] * (len(shape) - 1)), axis)
        return P()

    return rules
