from audiogpt_tpu.parallel.mesh import (  # noqa: F401
    MeshSpec,
    make_mesh,
    shard_batch,
    replicate,
    param_sharding,
    local_batch_slice,
)
from audiogpt_tpu.parallel.tp_rules import tp_rules  # noqa: F401
