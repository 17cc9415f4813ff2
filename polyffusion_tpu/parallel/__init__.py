"""Device mesh + sharding policies."""

from .fsdp import infer_fsdp_sharding, shard_state_fsdp  # noqa: F401
from .mesh import batch_sharding, make_mesh, replicated, shard_batch  # noqa: F401
