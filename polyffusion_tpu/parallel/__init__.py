"""Device mesh + sharding policies."""

from .mesh import batch_sharding, make_mesh, replicated, shard_batch  # noqa: F401
