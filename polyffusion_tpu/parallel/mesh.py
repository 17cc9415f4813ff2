"""Device mesh construction and sharding policies.

The reference trains on a single device with no distribution (SURVEY.md §2.9).  The
TPU-native replacement is SPMD data parallelism over ICI:

- a 1-D ``Mesh`` over all local devices with axis name ``"dp"``;
- batches sharded along ``dp`` (leading axis), parameters/optimizer state
  replicated — at this model size (~25-60M params) replication is strictly faster
  than any ZeRO-style partitioning because the per-step all-gathers would dwarf
  the parameter memory saved;
- gradient reduction is XLA-inserted (psum over ``dp``) from the sharding
  annotations on the jitted train step — no explicit collectives in user code.

The helpers below are also used by the multi-chip dry-run entry point
(``__graft_entry__.dryrun_multichip``) on a virtual CPU mesh.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(devices: Optional[Sequence[jax.Device]] = None, axis: str = "dp") -> Mesh:
    devices = list(devices) if devices is not None else jax.devices()
    return Mesh(np.asarray(devices), (axis,))


def batch_sharding(mesh: Mesh, axis: str = "dp") -> NamedSharding:
    """Shard the leading (batch) axis across the mesh."""
    return NamedSharding(mesh, P(axis))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch, mesh: Mesh, axis: str = "dp"):
    """Place a pytree of host arrays with the batch axis sharded over the mesh."""
    sh = batch_sharding(mesh, axis)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), batch)


def pad_to_multiple(n: int, k: int) -> int:
    return ((n + k - 1) // k) * k


def init_on_cpu(init_fn, *args, **kwargs):
    """Run a (flax) init function on the host CPU backend as ONE jitted program.

    Parameter initialization is hundreds of tiny ops; dispatching them one-by-one
    through a remote-compile TPU path can take minutes.  On CPU under a single jit
    it is one compile + microseconds of compute; callers then ``device_put`` the
    pytree to its target sharding.
    """
    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        return jax.jit(lambda: init_fn(*args, **kwargs))()
