"""ZeRO-3 / FSDP sharding of the train state via GSPMD annotations.

Beyond-reference (the reference is single-device, SURVEY.md §2.9).  The policy
shards every large leaf of the train state — parameters, both Adam moments,
and the EMA branch — along its largest ``dp``-divisible dimension over the
``dp`` mesh axis.  Nothing else changes: XLA's SPMD partitioner inserts the
weight all-gathers at each use site and reduce-scatters the gradients, which
is exactly ZeRO-3, derived from sharding annotations instead of hand-written
collectives (the same GSPMD discipline as ``parallel/tp.py``).

At this model size (25-60M params) dp replication measures fastest — the
per-step all-gathers cost more than the memory they save (docs/DESIGN.md).
``fsdp: true`` exists for the production axis: models whose fp32 Adam moments
+ master params dominate chip HBM, where sharding the state 8x across ICI
neighbours is the difference between fitting and not.  Composes with the
batch already being dp-sharded; unlike tp it needs no per-module policy, so
it covers every model family (UNet, DDPM, VAE, PianoTree) unchanged.
"""

from __future__ import annotations

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

#: leaves smaller than this stay replicated — sharding a (64,) GroupNorm scale
#: buys nothing and costs a collective
MIN_SHARD_ELEMS = 2**13


def infer_fsdp_sharding(tree, mesh: Mesh, axis: str = "dp", min_elems: int = MIN_SHARD_ELEMS):
    """NamedSharding pytree: each large leaf sharded on one dimension over ``axis``.

    The dimension chosen is the largest one divisible by the axis size (ties
    broken toward the leading dim).  Leaves with no divisible dimension, tiny
    leaves, and non-arrays are replicated.  Meshes without the axis (or with
    axis size 1) yield fully replicated shardings — the dp-only behavior.
    """
    n = int(mesh.shape[axis]) if axis in mesh.axis_names else 1

    def one(leaf):
        if n <= 1 or not hasattr(leaf, "ndim") or leaf.ndim == 0:
            return NamedSharding(mesh, P())
        if getattr(leaf, "size", 0) < min_elems:
            return NamedSharding(mesh, P())
        order = sorted(range(leaf.ndim), key=lambda d: (leaf.shape[d], -d), reverse=True)
        for d in order:
            if leaf.shape[d] % n == 0 and leaf.shape[d] >= n:
                spec = [None] * leaf.ndim
                spec[d] = axis
                return NamedSharding(mesh, P(*spec))
        return NamedSharding(mesh, P())

    return jax.tree_util.tree_map(one, tree)


def shard_state_fsdp(state, mesh: Mesh):
    """device_put a TrainState (or params pytree) to its ZeRO-3 shardings."""
    return jax.device_put(state, infer_fsdp_sharding(state, mesh))
