"""Tensor parallelism for the UNet via GSPMD param sharding (Megatron layout).

Beyond-reference (the reference is single-device, SURVEY.md §2.9).  The policy
shards only WEIGHTS; XLA's SPMD partitioner propagates activation shardings and
inserts the collectives (all-gather / reduce-scatter / psum over the ``tp``
mesh axis riding ICI):

- ResBlock conv pairs are column-then-row parallel: ``in_conv`` splits output
  channels across ``tp`` (activations become channel-sharded; the GroupNorm
  between the convs stays local because group boundaries align with channel
  shards for tp | 32), ``out_conv`` contracts the sharded channels and XLA
  psums the partial outputs.
- The time-embedding projection (``emb_proj``) is column-parallel to match the
  channel-sharded ``h`` it adds into.
- Attention QKV projections are column-parallel (head-dim sharded, tp | heads
  recommended), ``to_out`` row-parallel; the GeGLU feed-forward likewise
  (``geglu_proj`` column, ``proj_out`` row).
- Everything else (norms, input/head convs, skips) is replicated.

At this model scale (25-60M params) dp-only is fastest for training throughput
(PARITY.md); ``tp`` exists for the production axis: activation-memory-bound
large batches, and as the template for scaling channel counts past one chip's
HBM.  Combine with dp as a 2-D mesh: ``make_tp_mesh(n_dp, n_tp)``.

Note: the Pallas fused-attention kernel cannot be auto-partitioned by GSPMD;
``make_train_step`` disables it (einsum attention partitions cleanly) when the
mesh has a ``tp`` axis.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_tp_mesh(
    n_dp: int, n_tp: int, devices: Optional[Sequence[jax.Device]] = None
) -> Mesh:
    """2-D ("dp", "tp") mesh; tp is the fast (adjacent-device) axis."""
    devices = list(devices) if devices is not None else jax.devices()
    assert len(devices) >= n_dp * n_tp, (n_dp, n_tp, len(devices))
    grid = np.asarray(devices[: n_dp * n_tp]).reshape(n_dp, n_tp)
    return Mesh(grid, ("dp", "tp"))


#: (suffix patterns over the last two path components, ndim) -> PartitionSpec
def _spec_for(path_names, leaf_ndim: int) -> P:
    tail2 = tuple(path_names[-2:])
    if len(tail2) < 2:
        return P()
    mod, name = tail2
    if name == "kernel":
        if mod == "in_conv" and leaf_ndim == 4:      # column parallel conv
            return P(None, None, None, "tp")
        if mod == "out_conv" and leaf_ndim == 4:     # row parallel conv
            return P(None, None, "tp", None)
        if mod in ("to_q", "to_k", "to_v", "geglu_proj", "emb_proj") and leaf_ndim == 2:
            return P(None, "tp")                     # column parallel dense
        if mod in ("to_out", "proj_out") and leaf_ndim == 2:
            return P("tp", None)                     # row parallel dense
    if name == "bias" and leaf_ndim == 1:
        if mod in ("in_conv", "geglu_proj", "emb_proj"):
            return P("tp")                           # follows column sharding
    return P()


def _names(path) -> list:
    out = []
    for k in path:
        n = getattr(k, "key", None)
        if n is None:
            n = getattr(k, "name", None)
        if n is None:
            idx = getattr(k, "idx", None)
            n = f"[{idx}]" if idx is not None else str(k)
        out.append(str(n))
    return out


def infer_tp_sharding(tree, mesh: Mesh):
    """NamedSharding pytree for ``tree`` under the Megatron policy.

    Works on the param tree AND on anything structurally containing it (the
    optimizer state's Adam moments, the EMA branch, the whole TrainState):
    each leaf is matched by the last two components of its path, so
    ``opt_state[...].mu['unet']['...']['in_conv']['kernel']`` shards exactly
    like the parameter it mirrors.  Meshes without a ``tp`` axis get fully
    replicated shardings (the dp-only behavior).
    """
    has_tp = "tp" in mesh.axis_names

    def one(path, leaf):
        if not has_tp or not hasattr(leaf, "ndim"):
            return NamedSharding(mesh, P())
        return NamedSharding(mesh, _spec_for(_names(path), leaf.ndim))

    return jax.tree_util.tree_map_with_path(one, tree)


def shard_state(state, mesh: Mesh):
    """device_put a TrainState (or params pytree) to its tp/dp shardings."""
    return jax.device_put(state, infer_tp_sharding(state, mesh))
