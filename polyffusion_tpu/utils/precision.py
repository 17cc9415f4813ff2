"""Parameter-precision policies for sampling.

Sampling is HBM-bandwidth-bound (CLAUDE.md perf notes): every one of the
~100 UNet evaluations per DDIM-50+CFG batch re-reads the full parameter set from
HBM.  Casting parameters to bfloat16 once at load halves that weight traffic and
makes the flax compute-dtype casts inside the model no-ops.  Norm scales/biases
stay float32: they are consumed by the fp32 statistics paths (FP32GroupNorm /
LayerNorm) and are a negligible fraction of the bytes.

Training keeps fp32 master parameters (the optimizer state must accumulate in
fp32); this cast is for inference/sampling only.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

#: module-name fragments whose params are kept in float32 (norm statistics paths)
_FP32_NAME_FRAGMENTS = ("norm",)


def cast_sampling_params(params, dtype=jnp.bfloat16):
    """Cast floating-point leaves to ``dtype``, keeping norm params float32.

    Works on any flax param pytree whose norm modules carry ``norm`` in their
    path name (true for every model in this package).
    """
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    treedef = jax.tree_util.tree_structure(params)

    def cast(path, leaf):
        if not jnp.issubdtype(leaf.dtype, jnp.floating):
            return leaf
        names = [getattr(k, "key", "") for k in path]
        if any(frag in str(n) for n in names for frag in _FP32_NAME_FRAGMENTS):
            return leaf.astype(jnp.float32)
        return leaf.astype(dtype)

    return jax.tree_util.tree_unflatten(
        treedef, [cast(path, leaf) for path, leaf in flat]
    )
