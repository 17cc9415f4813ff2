"""Fused whole-sequence self-attention kernel (Pallas, TPU).

The UNet's self-attention sequences are short (1024 tokens at level 2, 256 at
level 3/middle) but the batch is large at sampling time, so the einsum path's
(B, H, T, T) logits tensor is the single largest HBM intermediate of the whole
model (~1 GB bf16 at the benchmark batch) and is written/re-read several times
per attention (profiled at ~25% of sampling device time).

At these lengths the ENTIRE sequence fits in VMEM, so no online-softmax tiling
(jax flash_attention's machinery, measured slower in round 1) is needed: one
grid step loads q/k/v for a few (batch, head) pairs, computes logits -> softmax
-> PV entirely on-chip, and writes only the (T, D) output.  HBM traffic is the
theoretical minimum: q, k, v read once, out written once.

Layout: (BH, T, D) head-major, D=64/128.  fp32 logits + softmax (better than the
einsum path's bf16-logits compromise — exactness AND speed).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _attn_kernel(q_ref, k_ref, v_ref, o_ref, *, scale: float):
    """One grid step: (bb, T, D) q/k/v blocks -> (bb, T, D) out."""
    bb = q_ref.shape[0]
    for i in range(bb):  # static unroll; logits buffer is reused (liveness)
        q = q_ref[i]  # (T, D)
        k = k_ref[i]
        v = v_ref[i]
        s = jax.lax.dot_general(
            q,
            k,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (T, T) fp32, never leaves VMEM
        s = s * scale
        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s - m)
        denom = jnp.sum(p, axis=-1, keepdims=True)
        p = p / denom
        o = jnp.dot(
            p.astype(v.dtype), v, preferred_element_type=jnp.float32
        )  # (T, D)
        o_ref[i] = o.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("scale", "block_bh", "interpret"))
def fused_self_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    scale: float,
    *,
    block_bh: int = 0,
    interpret: bool = False,
) -> jnp.ndarray:
    """(BH, T, D) x (BH, T, D) -> (BH, T, D); full-sequence softmax in VMEM.

    ``block_bh``: (batch*head) pairs per grid step; 0 auto-sizes to keep the
    per-step fp32 logits + operand footprint under ~6 MB of VMEM.
    """
    bh, t, d = q.shape
    if block_bh == 0:
        # one (T, T) fp32 logits buffer is reused across the unrolled loop;
        # operands are bb * 4 tensors of (T, D)
        logits_bytes = t * t * 4
        per_bh = 4 * t * max(d, 128) * q.dtype.itemsize
        block_bh = max(1, min(8, (6 * 2**20 - logits_bytes) // per_bh))
    while bh % block_bh:
        block_bh -= 1

    grid = (bh // block_bh,)
    spec = pl.BlockSpec(
        (block_bh, t, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
    )
    flops = 2 * 2 * bh * t * t * d  # QK^T and PV
    return pl.pallas_call(
        functools.partial(_attn_kernel, scale=scale),
        out_shape=jax.ShapeDtypeStruct((bh, t, d), q.dtype),
        grid=grid,
        in_specs=[spec, spec, spec],
        out_specs=spec,
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=4 * bh * t * d * q.dtype.itemsize,
            transcendentals=bh * t * t,
        ),
        interpret=interpret,
    )(q, k, v)
