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


def _packed_kernel(q_ref, k_ref, v_ref, o_ref, *, scale: float, n_heads: int):
    """One grid step: (1, T, H*D) packed q/k/v -> (1, T, H*D) out.

    Heads are lane-sliced in VMEM — the caller passes the attention projections
    EXACTLY as the Dense layers produce them, so no (B,T,H,D)<->(B,H,T,D)
    layout copies ever hit HBM (profiled at ~5% of sampling)."""
    t, hd = q_ref.shape[1], q_ref.shape[2]
    d = hd // n_heads
    for h in range(n_heads):
        sl = slice(h * d, (h + 1) * d)
        q = q_ref[0, :, sl]  # (T, D)
        k = k_ref[0, :, sl]
        v = v_ref[0, :, sl]
        s = jax.lax.dot_general(
            q, k, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale
        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s - m)
        p = p / jnp.sum(p, axis=-1, keepdims=True)
        o_ref[0, :, sl] = jnp.dot(
            p.astype(v.dtype), v, preferred_element_type=jnp.float32
        ).astype(o_ref.dtype)


def _pallas_attention_packed(q, k, v, scale, n_heads, interpret):
    b, t, hd = q.shape
    spec = pl.BlockSpec((1, t, hd), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    d = hd // n_heads
    return pl.pallas_call(
        functools.partial(_packed_kernel, scale=scale, n_heads=n_heads),
        out_shape=jax.ShapeDtypeStruct((b, t, hd), q.dtype),
        grid=(b,),
        in_specs=[spec, spec, spec],
        out_specs=spec,
        cost_estimate=pl.CostEstimate(
            flops=4 * b * n_heads * t * t * d,
            bytes_accessed=4 * b * t * hd * q.dtype.itemsize,
            transcendentals=b * n_heads * t * t,
        ),
        interpret=interpret,
    )(q, k, v)


def _einsum_reference_packed(q, k, v, scale, n_heads):
    b, t, hd = q.shape
    d = hd // n_heads
    qh = q.reshape(b, t, n_heads, d)
    kh = k.reshape(b, t, n_heads, d)
    vh = v.reshape(b, t, n_heads, d)
    s = jnp.einsum("bihd,bjhd->bhij", qh, kh, preferred_element_type=jnp.float32)
    p = jax.nn.softmax(s * scale, axis=-1)
    o = jnp.einsum(
        "bhij,bjhd->bihd", p.astype(v.dtype), vh, preferred_element_type=jnp.float32
    )
    return o.reshape(b, t, hd).astype(q.dtype)


def _packed_bwd_kernel(q_ref, k_ref, v_ref, do_ref, dq_ref, dk_ref, dv_ref,
                       *, scale: float, n_heads: int):
    """Flash-style backward: one grid step = one batch item, heads lane-sliced.

    Recomputes the fp32 softmax on-chip (cheaper than saving the (T, T)
    probabilities to HBM) and produces all three grads with five MXU matmuls.
    Nothing quadratic in T ever leaves VMEM — the XLA recompute path this
    replaces materialized (B, H, T, T) logits THREE times per site in the train
    step plus (B,T,H,D)<->(B,H,T,D) layout copies (profiled at ~19% of the
    flagship train step)."""
    t, hd = q_ref.shape[1], q_ref.shape[2]
    d = hd // n_heads
    for h in range(n_heads):
        sl = slice(h * d, (h + 1) * d)
        q = q_ref[0, :, sl]  # (T, D)
        k = k_ref[0, :, sl]
        v = v_ref[0, :, sl]
        do = do_ref[0, :, sl]
        s = jax.lax.dot_general(
            q, k, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale  # (T, T) fp32
        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s - m)
        p = p / jnp.sum(p, axis=-1, keepdims=True)
        pc = p.astype(q.dtype)  # matmul dtype; fp32 path stays exact
        # dv = p^T @ do
        dv = jax.lax.dot_general(
            pc, do, dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        # dp = do @ v^T
        dp = jax.lax.dot_general(
            do, v, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        # softmax VJP: ds = p * (dp - rowsum(dp * p)), then the scale factor
        dsum = jnp.sum(dp * pc, axis=-1, keepdims=True)
        ds = (pc * (dp - dsum) * scale).astype(q.dtype)
        dq = jax.lax.dot_general(
            ds, k, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        dk = jax.lax.dot_general(
            ds, q, dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        dq_ref[0, :, sl] = dq.astype(dq_ref.dtype)
        dk_ref[0, :, sl] = dk.astype(dk_ref.dtype)
        dv_ref[0, :, sl] = dv.astype(dv_ref.dtype)


def _pallas_attention_packed_bwd(q, k, v, do, scale, n_heads, interpret):
    b, t, hd = q.shape
    d = hd // n_heads
    spec = pl.BlockSpec((1, t, hd), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    shape = jax.ShapeDtypeStruct((b, t, hd), q.dtype)
    return pl.pallas_call(
        functools.partial(_packed_bwd_kernel, scale=scale, n_heads=n_heads),
        out_shape=(shape, shape, shape),
        grid=(b,),
        in_specs=[spec, spec, spec, spec],
        out_specs=(spec, spec, spec),
        cost_estimate=pl.CostEstimate(
            flops=5 * 2 * b * n_heads * t * t * d,
            bytes_accessed=7 * b * t * hd * q.dtype.itemsize,
            transcendentals=b * n_heads * t * t,
        ),
        interpret=interpret,
    )(q, k, v, do)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def _fused_packed(q, k, v, scale, n_heads, interpret):
    return _pallas_attention_packed(q, k, v, scale, n_heads, interpret)


def _fused_packed_fwd(q, k, v, scale, n_heads, interpret):
    return _fused_packed(q, k, v, scale, n_heads, interpret), (q, k, v)


def _fused_packed_bwd(scale, n_heads, interpret, res, g):
    q, k, v = res
    return _pallas_attention_packed_bwd(q, k, v, g, scale, n_heads, interpret)


_fused_packed.defvjp(_fused_packed_fwd, _fused_packed_bwd)


@functools.partial(jax.jit, static_argnames=("scale", "n_heads", "interpret"))
def fused_self_attention_packed(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    scale: float,
    n_heads: int,
    *,
    interpret: bool = False,
) -> jnp.ndarray:
    """(B, T, H*D) packed self-attention; heads sliced in VMEM.

    Differentiable: custom VJP runs a flash-style Pallas backward that
    recomputes the softmax on-chip (``_packed_bwd_kernel``)."""
    return _fused_packed(q, k, v, scale, n_heads, interpret)


def _einsum_reference(q, k, v, scale):
    """Plain XLA attention with fp32 softmax, numerically matching the kernel.

    Used as the RECOMPUTING BACKWARD of the custom VJP below (Pallas kernels do
    not support reverse-mode autodiff): training backward differentiates this,
    while both training and sampling forwards run the fused kernel."""
    s = jnp.einsum("bid,bjd->bij", q, k, preferred_element_type=jnp.float32)
    p = jax.nn.softmax(s * scale, axis=-1)
    return jnp.einsum(
        "bij,bjd->bid", p.astype(v.dtype), v, preferred_element_type=jnp.float32
    ).astype(q.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def _fused(q, k, v, scale, block_bh, interpret):
    return _pallas_attention(q, k, v, scale, block_bh, interpret)


def _fused_fwd(q, k, v, scale, block_bh, interpret):
    return _fused(q, k, v, scale, block_bh, interpret), (q, k, v)


def _fused_bwd(scale, block_bh, interpret, res, g):
    q, k, v = res
    _, vjp = jax.vjp(lambda q, k, v: _einsum_reference(q, k, v, scale), q, k, v)
    return vjp(g)


_fused.defvjp(_fused_fwd, _fused_bwd)


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

    Differentiable: forward runs the Pallas kernel, backward recomputes through
    the einsum reference (custom VJP).

    ``block_bh``: (batch*head) pairs per grid step; 0 auto-sizes to keep the
    per-step fp32 logits + operand footprint under ~6 MB of VMEM.
    """
    return _fused(q, k, v, scale, block_bh, interpret)


def _pallas_attention(q, k, v, scale, block_bh, interpret):
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
