"""GroupNorm(+affine) with a one-pass Pallas BACKWARD.

The UNet's GroupNorm forward is plain XLA (one-pass channel sums — see
``models/unet.py AdaGroupNorm``; XLA fuses it into the neighbouring convs,
which a Pallas *forward* kernel was measured to break in round 2).  This
module keeps the forward exactly as the module computes it (bit-identical
primal, fusion-friendly) and swaps only the VJP for a
single-grid-step-per-batch-item Pallas kernel: x and dy are read from HBM
once, all reductions (dbeta, dgamma, and the two per-group GN sums) and the
dx epilogue happen in VMEM.

VERDICT (round 3, benchmarks/gn_bwd_bench.py on-device, hoisting-proof
harness): **measured LOSS — stays opt-in.**  XLA's analytic backward runs at
the HBM roofline at every UNet GN site (838-1070 GB/s effective over the
x+dy+dx minimum), i.e. XLA does NOT emit extra passes once the bench denies
it loop-invariant hoisting; this kernel reaches only 169-680 GB/s (the
C=64/128 channel minors half-fill the 128-lane vregs and the arithmetic is
VPU-bound fp32).  In the real step XLA can additionally fuse the dx epilogue
into the consuming conv backward, which an opaque pallas_call forbids.  The
train-profile observation that motivated this (GN-grad *fusions* at ~1/3 of
HBM speed-of-light) was evidently about the neighbouring conv/elementwise
work those fusions carry, not the GN math itself.

Gradient math (standard GroupNorm VJP, per batch item b and group g):
    x_hat = (x - mean_g) * inv_g
    dbeta_c  = sum_{b,sp} dy
    dgamma_c = sum_{b,sp} dy * x_hat
    S1_g = sum_{sp, c in g} dy * gamma_c
    S2_g = sum_{sp, c in g} dy * gamma_c * x_hat
    dx = inv_g * (dy * gamma_c - (S1_g + x_hat * S2_g) / N_g)

Reference counterpart: torch autograd of ``nn.GroupNorm`` inside the
reference UNet (``/root/reference/polyffusion/stable_diffusion/model/unet.py``
``normalization()`` sites); this re-derivation is the TPU-native equivalent.
"""

from __future__ import annotations

import contextlib
import contextvars
import functools
import os
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Thread-local override mirroring ops/attention.fused_attention_override: the
# tp train step must trace WITHOUT Pallas calls (GSPMD cannot partition them).
_GN_BWD_OVERRIDE: contextvars.ContextVar[Optional[bool]] = contextvars.ContextVar(
    "polyff_gn_bwd_override", default=None
)


@contextlib.contextmanager
def pallas_gn_bwd_override(enabled: Optional[bool]):
    token = _GN_BWD_OVERRIDE.set(enabled)
    try:
        yield
    finally:
        _GN_BWD_OVERRIDE.reset(token)


def _gn_bwd_kernel(
    x_ref, dy_ref, mean_ref, invc_ref, gamma_ref,
    dx_ref, dgb_ref, dbb_ref,
    *, num_groups: int, chunk: int,
):
    """One grid step = one batch item; H processed in chunks so the fp32
    temporaries stay bounded while x/dy live in VMEM once."""
    h, w, c = x_ref.shape[1], x_ref.shape[2], x_ref.shape[3]
    cg = c // num_groups
    mean = mean_ref[0, 0]    # (C,) fp32, already repeated per channel
    invc = invc_ref[0, 0]    # (C,) fp32
    gamma = gamma_ref[0, 0]  # (C,) fp32

    # H is walked in chunks via fori_loop (NOT an unrolled Python loop: Mosaic
    # stack-allocates each unrolled body's temporaries separately, which blew
    # the 16 MB scoped-vmem limit at the 128x128 sites).
    def sums_body(i, carry):
        db, dg, s1, s2 = carry
        sl = pl.ds(i * chunk, chunk)
        xs = x_ref[0, sl].astype(jnp.float32)   # (chunk, W, C)
        dys = dy_ref[0, sl].astype(jnp.float32)
        xh = (xs - mean[None, None, :]) * invc[None, None, :]
        dyg = dys * gamma[None, None, :]
        return (
            db + jnp.sum(dys, (0, 1))[None],
            dg + jnp.sum(dys * xh, (0, 1))[None],
            s1 + jnp.sum(dyg, (0, 1))[None],
            s2 + jnp.sum(dyg * xh, (0, 1))[None],
        )

    zeros = jnp.zeros((1, c), jnp.float32)
    db, dg, s1, s2 = jax.lax.fori_loop(
        0, h // chunk, sums_body, (zeros, zeros, zeros, zeros)
    )

    # fold the per-channel S sums into per-group values, repeated back to (C,).
    # Mosaic cannot shape-cast across the lane dim, so the segment-sum is a
    # (1,C)@(C,C) matmul against the group-membership matrix — trivial FLOPs,
    # layout-friendly.
    memb = (
        jax.lax.broadcasted_iota(jnp.int32, (c, c), 0) // cg
        == jax.lax.broadcasted_iota(jnp.int32, (c, c), 1) // cg
    ).astype(jnp.float32)

    def group_fold(v):
        return jax.lax.dot_general(
            v, memb, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )

    n_g = float(h * w * cg)
    s1g = group_fold(s1) * (1.0 / n_g)
    s2g = group_fold(s2) * (1.0 / n_g)

    def dx_body(i, _):
        sl = pl.ds(i * chunk, chunk)
        xs = x_ref[0, sl].astype(jnp.float32)
        dys = dy_ref[0, sl].astype(jnp.float32)
        xh = (xs - mean[None, None, :]) * invc[None, None, :]
        dyg = dys * gamma[None, None, :]
        dx = invc[None, None, :] * (
            dyg - (s1g[0][None, None, :] + xh * s2g[0][None, None, :])
        )
        dx_ref[0, sl] = dx.astype(dx_ref.dtype)
        return 0

    jax.lax.fori_loop(0, h // chunk, dx_body, 0)

    dgb_ref[0, 0] = dg[0]
    dbb_ref[0, 0] = db[0]


def gn_bwd_pallas(x, dy, mean_c, inv_c, gamma, num_groups, *, interpret=False):
    """(B,H,W,C) x/dy + per-channel fp32 stats -> (dx, dgamma(B,C), dbeta(B,C)).

    Caller sums the (B, C) partials over B (tiny) for the parameter grads."""
    b, h, w, c = x.shape
    # ~1 MB per fp32 temporary (a handful are live inside a loop body; fits
    # comfortably under the kernel's 32 MB scoped-vmem ceiling, and larger
    # chunks keep the VPU fed — chunk=8 measured 2.4x slower than chunk=16)
    chunk = max(8, min(h, (2**20) // max(1, 4 * w * c)))
    while h % chunk:
        chunk -= 1
    # Per-channel vectors ride as (B, 1, C) / (1, 1, C): Mosaic requires the
    # last two block dims to tile (8, 128) or equal the array dims, which a
    # (1, C) block over a (B, C) array violates for B > 1.
    img = pl.BlockSpec((1, h, w, c), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM)
    vec = pl.BlockSpec((1, 1, c), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    gvec = pl.BlockSpec((1, 1, c), lambda i: (0, 0, 0), memory_space=pltpu.VMEM)
    dx, dgb, dbb = pl.pallas_call(
        functools.partial(_gn_bwd_kernel, num_groups=num_groups, chunk=chunk),
        out_shape=(
            jax.ShapeDtypeStruct((b, h, w, c), x.dtype),
            jax.ShapeDtypeStruct((b, 1, c), jnp.float32),
            jax.ShapeDtypeStruct((b, 1, c), jnp.float32),
        ),
        grid=(b,),
        in_specs=[img, img, vec, vec, gvec],
        out_specs=(img, vec, vec),
        cost_estimate=pl.CostEstimate(
            flops=20 * b * h * w * c,
            bytes_accessed=3 * b * h * w * c * x.dtype.itemsize,
            transcendentals=0,
        ),
        # double-buffered x/dy/dx blocks alone are 12 MB at the 128x128x64
        # sites; the default 16 MB scoped-vmem limit measured 32 KB short
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=32 * 2**20),
        interpret=interpret,
    )(
        x,
        dy,
        mean_c.reshape(b, 1, c),
        inv_c.reshape(b, 1, c),
        gamma.reshape(1, 1, c).astype(jnp.float32),
    )
    return dx, dgb.reshape(b, c), dbb.reshape(b, c)


def _gn_primal(x, scale, bias, num_groups, eps):
    """The module's exact one-pass forward (models/unet.py AdaGroupNorm, plain
    path): per-channel fp32 sums -> group stats -> folded affine.  Returns
    (y, mean_c, inv_c) with the stats repeated per channel in fp32."""
    b = x.shape[0]
    c = x.shape[-1]
    g = num_groups
    spatial = tuple(range(1, x.ndim - 1))
    x32 = x.astype(jnp.float32)
    s1 = jnp.sum(x32, axis=spatial)
    s2 = jnp.sum(x32 * x32, axis=spatial)
    n_per_group = (x.size // (b * c)) * (c // g)
    g_mean = s1.reshape(b, g, c // g).sum(-1) / n_per_group
    g_meansq = s2.reshape(b, g, c // g).sum(-1) / n_per_group
    var = jnp.maximum(g_meansq - g_mean * g_mean, 0.0)
    inv = jax.lax.rsqrt(var + eps)
    inv_c = jnp.repeat(inv, c // g, axis=-1)   # (B, C)
    mean_c = jnp.repeat(g_mean, c // g, axis=-1)
    # same expression ORDER as the inline module path — bit-identical primal
    a32 = inv_c * scale[None].astype(jnp.float32)
    off32 = bias[None].astype(jnp.float32) - mean_c * inv_c * scale[None]
    a = a32.astype(x.dtype)
    off = off32.astype(x.dtype)
    shape = (b,) + (1,) * (x.ndim - 2) + (c,)
    y = x * a.reshape(shape) + off.reshape(shape)
    return y, mean_c, inv_c


def use_pallas_gn_bwd(x) -> bool:
    """True when the Pallas backward would engage for this (4-D NHWC) shape —
    the module keeps its inline XLA path otherwise, so non-TPU numerics are
    untouched."""
    override = _GN_BWD_OVERRIDE.get()
    if override is not None:
        if not override:
            return False
    elif os.environ.get("POLYFF_PALLAS_GN_BWD", "0") != "1":
        # opt-in until the on-device A/B (gn_bwd_bench + full train step)
        # demonstrates a win — same discipline as every kernel in ops/
        return False
    if jax.default_backend() not in ("tpu", "axon"):
        return False
    if x.ndim != 4:
        return False
    b, h, w, c = x.shape
    # x + dy + dx blocks are double-buffered across grid steps (6 buffers) plus
    # loop temporaries, against the kernel's 32 MB scoped-vmem ceiling: 4 MB
    # per-item blocks (bf16 128x128x128) fit with ~6 MB headroom; anything
    # larger keeps the XLA fallback.
    return c % 64 == 0 and (h * w * c * x.dtype.itemsize) <= 4 * 2**20


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def group_norm_affine(x, scale, bias, num_groups, eps):
    """GroupNorm + per-channel affine over NHWC; XLA forward, Pallas backward.

    Primal is bit-identical to the inline module math it replaces."""
    y, _, _ = _gn_primal(x, scale, bias, num_groups, eps)
    return y


def _gna_fwd(x, scale, bias, num_groups, eps):
    y, mean_c, inv_c = _gn_primal(x, scale, bias, num_groups, eps)
    return y, (x, scale, mean_c, inv_c)


def _gna_bwd(num_groups, eps, res, dy):
    x, scale, mean_c, inv_c = res
    gamma = scale.astype(jnp.float32)
    if x.ndim == 4 and use_pallas_gn_bwd(x):
        dx, dgb, dbb = gn_bwd_pallas(x, dy, mean_c, inv_c, gamma, num_groups)
        return dx, jnp.sum(dgb, 0).astype(scale.dtype), jnp.sum(dbb, 0).astype(scale.dtype)
    # XLA fallback: same analytic formulas, vectorized
    b, c = x.shape[0], x.shape[-1]
    spatial = tuple(range(1, x.ndim - 1))
    shape = (b,) + (1,) * (x.ndim - 2) + (c,)
    x32 = x.astype(jnp.float32)
    dy32 = dy.astype(jnp.float32)
    xh = (x32 - mean_c.reshape(shape)) * inv_c.reshape(shape)
    dyg = dy32 * gamma.reshape((1,) * (x.ndim - 1) + (c,))
    dbeta = jnp.sum(dy32, axis=(0,) + spatial)
    dgamma = jnp.sum(dy32 * xh, axis=(0,) + spatial)
    cg = c // num_groups
    n_g = (x.size // (b * c)) * cg

    def group_mean(v):  # (B, C) -> per-group mean repeated to (B, C)
        gsum = jnp.sum(v.reshape(b, num_groups, cg), -1, keepdims=True)
        return jnp.repeat(gsum / n_g, cg, -1).reshape(b, c)

    s1 = group_mean(jnp.sum(dyg, axis=spatial))
    s2 = group_mean(jnp.sum(dyg * xh, axis=spatial))
    dx = inv_c.reshape(shape) * (dyg - (s1.reshape(shape) + xh * s2.reshape(shape)))
    return dx.astype(x.dtype), dgamma.astype(scale.dtype), dbeta.astype(scale.dtype)


group_norm_affine.defvjp(_gna_fwd, _gna_bwd)
