"""Fused GroupNorm-affine + SiLU + 3x3-conv kernel (Pallas, TPU).

Every ResBlock runs GN -> SiLU -> conv3x3 twice (models/unet.py).  XLA executes
that as separate passes over the activation: the stats reduction reads x, the
normalize+SiLU fusion reads x again and WRITES the normalized tensor, and the
conv READS it back — five full HBM passes per site on a bandwidth-bound model
(profiled: GN fusions alone are ~25% of sampling device time).

This kernel takes the raw activation plus the per-(batch, group-expanded
channel) affine vectors ``a``/``off`` (computed from the one-pass statistics by
``FP32GroupNorm`` — the stats read stays in XLA where it fuses with the
producer) and performs normalize+SiLU in VMEM on the way into the convolution:
three passes total (stats read, conv read, out write).

Conv strategy per grid step (one batch item, full spatial extent in VMEM —
feature maps here are <= 128x128x64 = 2 MB bf16):

- build the zero-padded, normalized, SiLU'd input (H+2, W+2, C) in VMEM;
- per kernel row kh: im2col over the 3 column shifts -> (H*W, 3C) operand,
  one MXU matmul against the (3C, O) slice of the weights, fp32 accumulate.

An optional ``residual`` input folds the ResBlock's skip-add into the same
pass (saves one more read+write of the output-sized tensor).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(*refs, add_residual: bool, two_inputs: bool, quantized: bool = False):
    if two_inputs:
        x_ref, a_ref, off_ref, x2_ref, a2_ref, off2_ref, w_ref, *rest = refs
    else:
        x_ref, a_ref, off_ref, w_ref, *rest = refs
        x2_ref = None
    if quantized:
        ws_ref, *rest = rest  # (1, O) fp32 per-output-channel weight scales
    b_ref, *rest = rest
    if add_residual:
        res_ref, o_ref, xpad_ref, im2col_ref = rest
    else:
        (o_ref, xpad_ref, im2col_ref) = rest
    _, h, w, c1 = x_ref.shape
    ctot = xpad_ref.shape[-1]
    o = o_ref.shape[-1]

    def silu_affine32(ref, aref, offref):
        x = ref[0].astype(jnp.float32)
        a = aref[0, 0].astype(jnp.float32)
        off = offref[0, 0].astype(jnp.float32)
        y = x * a[None, None, :] + off[None, None, :]
        return y * jax.nn.sigmoid(y)

    # borders are never written after init; interior is overwritten every step
    @pl.when(pl.program_id(0) == 0)
    def _zero_pad():
        xpad_ref[:] = jnp.zeros(xpad_ref.shape, xpad_ref.dtype)

    # normalize + SiLU into the padded VMEM buffer (fp32 arithmetic, bf16 store);
    # with two inputs this builds the VIRTUAL channel-concat in VMEM — the
    # decoder skip-concat never exists in HBM at all
    t1 = silu_affine32(x_ref, a_ref, off_ref)
    xpad_ref[1 : h + 1, 1 : w + 1, 0:c1] = t1.astype(xpad_ref.dtype)
    amax = jnp.max(jnp.abs(t1))
    if two_inputs:
        t2 = silu_affine32(x2_ref, a2_ref, off2_ref)
        xpad_ref[1 : h + 1, 1 : w + 1, c1:ctot] = t2.astype(xpad_ref.dtype)
        amax = jnp.maximum(amax, jnp.max(jnp.abs(t2)))

    if quantized:
        # dynamic per-batch-item symmetric int8 scale for the activation; the
        # true max of the SiLU'd tensor (not a bound), so resolution adapts to
        # the actual range every step
        amax = jnp.maximum(amax, 1e-6)
        inv = 127.0 / amax
        act_scale = amax * (1.0 / 127.0)

    th = im2col_ref.shape[0]  # H processed in chunks to bound im2col VMEM
    bias32 = b_ref[0].astype(jnp.float32)[None, None, :]
    for t0 in range(0, h, th):
        if quantized:
            acc = jnp.zeros((th * w, o), jnp.int32)
        else:
            acc = jnp.zeros((th * w, o), jnp.float32)
        for kh in range(3):
            # explicit stores realign the shifted slices' internal vector
            # offsets (Mosaic cannot concat vectors with mismatched offsets)
            for kw in range(3):
                shifted = xpad_ref[t0 + kh : t0 + kh + th, kw : kw + w, :]
                if quantized:
                    # quantize on the way into the int8 im2col buffer: all int8
                    # stores/loads stay tile-aligned (packed-dtype sublane
                    # shifts never occur — the shifts happen on the bf16 side)
                    q = jnp.clip(
                        jnp.round(shifted.astype(jnp.float32) * inv), -127.0, 127.0
                    )
                    im2col_ref[:, :, kw * ctot : (kw + 1) * ctot] = q.astype(jnp.int8)
                else:
                    im2col_ref[:, :, kw * ctot : (kw + 1) * ctot] = shifted
            acc = acc + jnp.dot(
                im2col_ref[:].reshape(th * w, 3 * ctot),
                w_ref[kh],  # (3*Ctot, O), kw-major rows matching the store order
                preferred_element_type=acc.dtype,
            )
        if quantized:
            scales = act_scale * ws_ref[0].astype(jnp.float32)  # (O,)
            out = acc.astype(jnp.float32).reshape(th, w, o) * scales[None, None, :]
            out = out + bias32
        else:
            out = acc.reshape(th, w, o) + bias32
        if add_residual:
            out = out + res_ref[0, t0 : t0 + th].astype(jnp.float32)
        o_ref[0, t0 : t0 + th] = out.astype(o_ref.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(6,))
def _fused(x, a, off, w, b, residual, interpret):
    return _pallas_gn_conv(x, a, off, w, b, residual, interpret)


def _reference(x, a, off, w, b, residual):
    """XLA reference with identical math — the recomputing backward."""
    y = x.astype(jnp.float32) * a[:, None, None, :] + off[:, None, None, :]
    y = (y * jax.nn.sigmoid(y)).astype(x.dtype)
    out = jax.lax.conv_general_dilated(
        y, w.astype(x.dtype), (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32,
    )
    out = out + b.astype(jnp.float32)
    if residual is not None:
        out = out + residual.astype(jnp.float32)
    return out.astype(x.dtype)


def _fused_fwd(x, a, off, w, b, residual, interpret):
    return _fused(x, a, off, w, b, residual, interpret), (x, a, off, w, b, residual)


def _fused_bwd(interpret, res, g):
    x, a, off, w, b, residual = res
    has_res = residual is not None

    def f(x, a, off, w, b, residual):
        return _reference(x, a, off, w, b, residual if has_res else None)

    _, vjp = jax.vjp(f, x, a, off, w, b, residual)
    return vjp(g)


_fused.defvjp(_fused_fwd, _fused_bwd)


def gn_silu_conv3x3(
    x: jnp.ndarray,
    a: jnp.ndarray,
    off: jnp.ndarray,
    w: jnp.ndarray,
    b: jnp.ndarray,
    residual=None,
    *,
    interpret: bool = False,
) -> jnp.ndarray:
    """``conv3x3(silu(x * a + off), w) + b (+ residual)`` in one HBM pass.

    x: (B, H, W, C); a/off: (B, C) fp32 per-batch-item affine (from GN stats);
    w: (3, 3, C, O); b: (O,); residual: optional (B, H, W, O).
    Differentiable via a recomputing custom VJP.
    """
    return _fused(x, a, off, w, b, residual, interpret)


def _h_chunk(h: int, wd: int, ctot: int, itemsize: int, budget=4 * 2**20) -> int:
    """Largest power-of-two divisor of h whose im2col chunk fits the budget."""
    th = h
    while th > 8 and th * wd * 3 * ctot * itemsize > budget:
        th //= 2
    return th


def _pallas_gn_conv(
    x, a, off, w, b, residual, interpret, x2=None, a2=None, off2=None, w_scale=None
):
    quantized = w_scale is not None  # then w is int8 with per-O-channel scales
    bsz, h, wd, c1 = x.shape
    c2 = x2.shape[-1] if x2 is not None else 0
    ctot = c1 + c2
    o = w.shape[-1]

    def tspec(ch):
        return pl.BlockSpec(
            (1, h, wd, ch), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM
        )

    def vspec(ch):
        # (B, 1, ch) with block (1, 1, ch): last-two block dims equal the array
        # dims, satisfying the Mosaic block-shape rule for any batch size
        return pl.BlockSpec((1, 1, ch), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)

    wspec = pl.BlockSpec((3, 3 * ctot, o), lambda i: (0, 0, 0), memory_space=pltpu.VMEM)
    bspec = pl.BlockSpec((1, o), lambda i: (0, 0), memory_space=pltpu.VMEM)
    ospec = tspec(o)

    def v3(t, ch):
        return t.astype(jnp.float32).reshape(bsz, 1, ch)

    operands = [x, v3(a, c1), v3(off, c1)]
    in_specs = [tspec(c1), vspec(c1), vspec(c1)]
    if x2 is not None:
        operands += [x2, v3(a2, c2), v3(off2, c2)]
        in_specs += [tspec(c2), vspec(c2), vspec(c2)]
    operands.append(
        w.reshape(3, 3 * ctot, o) if quantized
        else w.astype(x.dtype).reshape(3, 3 * ctot, o)
    )
    in_specs.append(wspec)
    if quantized:
        operands.append(w_scale.astype(jnp.float32).reshape(1, o))
        in_specs.append(bspec)
    operands.append(b.astype(jnp.float32).reshape(1, o))
    in_specs.append(bspec)
    if residual is not None:
        operands.append(residual)
        in_specs.append(ospec)

    im2col_dtype = jnp.int8 if quantized else x.dtype
    im2col_itemsize = 1 if quantized else x.dtype.itemsize
    flops = 2 * bsz * h * wd * 9 * ctot * o
    return pl.pallas_call(
        functools.partial(
            _kernel,
            add_residual=residual is not None,
            two_inputs=x2 is not None,
            quantized=quantized,
        ),
        out_shape=jax.ShapeDtypeStruct((bsz, h, wd, o), x.dtype),
        grid=(bsz,),
        in_specs=in_specs,
        out_specs=ospec,
        scratch_shapes=[
            pltpu.VMEM((h + 2, wd + 2, ctot), x.dtype),
            pltpu.VMEM((_h_chunk(h, wd, ctot, im2col_itemsize), wd, 3 * ctot), im2col_dtype),
        ],
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=int(
                bsz * h * wd * (ctot + o) * x.dtype.itemsize
            ),
            transcendentals=bsz * h * wd * ctot,
        ),
        # full-spatial blocks + padded/im2col scratch exceed the default 16 MB
        # scoped-vmem limit at 128x128 resolution; the chip has headroom
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 2**20),
        interpret=interpret,
    )(*operands)


# ----- two-input (virtual skip-concat) variant ------------------------------


@functools.partial(jax.custom_vjp, nondiff_argnums=(9,))
def _fused2(x, a, off, x2, a2, off2, w, b, residual, interpret):
    return _pallas_gn_conv(x, a, off, w, b, residual, interpret, x2, a2, off2)


def _reference2(x, a, off, x2, a2, off2, w, b, residual):
    xc = jnp.concatenate([x, x2], axis=-1)
    ac = jnp.concatenate([a, a2], axis=-1)
    offc = jnp.concatenate([off, off2], axis=-1)
    return _reference(xc, ac, offc, w, b, residual)


def _fused2_fwd(x, a, off, x2, a2, off2, w, b, residual, interpret):
    out = _fused2(x, a, off, x2, a2, off2, w, b, residual, interpret)
    return out, (x, a, off, x2, a2, off2, w, b, residual)


def _fused2_bwd(interpret, res, g):
    x, a, off, x2, a2, off2, w, b, residual = res
    has_res = residual is not None

    def f(x, a, off, x2, a2, off2, w, b, residual):
        return _reference2(
            x, a, off, x2, a2, off2, w, b, residual if has_res else None
        )

    _, vjp = jax.vjp(f, x, a, off, x2, a2, off2, w, b, residual)
    return vjp(g)


_fused2.defvjp(_fused2_fwd, _fused2_bwd)


def gn_silu_conv3x3_concat(
    x, a, off, x2, a2, off2, w, b, residual=None, *, interpret: bool = False
):
    """Two-input variant: ``conv3x3(silu(gn_affine(concat([x, x2]))))`` where
    the channel-concat exists only in VMEM (the decoder skip-concat path).

    w: (3, 3, C1+C2, O); a/off over C1, a2/off2 over C2 (slices of the joint
    virtual-concat GN affine).  Differentiable (recomputing custom VJP).
    """
    return _fused2(x, a, off, x2, a2, off2, w, b, residual, interpret)


# ----- int8 quantized variants (sampling-only) -------------------------------
#
# The v5e MXU runs int8 at 2x the bf16 rate; with the sampling path now at
# >50% MXU utilization (compute-bound), quantizing the conv contractions is the
# remaining first-order lever.  Scheme: symmetric int8, per-output-channel
# weight scales (static, from the weight amax) and a per-batch-item dynamic
# activation scale taken from the TRUE max of the normalized+SiLU'd tensor —
# computed for free inside the kernel, where the tensor already lives in VMEM.
# int8 stores/loads stay tile-aligned (quantization happens on the way into the
# im2col buffer; the sublane-shifted slices happen on the bf16 side), so no
# packed-dtype relayouts are required of Mosaic.


def quantize_conv_kernel(w: jnp.ndarray):
    """(3, 3, C, O) float kernel -> (int8 kernel, (O,) fp32 scales).

    Symmetric per-output-channel quantization — the SAME scheme as the XLA
    int8 route (one implementation, ops/quant.py).  Called on loop-invariant
    parameters: under ``jit`` + ``lax.scan`` XLA hoists it out of the sampling
    loop, so the quantization cost is paid once per compiled call.
    """
    from .quant import quantize_weight

    return quantize_weight(w)


def gn_silu_conv3x3_q(
    x, a, off, w_q, w_scale, b, residual=None, *, interpret: bool = False
):
    """int8 ``conv3x3(silu(x * a + off))`` — one HBM pass, int8 MXU contraction.

    w_q: (3, 3, C, O) int8; w_scale: (O,) fp32 (from ``quantize_conv_kernel``).
    Sampling-only: not differentiable (training keeps the bf16 kernels).
    """
    return _pallas_gn_conv(x, a, off, w_q, b, residual, interpret, w_scale=w_scale)


def gn_silu_conv3x3_concat_q(
    x, a, off, x2, a2, off2, w_q, w_scale, b, residual=None, *, interpret: bool = False
):
    """Two-input (virtual skip-concat) int8 variant; one shared activation scale
    covers both parts — they are a single virtual tensor."""
    return _pallas_gn_conv(
        x, a, off, w_q, b, residual, interpret, x2, a2, off2, w_scale=w_scale
    )


def _reference_q(x, a, off, w_q, w_scale, b, residual, x2=None, a2=None, off2=None):
    """XLA emulation of the quantized kernel's exact arithmetic (for tests).

    Mirrors the kernel step for step: fp32 silu -> storage-dtype round trip ->
    per-item dynamic scale from the fp32 silu max -> int8 round/clip -> integer
    conv -> fp32 rescale.  The conv accumulates in fp32 (exact for these
    magnitudes up to reassociation; tests use tolerances scaled accordingly).
    """

    def silu32(t, aa, oo):
        y = t.astype(jnp.float32) * aa[:, None, None, :] + oo[:, None, None, :]
        return y * jax.nn.sigmoid(y)

    t1 = silu32(x, a, off)
    ts = [t1]
    if x2 is not None:
        ts.append(silu32(x2, a2, off2))
    amax = jnp.maximum(
        jnp.max(
            jnp.concatenate([jnp.abs(t).reshape(x.shape[0], -1) for t in ts], -1),
            axis=-1,
        ),
        1e-6,
    )  # (B,)
    inv = (127.0 / amax)[:, None, None, None]
    parts = [
        jnp.clip(jnp.round(t.astype(x.dtype).astype(jnp.float32) * inv), -127, 127)
        for t in ts
    ]
    qx = jnp.concatenate(parts, axis=-1) if len(parts) > 1 else parts[0]
    acc = jax.lax.conv_general_dilated(
        qx,
        w_q.astype(jnp.float32),
        (1, 1),
        ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    out = acc * (amax[:, None, None, None] / 127.0) * w_scale[None, None, None, :]
    out = out + b.astype(jnp.float32)
    if residual is not None:
        out = out + residual.astype(jnp.float32)
    return out.astype(x.dtype)
