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


def _kernel(*refs, add_residual: bool, two_inputs: bool):
    if two_inputs:
        x_ref, a_ref, off_ref, x2_ref, a2_ref, off2_ref, w_ref, b_ref, *rest = refs
    else:
        x_ref, a_ref, off_ref, w_ref, b_ref, *rest = refs
        x2_ref = None
    if add_residual:
        res_ref, o_ref, xpad_ref, im2col_ref = rest
    else:
        (o_ref, xpad_ref, im2col_ref) = rest
    _, h, w, c1 = x_ref.shape
    ctot = xpad_ref.shape[-1]
    o = o_ref.shape[-1]

    def silu_affine(ref, aref, offref):
        x = ref[0].astype(jnp.float32)
        a = aref[0, 0].astype(jnp.float32)
        off = offref[0, 0].astype(jnp.float32)
        y = x * a[None, None, :] + off[None, None, :]
        return (y * jax.nn.sigmoid(y)).astype(xpad_ref.dtype)

    # borders are never written after init; interior is overwritten every step
    @pl.when(pl.program_id(0) == 0)
    def _zero_pad():
        xpad_ref[:] = jnp.zeros(xpad_ref.shape, xpad_ref.dtype)

    # normalize + SiLU into the padded VMEM buffer (fp32 arithmetic, bf16 store);
    # with two inputs this builds the VIRTUAL channel-concat in VMEM — the
    # decoder skip-concat never exists in HBM at all
    xpad_ref[1 : h + 1, 1 : w + 1, 0:c1] = silu_affine(x_ref, a_ref, off_ref)
    if two_inputs:
        xpad_ref[1 : h + 1, 1 : w + 1, c1:ctot] = silu_affine(
            x2_ref, a2_ref, off2_ref
        )

    th = im2col_ref.shape[0]  # H processed in chunks to bound im2col VMEM
    bias32 = b_ref[0].astype(jnp.float32)[None, None, :]
    for t0 in range(0, h, th):
        acc = jnp.zeros((th * w, o), jnp.float32)
        for kh in range(3):
            # explicit stores realign the shifted slices' internal vector
            # offsets (Mosaic cannot concat vectors with mismatched offsets)
            for kw in range(3):
                im2col_ref[:, :, kw * ctot : (kw + 1) * ctot] = xpad_ref[
                    t0 + kh : t0 + kh + th, kw : kw + w, :
                ]
            acc = acc + jnp.dot(
                im2col_ref[:].reshape(th * w, 3 * ctot),
                w_ref[kh],  # (3*Ctot, O), kw-major rows matching the store order
                preferred_element_type=jnp.float32,
            )
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


def _pallas_gn_conv(x, a, off, w, b, residual, interpret, x2=None, a2=None, off2=None):
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
    operands += [
        w.astype(x.dtype).reshape(3, 3 * ctot, o),
        b.astype(jnp.float32).reshape(1, o),
    ]
    in_specs += [wspec, bspec]
    if residual is not None:
        operands.append(residual)
        in_specs.append(ospec)

    flops = 2 * bsz * h * wd * 9 * ctot * o
    return pl.pallas_call(
        functools.partial(
            _kernel, add_residual=residual is not None, two_inputs=x2 is not None
        ),
        out_shape=jax.ShapeDtypeStruct((bsz, h, wd, o), x.dtype),
        grid=(bsz,),
        in_specs=in_specs,
        out_specs=ospec,
        scratch_shapes=[
            pltpu.VMEM((h + 2, wd + 2, ctot), x.dtype),
            pltpu.VMEM((_h_chunk(h, wd, ctot, x.dtype.itemsize), wd, 3 * ctot), x.dtype),
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
