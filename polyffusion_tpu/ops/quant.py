"""XLA-level int8 quantized convolution (sampling-only).

The v5e MXU runs int8 contractions at 2x the bf16 rate, and XLA lowers
``lax.conv_general_dilated`` on s8 operands to native int8 convolutions
(verified exact on-device).  This module quantizes activations dynamically
(symmetric per-batch-item scale from the true amax — the reductions fuse with
the producer) and weights statically (symmetric per-output-channel), keeping
all rescaling in fp32 epilogues that XLA fuses into the conv output.

Two int8 routes exist in this package:
- this one (``POLYFF_INT8_XLA=1``): plain XLA ops around XLA's conv;
- the fused Pallas kernel (``POLYFF_INT8_CONV=1``, ops/fused_gn_conv.py):
  quantization inside the GN+SiLU+conv VMEM pass.
They are numerically equivalent up to quantization-point details and are
benchmarked against each other (benchmarks/sweep.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def quantize_act(y: jnp.ndarray):
    """(B, H, W, C) float -> (int8, (B,) fp32 scales); symmetric per item."""
    y32 = y.astype(jnp.float32)
    amax = jnp.maximum(jnp.max(jnp.abs(y32), axis=(1, 2, 3)), 1e-6)  # (B,)
    inv = (127.0 / amax)[:, None, None, None]
    q = jnp.clip(jnp.round(y32 * inv), -127.0, 127.0).astype(jnp.int8)
    return q, amax / 127.0


def quantize_weight(w: jnp.ndarray):
    """(kh, kw, C, O) float -> (int8, (O,) fp32 scales); symmetric per O."""
    w32 = w.astype(jnp.float32)
    amax = jnp.maximum(jnp.max(jnp.abs(w32), axis=(0, 1, 2)), 1e-8)
    scale = amax / 127.0
    q = jnp.clip(jnp.round(w32 / scale[None, None, None, :]), -127, 127)
    return q.astype(jnp.int8), scale


def int8_conv(
    y: jnp.ndarray,
    w: jnp.ndarray,
    bias=None,
    *,
    stride: int = 1,
    padding: int = 1,
    out_dtype=None,
):
    """``conv(y, w)`` with int8 operands and fp32 rescale.

    ``y`` is the already-activated input (e.g. silu(GN(x))); quantization error
    is ~1e-3 relative for 7-bit symmetric scales.  Returns ``y.dtype`` (or
    ``out_dtype``).  Sampling-only: differentiating raises (the round/clip
    would otherwise yield silent zero gradients in a training run that leaked
    POLYFF_INT8_XLA=1).
    """
    return _int8_conv_nograd(y, w, bias, stride, padding, out_dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def _int8_conv_nograd(y, w, bias, stride, padding, out_dtype):
    q, act_scale = quantize_act(y)
    wq, w_scale = quantize_weight(w)  # hoisted out of sampling scans by XLA
    acc = jax.lax.conv_general_dilated(
        q,
        wq,
        (stride, stride),
        ((padding, padding), (padding, padding)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32,
    )
    out = acc.astype(jnp.float32) * act_scale[:, None, None, None] * w_scale
    if bias is not None:
        out = out + bias.astype(jnp.float32)
    return out.astype(out_dtype or y.dtype)


def _int8_conv_fwd(y, w, bias, stride, padding, out_dtype):
    return _int8_conv_nograd(y, w, bias, stride, padding, out_dtype), None


def _int8_conv_bwd(stride, padding, out_dtype, res, g):
    raise NotImplementedError(
        "int8_conv has no gradient (round/clip): POLYFF_INT8_XLA is a "
        "sampling-only mode — disable it for training"
    )


_int8_conv_nograd.defvjp(_int8_conv_fwd, _int8_conv_bwd)
