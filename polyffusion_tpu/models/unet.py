"""Stable-Diffusion-style conditional UNet, TPU-native.

Architecture capability mirrors the reference (``stable_diffusion/model/unet.py:30-196``,
``unet_attention.py:26-333``) but the implementation is JAX/flax designed for the MXU:

- NHWC layout (B, time, pitch, C) — XLA's native conv layout on TPU;
- compute dtype is configurable (bf16 for training); params, group/layer norms and
  softmax stay float32 (the reference's GroupNorm32 fp32-cast, ``unet.py:321-327``);
- attention is a single batched einsum pair per block (seq <= 1024 tokens at the
  attention levels, so flash-style tiling is unnecessary; softmax in fp32);
- everything is shape-static and trace-once under ``jax.jit``.

Parameter tree structure intentionally mirrors the torch module tree one-to-one so
``convert/torch_import.py`` can map checkpoints mechanically.
"""

from __future__ import annotations

import math
from typing import Any, Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn


def timestep_embedding(
    time_steps: jnp.ndarray, channels: int, max_period: int = 10000
) -> jnp.ndarray:
    """Sinusoidal embeddings, cos-first (reference ``unet.py:151-169``). Always fp32."""
    half = channels // 2
    freqs = jnp.exp(
        -math.log(max_period) * jnp.arange(half, dtype=jnp.float32) / half
    )
    args = time_steps.astype(jnp.float32)[:, None] * freqs[None]
    return jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=-1)


class FP32GroupNorm(nn.Module):
    """GroupNorm with float32 statistics and compute-dtype application.

    The reference casts activations to fp32 for the whole GroupNorm
    (``unet.py:321-327``).  Materializing fp32 copies of every activation doubles
    HBM traffic on a bandwidth-bound model, so here only the *reductions* run in
    fp32 (XLA fuses the cast into the reduce — nothing fp32 is ever written to
    HBM); the normalize/scale/shift arithmetic stays in the activation dtype.
    At fp32 activations this is exactly a two-pass GroupNorm (parity tested).

    Known bound (tested, test_groupnorm_bf16_large_mean_robustness): one-pass
    variance cancels when |E[x]| >> std.  Measured vs an fp64 two-pass at unit
    signal: stats error is reassociation-level through |mean| ~ 30 and degrades
    gracefully beyond (~1.5 output units at |mean| = 100 under bf16).  Post-conv
    GN inputs in this model sit far inside that envelope.
    """

    num_groups: int = 32
    epsilon: float = 1e-5
    folded: bool = False

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        x2: Optional[jnp.ndarray] = None,
        return_affine: bool = False,
    ):
        """Normalize ``x`` — or, with ``x2``, the VIRTUAL channel-concat
        ``[x, x2]`` without materializing it (group statistics distribute over
        per-channel partial sums).  Returns ``y`` or ``(y, y2)`` accordingly.

        ``return_affine=True`` skips the normalize pass and returns the fp32
        per-(batch, channel) affine vectors ``(a, off)`` with ``y = x*a + off``
        — consumed by the fused GN+SiLU+conv kernel (ops/fused_gn_conv.py) so
        the normalized tensor never hits HBM.

        ``folded=True``: inputs are in the space-to-depth layout (ops/s2d.py,
        channel ``s*C + c`` = original channel ``c`` at W-parity ``s``); the
        statistics are computed per ORIGINAL channel (both parities of a
        channel feed the same group) and the affine is re-folded before
        application — bit-identical group stats, param shapes unchanged.
        """
        fold = 2 if self.folded else 1
        assert not (self.folded and return_affine), "fused path is never folded"
        c1 = x.shape[-1] // fold
        c = c1 + (x2.shape[-1] // fold if x2 is not None else 0)
        g = self.num_groups
        assert c % g == 0 and c >= g, (
            f"GroupNorm needs channels divisible by its {g} groups, got {c} — "
            f"every `channels` x multiplier in the config must be a multiple of {g} "
            f"(the reference fixes normalization(32) groups, unet_attention.py)"
        )
        scale = self.param("scale", nn.initializers.ones, (c,))
        bias = self.param("bias", nn.initializers.zeros, (c,))

        if x2 is None and not self.folded and not return_affine and x.ndim == 4:
            from ..ops.gn_bwd import group_norm_affine, use_pallas_gn_bwd

            if use_pallas_gn_bwd(x):
                # identical primal (same one-pass math, same expression order);
                # only the VJP differs — a single-pass Pallas backward instead
                # of XLA's multi-pass GN gradient (ops/gn_bwd.py)
                return group_norm_affine(x, scale, bias, g, self.epsilon)

        # One-pass statistics via per-CHANNEL partial sums, staying 4-D throughout:
        # 5-D group reshapes force TPU layout copies (a transpose-while showed up
        # in profiles), and two-pass (x-mean)^2 variance reads the activation
        # twice (GN reductions were ~10% of sampling device time).
        spatial = tuple(range(1, x.ndim - 1))

        def channel_sums(t):
            t32 = t.astype(jnp.float32)
            s1, s2 = jnp.sum(t32, axis=spatial), jnp.sum(t32 * t32, axis=spatial)
            if self.folded:
                from ..ops.s2d import unfold_channel_sums

                s1, s2 = unfold_channel_sums(s1), unfold_channel_sums(s2)
            return s1, s2

        s1, s2 = channel_sums(x)  # (B, C1) — per ORIGINAL channel when folded
        if x2 is not None:
            s1b, s2b = channel_sums(x2)
            s1 = jnp.concatenate([s1, s1b], axis=-1)  # (B, C) — tiny
            s2 = jnp.concatenate([s2, s2b], axis=-1)
        n_per_group = (x.size // (x.shape[0] * c1)) * (c // g)
        b = x.shape[0]
        g_mean = s1.reshape(b, g, c // g).sum(-1) / n_per_group  # (B, g)
        g_meansq = s2.reshape(b, g, c // g).sum(-1) / n_per_group
        var = jnp.maximum(g_meansq - g_mean * g_mean, 0.0)
        inv = jax.lax.rsqrt(var + self.epsilon)

        # per-channel affine folded into the group stats: y = x * a + b
        inv_c = jnp.repeat(inv, c // g, axis=-1)  # (B, C)
        mean_c = jnp.repeat(g_mean, c // g, axis=-1)
        a32 = inv_c * scale[None].astype(jnp.float32)
        off32 = bias[None].astype(jnp.float32) - mean_c * inv_c * scale[None]
        if return_affine:
            # (B, C) over the (virtual-concat) channel axis; callers slice per part
            return a32, off32
        a = a32.astype(x.dtype)
        off = off32.astype(x.dtype)

        def apply_affine(t, a_c, off_c):
            if self.folded:
                from ..ops.s2d import fold_channel_vec

                a_c, off_c = fold_channel_vec(a_c), fold_channel_vec(off_c)
            shape = (b,) + (1,) * (t.ndim - 2) + (t.shape[-1],)
            return t * a_c.reshape(shape) + off_c.reshape(shape)

        if x2 is None:
            return apply_affine(x, a, off)
        return (
            apply_affine(x, a[:, :c1], off[:, :c1]),
            apply_affine(x2, a[:, c1:], off[:, c1:]),
        )

    # NOTE on params: this module owns scale/bias directly (no nested GroupNorm_0)


def _conv3x3(features: int, dtype, name: str, stride: int = 1) -> nn.Conv:
    # Explicit (1, 1) padding matches torch Conv2d(padding=1) for stride 2 as well,
    # where XLA 'SAME' would pick a different (0, 1) split.
    return nn.Conv(
        features,
        (3, 3),
        strides=(stride, stride),
        padding=((1, 1), (1, 1)),
        dtype=dtype,
        name=name,
    )


class ConcatConv(nn.Module):
    """Convolution over the VIRTUAL channel-concat ``[x, x2]``.

    ``conv(concat([x, x2]), W) == conv(x, W[..., :c1, :]) + conv(x2, W[..., c1:, :])``
    exactly, so the concat never hits HBM (XLA materialized it with layout
    copies — profiled ~10% of decoder time).  Parameter names/shapes are
    identical to ``nn.Conv`` over the real concat, keeping checkpoint
    converters unchanged.
    """

    features: int
    kernel_size: tuple = (3, 3)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, x2: jnp.ndarray) -> jnp.ndarray:
        c1, c2 = x.shape[-1], x2.shape[-1]
        kh, kw = self.kernel_size
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(), (kh, kw, c1 + c2, self.features)
        )
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        k = kernel.astype(self.dtype)
        pad = ((kh // 2, kh // 2), (kw // 2, kw // 2))

        def conv(t, kk):
            return jax.lax.conv_general_dilated(
                t.astype(self.dtype),
                kk,
                window_strides=(1, 1),
                padding=pad,
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )

        y = conv(x, k[:, :, :c1]) + conv(x2, k[:, :, c1:])
        return y + bias.astype(y.dtype)


def _s2d_enabled() -> bool:
    """Space-to-depth folded level-0 (POLYFF_S2D=1, ops/s2d.py): run every
    C=64 conv/GN at 128-lane occupancy.  Exact algebraic reformulation of the
    SAME parameters — checkpoints/converters/parity untouched."""
    import os

    return os.environ.get("POLYFF_S2D", "0") == "1"


def _s2d_conv(x, kernel, dtype, strides=(1, 1), padding=None):
    kh, kw = kernel.shape[:2]
    if padding is None:
        padding = ((kh // 2, kh // 2), (kw // 2, kw // 2))
    return jax.lax.conv_general_dilated(
        x.astype(dtype),
        kernel,
        window_strides=strides,
        padding=padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


class S2dConv(nn.Module):
    """Param-compatible stand-in for a 3x3/1x1 stride-1 ``nn.Conv`` operating
    on the FOLDED layout: params are the NORMAL conv's ``(kh, kw, Ci, Co)``;
    the structured folded kernel (ops/s2d.py s2d_kernel) is built at trace
    time, so the executable contracts 2Ci -> 2Co (full MXU lanes at Ci=64)."""

    features: int
    kernel_size: tuple = (3, 3)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        from ..ops.s2d import fold_channel_vec, s2d_kernel

        ci = x.shape[-1] // 2
        kh, kw = self.kernel_size
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(), (kh, kw, ci, self.features)
        )
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        y = _s2d_conv(x, s2d_kernel(kernel.astype(self.dtype)), self.dtype)
        return y + fold_channel_vec(bias).astype(y.dtype)


class S2dConcatConv(nn.Module):
    """``ConcatConv`` twin for two FOLDED inputs: each virtual-concat part is
    convolved with its own folded kernel slice and summed (conv distributes
    over the channel split)."""

    features: int
    kernel_size: tuple = (3, 3)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, x2: jnp.ndarray) -> jnp.ndarray:
        from ..ops.s2d import fold_channel_vec, s2d_kernel

        c1, c2 = x.shape[-1] // 2, x2.shape[-1] // 2
        kh, kw = self.kernel_size
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(), (kh, kw, c1 + c2, self.features)
        )
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        k = kernel.astype(self.dtype)
        y = _s2d_conv(x, s2d_kernel(k[:, :, :c1]), self.dtype) + _s2d_conv(
            x2, s2d_kernel(k[:, :, c1:]), self.dtype
        )
        return y + fold_channel_vec(bias).astype(y.dtype)


class S2dEntryConv(nn.Module):
    """Input-head conv producing FOLDED output directly from the normal-layout
    input (ops/s2d.py s2d_entry_kernel): no standalone relayout copy ever
    exists — the fold happens inside the conv's output indexing."""

    features: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        from ..ops.s2d import fold_channel_vec, s2d_entry_kernel

        ci = x.shape[-1]
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(), (3, 3, ci, self.features)
        )
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        y = _s2d_conv(
            x,
            s2d_entry_kernel(kernel.astype(self.dtype)),
            self.dtype,
            strides=(1, 2),
            padding=((1, 1), (1, 1)),
        )
        return y + fold_channel_vec(bias).astype(y.dtype)


class S2dExitConv(nn.Module):
    """DownSample conv consuming FOLDED input and producing the normal-layout
    stride-2 output (ops/s2d.py s2d_exit_stride2_kernel) — the level-0 exit."""

    features: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        from ..ops.s2d import s2d_exit_stride2_kernel

        ci = x.shape[-1] // 2
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(), (3, 3, ci, self.features)
        )
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        y = _s2d_conv(
            x,
            s2d_exit_stride2_kernel(kernel.astype(self.dtype)),
            self.dtype,
            strides=(2, 1),
            padding=((1, 1), (1, 0)),
        )
        return y + bias.astype(y.dtype)


class FusedGNConv(nn.Module):
    """Param-compatible stand-in for the 3x3 ``nn.Conv`` that consumes the raw
    activation plus GN affine vectors and runs the fused Pallas kernel
    (ops/fused_gn_conv.py): normalize+SiLU happen in VMEM inside the conv."""

    features: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, a, off, residual=None):
        c = x.shape[-1]
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(), (3, 3, c, self.features)
        )
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        interpret = jax.default_backend() not in ("tpu", "axon")
        if _int8_conv_enabled():
            from ..ops.fused_gn_conv import gn_silu_conv3x3_q, quantize_conv_kernel

            w_q, w_scale = quantize_conv_kernel(kernel)  # hoisted out of the scan
            return gn_silu_conv3x3_q(
                x.astype(self.dtype), a, off, w_q, w_scale, bias, residual,
                interpret=interpret,
            )
        from ..ops.fused_gn_conv import gn_silu_conv3x3

        return gn_silu_conv3x3(
            x.astype(self.dtype),
            a,
            off,
            kernel.astype(self.dtype),
            bias,
            residual,
            interpret=interpret,
        )


class FusedGNConvConcat(nn.Module):
    """Two-input fused variant for the decoder skip-concat ``in_conv`` sites:
    normalize+SiLU both parts and convolve the VIRTUAL concat in one kernel
    (ops/fused_gn_conv.py gn_silu_conv3x3_concat).  Param-compatible with
    ``ConcatConv``/``nn.Conv`` over the real concat."""

    features: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, a, off, x2, a2, off2):
        c1, c2 = x.shape[-1], x2.shape[-1]
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(), (3, 3, c1 + c2, self.features)
        )
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        interpret = jax.default_backend() not in ("tpu", "axon")
        if _int8_conv_enabled():
            from ..ops.fused_gn_conv import (
                gn_silu_conv3x3_concat_q,
                quantize_conv_kernel,
            )

            w_q, w_scale = quantize_conv_kernel(kernel)
            return gn_silu_conv3x3_concat_q(
                x.astype(self.dtype), a, off, x2.astype(self.dtype), a2, off2,
                w_q, w_scale, bias, interpret=interpret,
            )
        from ..ops.fused_gn_conv import gn_silu_conv3x3_concat

        return gn_silu_conv3x3_concat(
            x.astype(self.dtype),
            a,
            off,
            x2.astype(self.dtype),
            a2,
            off2,
            kernel.astype(self.dtype),
            bias,
            interpret=interpret,
        )


def _fused_gn_conv_enabled() -> bool:
    import os

    return (
        os.environ.get("POLYFF_FUSED_GN_CONV", "0") == "1" or _int8_conv_enabled()
    )


def _int8_conv_enabled() -> bool:
    """int8 ResBlock convolutions (sampling-only, POLYFF_INT8_CONV=1).

    Implies the fused GN+SiLU+conv path: quantization happens in VMEM inside
    the fused kernel.  Attention/Dense/head convs stay bf16.
    """
    import os

    return os.environ.get("POLYFF_INT8_CONV", "0") == "1"


def _int8_xla_enabled() -> bool:
    """int8 ResBlock convolutions through XLA's native s8 conv
    (POLYFF_INT8_XLA=1, ops/quant.py) — the non-Pallas int8 route.
    Ignored when the fused-kernel int8 path is on."""
    import os

    return (
        os.environ.get("POLYFF_INT8_XLA", "0") == "1" and not _int8_conv_enabled()
    )


class Int8Conv3x3(nn.Module):
    """Param-compatible stand-in for the 3x3 ``nn.Conv`` over an already
    SiLU'd input, contracting on the int8 MXU (ops/quant.py)."""

    features: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, y: jnp.ndarray) -> jnp.ndarray:
        c = y.shape[-1]
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(), (3, 3, c, self.features)
        )
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        from ..ops.quant import int8_conv

        return int8_conv(y.astype(self.dtype), kernel, bias)


class Int8ConcatConv(nn.Module):
    """int8 ``ConcatConv``: the two virtual-concat parts are separate linear
    terms, so each is quantized with its own activation scale."""

    features: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, y: jnp.ndarray, y2: jnp.ndarray) -> jnp.ndarray:
        c1, c2 = y.shape[-1], y2.shape[-1]
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(), (3, 3, c1 + c2, self.features)
        )
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        from ..ops.quant import int8_conv

        out = int8_conv(y.astype(self.dtype), kernel[:, :, :c1], None)
        out = out + int8_conv(y2.astype(self.dtype), kernel[:, :, c1:], None)
        return out + bias.astype(out.dtype)


class ResBlock(nn.Module):
    """GN -> SiLU -> conv, +time-emb, GN -> SiLU -> conv, +skip (reference ``unet.py:262-318``).

    ``skip``: optional decoder skip tensor; the block then behaves exactly as if
    called on ``concatenate([x, skip], -1)`` but the concat is virtual (see
    ``ConcatConv`` / ``FP32GroupNorm``) — the reference materializes it
    (``unet.py:188-190``).
    """

    out_channels: int
    dtype: Any = jnp.float32
    folded: bool = False

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        t_emb: jnp.ndarray,
        skip: Optional[jnp.ndarray] = None,
    ) -> jnp.ndarray:
        if self.folded:
            return self._folded(x, t_emb, skip)
        c_in = x.shape[-1] + (skip.shape[-1] if skip is not None else 0)
        fused = _fused_gn_conv_enabled()
        if fused and skip is not None:
            c1 = x.shape[-1]
            a, off = FP32GroupNorm(name="in_norm")(x, skip, return_affine=True)
            h = FusedGNConvConcat(self.out_channels, self.dtype, name="in_conv")(
                x, a[:, :c1], off[:, :c1], skip, a[:, c1:], off[:, c1:]
            )
        elif fused:
            a, off = FP32GroupNorm(name="in_norm")(x, return_affine=True)
            h = FusedGNConv(self.out_channels, self.dtype, name="in_conv")(x, a, off)
        elif skip is None:
            h = FP32GroupNorm(name="in_norm")(x)
            h = nn.silu(h)
            if _int8_xla_enabled():
                h = Int8Conv3x3(self.out_channels, self.dtype, name="in_conv")(h)
            else:
                h = _conv3x3(self.out_channels, self.dtype, "in_conv")(h)
        else:
            h1, h2 = FP32GroupNorm(name="in_norm")(x, skip)
            conv_cls = Int8ConcatConv if _int8_xla_enabled() else None
            if conv_cls is not None:
                h = conv_cls(self.out_channels, self.dtype, name="in_conv")(
                    nn.silu(h1), nn.silu(h2)
                )
            else:
                h = ConcatConv(self.out_channels, (3, 3), self.dtype, name="in_conv")(
                    nn.silu(h1), nn.silu(h2)
                )
        emb = nn.Dense(self.out_channels, dtype=self.dtype, name="emb_proj")(
            nn.silu(t_emb)
        )
        h = h + emb[:, None, None, :].astype(h.dtype)

        # residual input (computed before out_conv so the fused kernel can fold
        # the final add into its output pass)
        if c_in != self.out_channels:
            if skip is None:
                res = nn.Conv(self.out_channels, (1, 1), dtype=self.dtype, name="skip")(x)
            else:
                res = ConcatConv(self.out_channels, (1, 1), self.dtype, name="skip")(
                    x, skip
                )
        elif skip is not None:
            res = jnp.concatenate([x, skip], axis=-1)
        else:
            res = x

        if _fused_gn_conv_enabled():
            a2, off2 = FP32GroupNorm(name="out_norm")(h, return_affine=True)
            return FusedGNConv(self.out_channels, self.dtype, name="out_conv")(
                h, a2, off2, residual=res
            )
        h = FP32GroupNorm(name="out_norm")(h)
        h = nn.silu(h)
        if _int8_xla_enabled():
            h = Int8Conv3x3(self.out_channels, self.dtype, name="out_conv")(h)
        else:
            h = _conv3x3(self.out_channels, self.dtype, "out_conv")(h)
        return res + h

    def _folded(
        self,
        x: jnp.ndarray,
        t_emb: jnp.ndarray,
        skip: Optional[jnp.ndarray],
    ) -> jnp.ndarray:
        """The same block with every tensor in the space-to-depth layout
        (ops/s2d.py): identical parameters, folded kernels, per-original-channel
        GN stats — exact up to float reassociation (tested in test_s2d_unet.py)."""
        from ..ops.s2d import fold_channel_vec

        c_in = (x.shape[-1] + (skip.shape[-1] if skip is not None else 0)) // 2
        if skip is None:
            h = FP32GroupNorm(name="in_norm", folded=True)(x)
            h = S2dConv(self.out_channels, (3, 3), self.dtype, name="in_conv")(
                nn.silu(h)
            )
        else:
            h1, h2 = FP32GroupNorm(name="in_norm", folded=True)(x, skip)
            h = S2dConcatConv(self.out_channels, (3, 3), self.dtype, name="in_conv")(
                nn.silu(h1), nn.silu(h2)
            )
        emb = nn.Dense(self.out_channels, dtype=self.dtype, name="emb_proj")(
            nn.silu(t_emb)
        )
        h = h + fold_channel_vec(emb)[:, None, None, :].astype(h.dtype)

        if c_in != self.out_channels:
            if skip is None:
                res = S2dConv(self.out_channels, (1, 1), self.dtype, name="skip")(x)
            else:
                res = S2dConcatConv(self.out_channels, (1, 1), self.dtype, name="skip")(
                    x, skip
                )
        elif skip is not None:
            # folded concat interleaves parities: [x_even, skip_even, x_odd, skip_odd]
            cx, ck = x.shape[-1] // 2, skip.shape[-1] // 2
            res = jnp.concatenate(
                [x[..., :cx], skip[..., :ck], x[..., cx:], skip[..., ck:]], axis=-1
            )
        else:
            res = x

        h = FP32GroupNorm(name="out_norm", folded=True)(h)
        h = S2dConv(self.out_channels, (3, 3), self.dtype, name="out_conv")(nn.silu(h))
        return res + h


class CrossAttention(nn.Module):
    """Multi-head attention; self-attention when ``cond`` is the sequence itself.

    Matches reference ``unet_attention.py:127-293`` (einsum attention path); softmax is
    fp32 for bf16 stability; the projections ride the MXU in the compute dtype.
    """

    n_heads: int
    d_head: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, cond: jnp.ndarray) -> jnp.ndarray:
        d_model = x.shape[-1]
        d_attn = self.n_heads * self.d_head
        q = nn.Dense(d_attn, use_bias=False, dtype=self.dtype, name="to_q")(x)
        k = nn.Dense(d_attn, use_bias=False, dtype=self.dtype, name="to_k")(cond)
        v = nn.Dense(d_attn, use_bias=False, dtype=self.dtype, name="to_v")(cond)

        b, s, _ = q.shape
        t = k.shape[1]
        q = q.reshape(b, s, self.n_heads, self.d_head)
        k = k.reshape(b, t, self.n_heads, self.d_head)
        v = v.reshape(b, t, self.n_heads, self.d_head)

        from ..ops.attention import multihead_attention

        out = multihead_attention(q, k, v, self.d_head**-0.5).astype(x.dtype)
        out = out.reshape(b, s, d_attn)
        return nn.Dense(d_model, dtype=self.dtype, name="to_out")(out)


class FeedForward(nn.Module):
    """GeGLU feed-forward (reference ``unet_attention.py:296-333``)."""

    d_mult: int = 4
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        d_model = x.shape[-1]
        proj = nn.Dense(d_model * self.d_mult * 2, dtype=self.dtype, name="geglu_proj")(x)
        val, gate = jnp.split(proj, 2, axis=-1)
        return nn.Dense(d_model, dtype=self.dtype, name="proj_out")(
            val * nn.gelu(gate)
        )


class BasicTransformerBlock(nn.Module):
    """pre-LN self-attn -> cross-attn -> GeGLU FF (reference ``unet_attention.py:89-124``)."""

    n_heads: int
    d_head: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, cond: jnp.ndarray) -> jnp.ndarray:
        h = nn.LayerNorm(dtype=jnp.float32, name="norm1")(x.astype(jnp.float32)).astype(
            x.dtype
        )
        x = CrossAttention(self.n_heads, self.d_head, self.dtype, name="attn1")(h, h) + x
        h = nn.LayerNorm(dtype=jnp.float32, name="norm2")(x.astype(jnp.float32)).astype(
            x.dtype
        )
        x = (
            CrossAttention(self.n_heads, self.d_head, self.dtype, name="attn2")(
                h, cond.astype(x.dtype)
            )
            + x
        )
        h = nn.LayerNorm(dtype=jnp.float32, name="norm3")(x.astype(jnp.float32)).astype(
            x.dtype
        )
        return FeedForward(dtype=self.dtype, name="ff")(h) + x


class SpatialTransformer(nn.Module):
    """GN -> 1x1 conv -> flatten HW -> transformer blocks -> 1x1 conv, +residual
    (reference ``unet_attention.py:26-86``)."""

    n_heads: int
    n_layers: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, cond: jnp.ndarray) -> jnp.ndarray:
        b, h, w, c = x.shape
        x_in = x
        x = FP32GroupNorm(epsilon=1e-6, name="norm")(x)
        x = nn.Conv(c, (1, 1), dtype=self.dtype, name="proj_in")(x)
        x = x.reshape(b, h * w, c)
        for i in range(self.n_layers):
            x = BasicTransformerBlock(
                self.n_heads, c // self.n_heads, self.dtype, name=f"block_{i}"
            )(x, cond)
        x = x.reshape(b, h, w, c)
        x = nn.Conv(c, (1, 1), dtype=self.dtype, name="proj_out")(x)
        return x + x_in


class DownSample(nn.Module):
    dtype: Any = jnp.float32
    folded_input: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        if self.folded_input:  # level-0 exit: folded in, normal stride-2 out
            return S2dExitConv(x.shape[-1] // 2, self.dtype, name="conv")(x)
        return _conv3x3(x.shape[-1], self.dtype, "conv", stride=2)(x)


class UpSample(nn.Module):
    dtype: Any = jnp.float32
    fold_output: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        import os

        if self.fold_output:  # level 1 -> 0 re-entry: upsample INTO the fold
            from ..ops.s2d import to_s2d, upsample2x_s2d

            xs = upsample2x_s2d(to_s2d(x))
            return S2dConv(x.shape[-1], (3, 3), self.dtype, name="conv")(xs)

        b, h, w, c = x.shape
        # 2x nearest upsample as broadcast+reshape (identical to the reference's
        # F.interpolate(scale_factor=2, mode="nearest")).  jax.image.resize
        # lowers to gather `while` loops on TPU — profiled at ~3% of sampling.
        if os.environ.get("POLYFF_LEGACY_UPSAMPLE") == "1":  # A/B knob
            x = jax.image.resize(x, (b, 2 * h, 2 * w, c), method="nearest")
        else:
            x = jnp.broadcast_to(x[:, :, None, :, None, :], (b, h, 2, w, 2, c))
            x = x.reshape(b, 2 * h, 2 * w, c)
        return _conv3x3(c, self.dtype, "conv")(x)


class UNetModel(nn.Module):
    """The epsilon-prediction UNet.

    Inputs: ``x`` (B, H, W, in_channels) NHWC, ``time_steps`` (B,), ``cond``
    (B, n_cond, d_cond).  Output: (B, H, W, out_channels) in fp32.
    """

    in_channels: int = 2
    out_channels: int = 2
    channels: int = 64
    n_res_blocks: int = 2
    attention_levels: Sequence[int] = (2, 3)
    channel_multipliers: Sequence[int] = (1, 2, 4, 4)
    n_heads: int = 4
    tf_layers: int = 1
    d_cond: int = 512
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        time_steps: jnp.ndarray,
        cond: jnp.ndarray,
        cfg_fork: bool = False,
    ) -> jnp.ndarray:
        """With ``cfg_fork=True``, ``x``/``time_steps`` carry batch B while ``cond``
        carries 2B (= [uncond | cond]); everything before the first cross-attention
        is computed ONCE and duplicated at the fork point — numerically identical to
        the reference's double-batched CFG call (sampler/__init__.py:69-77) at a
        fraction of the high-resolution conv cost."""
        import os

        levels = len(self.channel_multipliers)
        d_time_emb = self.channels * 4
        # Space-to-depth folded level 0 (POLYFF_S2D=1): applies only when level
        # 0 is attention-free, the virtual concat is on, and no conflicting
        # conv-path override is active — everything else falls back cleanly.
        s2d = (
            _s2d_enabled()
            and 0 not in self.attention_levels
            and os.environ.get("POLYFF_MATERIALIZE_CONCAT") != "1"
            and not _fused_gn_conv_enabled()
            and not _int8_xla_enabled()
        )

        t_emb = timestep_embedding(time_steps, self.channels)
        t_emb = nn.Dense(d_time_emb, dtype=self.dtype, name="time_embed_0")(
            t_emb.astype(self.dtype)
        )
        t_emb = nn.Dense(d_time_emb, dtype=self.dtype, name="time_embed_2")(
            nn.silu(t_emb)
        )

        x = x.astype(self.dtype)

        # --- input half -----------------------------------------------------
        state = {"forked": not cfg_fork}
        skips = []

        def tile2(a):
            return jnp.concatenate([a, a], axis=0)

        def maybe_fork():
            nonlocal h, t_emb, skips
            if not state["forked"]:
                h = tile2(h)
                t_emb = tile2(t_emb)
                skips = [tile2(s) for s in skips]
                state["forked"] = True

        if s2d:
            h = S2dEntryConv(self.channels, self.dtype, name="input_blocks_0_0")(x)
        else:
            h = _conv3x3(self.channels, self.dtype, "input_blocks_0_0")(x)
        skips.append(h)
        block_idx = 1
        channels_list = [self.channels * m for m in self.channel_multipliers]
        for i in range(levels):
            for _ in range(self.n_res_blocks):
                h = ResBlock(
                    channels_list[i],
                    self.dtype,
                    folded=s2d and i == 0,
                    name=f"input_blocks_{block_idx}_0",
                )(h, t_emb)
                if i in self.attention_levels:
                    maybe_fork()
                    h = SpatialTransformer(
                        self.n_heads,
                        self.tf_layers,
                        self.dtype,
                        name=f"input_blocks_{block_idx}_1",
                    )(h, cond)
                skips.append(h)
                block_idx += 1
            if i != levels - 1:
                h = DownSample(
                    self.dtype,
                    folded_input=s2d and i == 0,
                    name=f"input_blocks_{block_idx}_0",
                )(h)
                skips.append(h)
                block_idx += 1

        # --- middle -----------------------------------------------------------
        maybe_fork()
        h = ResBlock(h.shape[-1], self.dtype, name="middle_block_0")(h, t_emb)
        h = SpatialTransformer(
            self.n_heads, self.tf_layers, self.dtype, name="middle_block_1"
        )(h, cond)
        h = ResBlock(h.shape[-1], self.dtype, name="middle_block_2")(h, t_emb)

        # --- output half ------------------------------------------------------
        # virtual skip-concat by default; POLYFF_MATERIALIZE_CONCAT=1 restores
        # the reference's real concatenate (A/B knob, numerically ~identical)
        virtual_concat = os.environ.get("POLYFF_MATERIALIZE_CONCAT") != "1"
        block_idx = 0
        for i in reversed(range(levels)):
            for j in range(self.n_res_blocks + 1):
                skip_t = skips.pop()
                if not virtual_concat:
                    h = jnp.concatenate([h, skip_t], axis=-1)
                    skip_t = None
                h = ResBlock(
                    channels_list[i],
                    self.dtype,
                    folded=s2d and i == 0,
                    name=f"output_blocks_{block_idx}_0",
                )(h, t_emb, skip=skip_t)
                lidx = 1
                if i in self.attention_levels:
                    h = SpatialTransformer(
                        self.n_heads,
                        self.tf_layers,
                        self.dtype,
                        name=f"output_blocks_{block_idx}_{lidx}",
                    )(h, cond)
                    lidx += 1
                if i != 0 and j == self.n_res_blocks:
                    h = UpSample(
                        self.dtype,
                        fold_output=s2d and i == 1,
                        name=f"output_blocks_{block_idx}_{lidx}",
                    )(h)
                block_idx += 1

        # --- head ---------------------------------------------------------------
        if s2d:
            from ..ops.s2d import from_s2d

            h = FP32GroupNorm(name="out_norm", folded=True)(h)
            h = S2dConv(self.out_channels, (3, 3), self.dtype, name="out_conv")(
                nn.silu(h)
            )
            return from_s2d(h).astype(jnp.float32)
        h = FP32GroupNorm(name="out_norm")(h)
        h = nn.silu(h)
        h = _conv3x3(self.out_channels, self.dtype, "out_conv")(h)
        return h.astype(jnp.float32)


def nchw_to_nhwc(x: jnp.ndarray) -> jnp.ndarray:
    return jnp.transpose(x, (0, 2, 3, 1))


def nhwc_to_nchw(x: jnp.ndarray) -> jnp.ndarray:
    return jnp.transpose(x, (0, 3, 1, 2))
