"""Plain (unconditional) DDPM UNet — the reference's second model family
(``ddpm/unet.py``): additive time-embedding ResBlocks, single-head self-attention
blocks, ConvTranspose upsampling.  NHWC, bf16-capable like ``models.unet``.

Reference quirks preserved for checkpoint parity:
- ``TimeEmbedding`` sine-first embedding with ``half_dim = channels // 8``
  (``ddpm/unet.py:61-82``);
- ``AttentionBlock`` defines a GroupNorm but never applies it, and adds the
  residual before reshaping (``ddpm/unet.py:180-214``);
- the up path has ``n_blocks + 1`` UpBlocks per level, the final one reducing
  channels (``ddpm/unet.py:385-398``).
"""

from __future__ import annotations

import math
from typing import Any, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from .unet import FP32GroupNorm, _conv3x3


def ddpm_time_embedding(t: jnp.ndarray, n_channels: int) -> jnp.ndarray:
    """Sinusoidal embedding, sin-first, denominator (half_dim - 1) (ddpm/unet.py:61-75)."""
    half_dim = n_channels // 8
    emb = math.log(10000) / (half_dim - 1)
    emb = jnp.exp(jnp.arange(half_dim, dtype=jnp.float32) * -emb)
    emb = t.astype(jnp.float32)[:, None] * emb[None, :]
    return jnp.concatenate([jnp.sin(emb), jnp.cos(emb)], axis=1)


class TimeEmbedding(nn.Module):
    n_channels: int  # = base_channels * 4
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, t: jnp.ndarray) -> jnp.ndarray:
        emb = ddpm_time_embedding(t, self.n_channels)
        emb = nn.Dense(self.n_channels, dtype=self.dtype, name="lin1")(
            emb.astype(self.dtype)
        )
        emb = nn.swish(emb)
        return nn.Dense(self.n_channels, dtype=self.dtype, name="lin2")(emb)


class ResidualBlock(nn.Module):
    """norm -> swish -> conv, +time, norm -> swish -> conv, +shortcut
    (ddpm/unet.py:85-144; n_groups=32)."""

    out_channels: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, t_emb: jnp.ndarray) -> jnp.ndarray:
        c_in = x.shape[-1]
        h = nn.swish(FP32GroupNorm(name="norm1")(x))
        h = _conv3x3(self.out_channels, self.dtype, "conv1")(h)
        h = h + nn.Dense(self.out_channels, dtype=self.dtype, name="time_emb")(t_emb)[
            :, None, None, :
        ].astype(h.dtype)
        h = nn.swish(FP32GroupNorm(name="norm2")(h))
        h = _conv3x3(self.out_channels, self.dtype, "conv2")(h)
        if c_in != self.out_channels:
            x = nn.Conv(self.out_channels, (1, 1), dtype=self.dtype, name="shortcut")(x)
        return h + x


class AttentionBlock(nn.Module):
    """Single-projection self-attention, no pre-norm (quirk), +residual
    (ddpm/unet.py:147-214)."""

    n_heads: int = 1
    d_k: int = 0  # 0 -> n_channels
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        b, h, w, c = x.shape
        d_k = self.d_k or c
        seq = x.reshape(b, h * w, c)
        qkv = nn.Dense(self.n_heads * d_k * 3, dtype=self.dtype, name="projection")(seq)
        qkv = qkv.reshape(b, h * w, self.n_heads, 3 * d_k)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        attn = jnp.einsum("bihd,bjhd->bijh", q, k, preferred_element_type=jnp.float32)
        attn = jax.nn.softmax(attn.astype(jnp.float32) * (d_k**-0.5), axis=2)
        res = jnp.einsum(
            "bijh,bjhd->bihd", attn.astype(self.dtype), v,
            preferred_element_type=jnp.float32,
        ).astype(seq.dtype)
        res = res.reshape(b, h * w, self.n_heads * d_k)
        res = nn.Dense(c, dtype=self.dtype, name="output")(res)
        return (res + seq).reshape(b, h, w, c)


class Downsample(nn.Module):
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        return _conv3x3(x.shape[-1], self.dtype, "conv", stride=2)(x)


class Upsample(nn.Module):
    """ConvTranspose (4,4) stride 2 pad 1 (ddpm/unet.py:288-301)."""

    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        # flax 'SAME' + transpose_kernel=True matches torch ConvTranspose2d(k=4, s=2, p=1)
        return nn.ConvTranspose(
            x.shape[-1],
            (4, 4),
            strides=(2, 2),
            padding="SAME",
            transpose_kernel=True,
            dtype=self.dtype,
            name="conv",
        )(x)


class DDPMUNet(nn.Module):
    """The unconditional UNet (ddpm/unet.py:320-446); eps(x, t) -> (B, H, W, C_img)."""

    image_channels: int = 2
    n_channels: int = 64
    ch_mults: Sequence[int] = (1, 2, 2, 4)
    is_attn: Sequence[bool] = (False, False, False, True)
    n_blocks: int = 2
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, t: jnp.ndarray) -> jnp.ndarray:
        n_res = len(self.ch_mults)
        t_emb = TimeEmbedding(self.n_channels * 4, self.dtype, name="time_emb")(t)
        x = _conv3x3(self.n_channels, self.dtype, "image_proj")(x.astype(self.dtype))

        skips = [x]
        # ---- down path: module indices mirror the torch ModuleList ("down_{i}")
        idx = 0
        in_ch = out_ch = self.n_channels
        for i in range(n_res):
            out_ch = in_ch * self.ch_mults[i]
            for _ in range(self.n_blocks):
                x = ResidualBlock(out_ch, self.dtype, name=f"down_{idx}_res")(x, t_emb)
                if self.is_attn[i]:
                    x = AttentionBlock(dtype=self.dtype, name=f"down_{idx}_attn")(x)
                skips.append(x)
                idx += 1
                in_ch = out_ch
            if i < n_res - 1:
                x = Downsample(self.dtype, name=f"down_{idx}_ds")(x)
                skips.append(x)
                idx += 1

        x = ResidualBlock(out_ch, self.dtype, name="middle_res1")(x, t_emb)
        x = AttentionBlock(dtype=self.dtype, name="middle_attn")(x)
        x = ResidualBlock(out_ch, self.dtype, name="middle_res2")(x, t_emb)

        # ---- up path
        idx = 0
        in_ch = out_ch
        for i in reversed(range(n_res)):
            out_ch = in_ch
            for _ in range(self.n_blocks):
                x = jnp.concatenate([x, skips.pop()], axis=-1)
                x = ResidualBlock(out_ch, self.dtype, name=f"up_{idx}_res")(x, t_emb)
                if self.is_attn[i]:
                    x = AttentionBlock(dtype=self.dtype, name=f"up_{idx}_attn")(x)
                idx += 1
            out_ch = in_ch // self.ch_mults[i]
            x = jnp.concatenate([x, skips.pop()], axis=-1)
            x = ResidualBlock(out_ch, self.dtype, name=f"up_{idx}_res")(x, t_emb)
            if self.is_attn[i]:
                x = AttentionBlock(dtype=self.dtype, name=f"up_{idx}_attn")(x)
            idx += 1
            in_ch = out_ch
            if i > 0:
                x = Upsample(self.dtype, name=f"up_{idx}_us")(x)
                idx += 1

        x = nn.swish(FP32GroupNorm(num_groups=8, name="norm")(x))
        x = _conv3x3(self.image_channels, self.dtype, "final")(x)
        return x.astype(jnp.float32)
