"""KL autoencoder (VQGAN-style) — the reference's optional first-stage model
(``stable_diffusion/model/autoencoder.py``) in flax/NHWC.

The reference never actually trains this path (its trainer raises
NotImplementedError, ``train/train_ldm.py:34-54``; the README lists latent-space
diffusion as future work), but the model family is part of the surface.  Here it is
fully functional: Encoder/Decoder ResNet stacks with mid attention, quant convs and
the Gaussian latent.  Loss divergences from the dead reference path are documented
in ``losses.py``.
"""

from __future__ import annotations

from typing import Any, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from .unet import FP32GroupNorm


def _conv(features, k, dtype, name, stride=1, padding=None):
    if padding is None:
        padding = ((k // 2, k // 2), (k // 2, k // 2))
    return nn.Conv(
        features, (k, k), strides=(stride, stride), padding=padding, dtype=dtype, name=name
    )


class ResnetBlock(nn.Module):
    out_channels: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        c_in = x.shape[-1]
        h = nn.swish(FP32GroupNorm(name="norm1")(x))
        h = _conv(self.out_channels, 3, self.dtype, "conv1")(h)
        h = nn.swish(FP32GroupNorm(name="norm2")(h))
        h = _conv(self.out_channels, 3, self.dtype, "conv2")(h)
        if c_in != self.out_channels:
            x = nn.Conv(self.out_channels, (1, 1), dtype=self.dtype, name="nin_shortcut")(x)
        return x + h


class AttnBlock(nn.Module):
    """Single-head conv-projection attention (autoencoder.py:327-380)."""

    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        xn = FP32GroupNorm(name="norm")(x)
        q = nn.Conv(c, (1, 1), dtype=self.dtype, name="q")(xn).reshape(b, h * w, c)
        k = nn.Conv(c, (1, 1), dtype=self.dtype, name="k")(xn).reshape(b, h * w, c)
        v = nn.Conv(c, (1, 1), dtype=self.dtype, name="v")(xn).reshape(b, h * w, c)
        attn = jnp.einsum("bic,bjc->bij", q, k, preferred_element_type=jnp.float32)
        attn = jax.nn.softmax(attn.astype(jnp.float32) * (c**-0.5), axis=2)
        out = jnp.einsum(
            "bij,bjc->bic", attn.astype(self.dtype), v, preferred_element_type=jnp.float32
        ).astype(x.dtype)
        out = nn.Conv(c, (1, 1), dtype=self.dtype, name="proj_out")(out.reshape(b, h, w, c))
        return x + out


class Encoder(nn.Module):
    channels: int = 64
    channel_multipliers: Sequence[int] = (1, 2, 4, 4)
    n_resnet_blocks: int = 2
    z_channels: int = 4
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, img):
        x = _conv(self.channels, 3, self.dtype, "conv_in")(img.astype(self.dtype))
        ch_list = [m * self.channels for m in [1] + list(self.channel_multipliers)]
        n_res = len(self.channel_multipliers)
        for i in range(n_res):
            for j in range(self.n_resnet_blocks):
                x = ResnetBlock(ch_list[i + 1], self.dtype, name=f"down_{i}_block_{j}")(x)
            if i != n_res - 1:
                # asymmetric (0,1) pad + stride-2 (autoencoder.py:406-426)
                x = jnp.pad(x, ((0, 0), (0, 1), (0, 1), (0, 0)))
                x = _conv(
                    x.shape[-1], 3, self.dtype, f"down_{i}_downsample",
                    stride=2, padding="VALID",
                )(x)
        x = ResnetBlock(x.shape[-1], self.dtype, name="mid_block_1")(x)
        x = AttnBlock(self.dtype, name="mid_attn_1")(x)
        x = ResnetBlock(x.shape[-1], self.dtype, name="mid_block_2")(x)
        x = nn.swish(FP32GroupNorm(name="norm_out")(x))
        return _conv(2 * self.z_channels, 3, self.dtype, "conv_out")(x)


class Decoder(nn.Module):
    channels: int = 64
    channel_multipliers: Sequence[int] = (1, 2, 4, 4)
    n_resnet_blocks: int = 2
    out_channels: int = 3
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, z):
        ch_list = [m * self.channels for m in self.channel_multipliers]
        x = _conv(ch_list[-1], 3, self.dtype, "conv_in")(z.astype(self.dtype))
        x = ResnetBlock(x.shape[-1], self.dtype, name="mid_block_1")(x)
        x = AttnBlock(self.dtype, name="mid_attn_1")(x)
        x = ResnetBlock(x.shape[-1], self.dtype, name="mid_block_2")(x)
        for i in reversed(range(len(self.channel_multipliers))):
            for j in range(self.n_resnet_blocks + 1):
                x = ResnetBlock(ch_list[i], self.dtype, name=f"up_{i}_block_{j}")(x)
            if i != 0:
                b, h, w, c = x.shape
                x = jax.image.resize(x, (b, 2 * h, 2 * w, c), method="nearest")
                x = _conv(c, 3, self.dtype, f"up_{i}_upsample")(x)
        x = nn.swish(FP32GroupNorm(name="norm_out")(x))
        return _conv(self.out_channels, 3, self.dtype, "conv_out")(x)


class Autoencoder(nn.Module):
    """Full KL autoencoder with quant convs (autoencoder.py:27-109)."""

    channels: int = 64
    channel_multipliers: Sequence[int] = (1, 2, 4, 4)
    n_resnet_blocks: int = 2
    in_channels: int = 3
    out_channels: int = 3
    z_channels: int = 4
    emb_channels: int = 4
    dtype: Any = jnp.float32

    def setup(self):
        self.encoder = Encoder(
            self.channels, self.channel_multipliers, self.n_resnet_blocks,
            self.z_channels, self.dtype,
        )
        self.decoder = Decoder(
            self.channels, self.channel_multipliers, self.n_resnet_blocks,
            self.out_channels, self.dtype,
        )
        self.quant_conv = nn.Conv(2 * self.emb_channels, (1, 1), dtype=self.dtype)
        self.post_quant_conv = nn.Conv(self.z_channels, (1, 1), dtype=self.dtype)

    def encode_moments(self, img) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """-> (mean, log_var) each (B, h/8, w/8, emb_channels)."""
        moments = self.quant_conv(self.encoder(img))
        mean, log_var = jnp.split(moments, 2, axis=-1)
        return mean, jnp.clip(log_var, -30.0, 20.0)

    def decode(self, z):
        return self.decoder(self.post_quant_conv(z))

    def __call__(self, img, rng):
        mean, log_var = self.encode_moments(img)
        std = jnp.exp(0.5 * log_var)
        z = mean + std * jax.random.normal(rng, std.shape, std.dtype)
        return self.decode(z), (mean, log_var)


def gaussian_sample(rng, mean, log_var):
    return mean + jnp.exp(0.5 * log_var) * jax.random.normal(rng, mean.shape, mean.dtype)
