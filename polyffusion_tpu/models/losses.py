"""Autoencoder training losses: reconstruction + KL + PatchGAN adversarial.

Counterpart of the reference ``stable_diffusion/losses/`` (LPIPSWithDiscriminator,
NLayerDiscriminator).  Documented divergences from the (dead — never trainable in
the reference, ``train/train_ldm.py:34-54``) original path:

- the VGG16-based LPIPS perceptual term (``models/lpips.py``) is OFF unless the
  config supplies converted weights (``lpips_path``): pretrained VGG weights
  cannot be downloaded here (no egress), and an RGB prior has limited meaning for
  binary piano rolls — but the module + converter exist so the term switches on
  exactly as in the reference (``contperceptual.py:72-76``) when weights arrive;
Everything else matches: L1 + logvar-scaled NLL, per-sample-summed KL, hinge or
vanilla discriminator losses, ``disc_start`` gating, and the adaptive
generator/discriminator balancing (grad-norm ratio on the decoder's last layer,
``calculate_adaptive_weight`` in the reference) via :func:`adaptive_disc_weight`.
"""

from __future__ import annotations

from typing import Any, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn


class _TrainModeBatchNorm(nn.Module):
    """Batch-statistics normalization with learned scale/bias — exactly what torch
    BatchNorm2d computes in training mode, without running-average state (the
    discriminator is train-only)."""

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (c,))
        bias = self.param("bias", nn.initializers.zeros, (c,))
        x32 = x.astype(jnp.float32)
        mean = jnp.mean(x32, axis=(0, 1, 2))
        var = jnp.var(x32, axis=(0, 1, 2))
        y = (x32 - mean) * jax.lax.rsqrt(var + 1e-5) * scale + bias
        return y.astype(x.dtype)


class NLayerDiscriminator(nn.Module):
    """PatchGAN discriminator (reference losses/discriminator.py:17)."""

    ndf: int = 64
    n_layers: int = 3
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        kw, padw = 4, 1
        pad = ((padw, padw), (padw, padw))
        h = nn.Conv(self.ndf, (kw, kw), strides=(2, 2), padding=pad, dtype=self.dtype,
                    name="conv_0")(x.astype(self.dtype))
        h = nn.leaky_relu(h, 0.2)
        for n in range(1, self.n_layers):
            nf = min(2**n, 8)
            h = nn.Conv(self.ndf * nf, (kw, kw), strides=(2, 2), padding=pad,
                        use_bias=False, dtype=self.dtype, name=f"conv_{n}")(h)
            h = _TrainModeBatchNorm(name=f"bn_{n}")(h)
            h = nn.leaky_relu(h, 0.2)
        nf = min(2**self.n_layers, 8)
        h = nn.Conv(self.ndf * nf, (kw, kw), strides=(1, 1), padding=pad,
                    use_bias=False, dtype=self.dtype, name=f"conv_{self.n_layers}")(h)
        h = _TrainModeBatchNorm(name=f"bn_{self.n_layers}")(h)
        h = nn.leaky_relu(h, 0.2)
        return nn.Conv(1, (kw, kw), strides=(1, 1), padding=pad, dtype=self.dtype,
                       name="conv_out")(h)


def hinge_d_loss(logits_real, logits_fake):
    return 0.5 * (
        jnp.mean(nn.relu(1.0 - logits_real)) + jnp.mean(nn.relu(1.0 + logits_fake))
    )


def vanilla_d_loss(logits_real, logits_fake):
    return 0.5 * (
        jnp.mean(jax.nn.softplus(-logits_real)) + jnp.mean(jax.nn.softplus(logits_fake))
    )


def kl_per_sample(mean, log_var):
    """0.5 sum(mu^2 + var - 1 - logvar) per sample, averaged over batch
    (CompVis DiagonalGaussian.kl semantics used by contperceptual.py)."""
    kl = 0.5 * jnp.sum(
        mean**2 + jnp.exp(log_var) - 1.0 - log_var,
        axis=tuple(range(1, mean.ndim)),
    )
    return jnp.mean(kl)


def adaptive_disc_weight(nll_grad_last, g_grad_last, disc_weight: float):
    """||d nll / d last|| / ||d g / d last|| clipped to [0, 1e4], x disc_weight
    (reference contperceptual.py calculate_adaptive_weight)."""
    nll_norm = jnp.linalg.norm(nll_grad_last)
    g_norm = jnp.linalg.norm(g_grad_last)
    w = nll_norm / (g_norm + 1e-4)
    return jax.lax.stop_gradient(jnp.clip(w, 0.0, 1e4)) * disc_weight


def ae_generator_loss(
    inputs,
    reconstructions,
    moments: Tuple[jnp.ndarray, jnp.ndarray],
    disc_apply,
    disc_params,
    global_step,
    *,
    logvar: jnp.ndarray,
    disc_start: int = 50001,
    kl_weight: float = 1e-6,
    disc_weight: float = 0.5,
    disc_factor: float = 1.0,
    p_loss=None,
    perceptual_weight: float = 1.0,
):
    """Encoder/decoder-side loss (reference contperceptual.py, optimizer_idx=0).

    ``p_loss``: optional per-sample LPIPS distances (B,); added into the
    reconstruction term exactly as the reference does (contperceptual.py:72-76,
    broadcast over the elementwise |x - x̂| map before the NLL scaling).
    """
    rec = jnp.abs(inputs - reconstructions)
    if p_loss is not None:
        rec = rec + perceptual_weight * p_loss.reshape(
            (-1,) + (1,) * (rec.ndim - 1)
        )
    nll = rec / jnp.exp(logvar) + logvar
    nll_loss = jnp.sum(nll) / nll.shape[0]
    kl = kl_per_sample(*moments)

    logits_fake = disc_apply(disc_params, reconstructions)
    g_loss = -jnp.mean(logits_fake)
    factor = jnp.where(global_step >= disc_start, disc_factor, 0.0)
    loss = nll_loss + kl_weight * kl + factor * disc_weight * g_loss
    return loss, {
        "nll_loss": nll_loss,
        "kl_loss": kl,
        "g_loss": g_loss,
        "disc_factor": factor,
    }


def ae_discriminator_loss(
    inputs,
    reconstructions,
    disc_apply,
    disc_params,
    global_step,
    *,
    disc_start: int = 50001,
    disc_factor: float = 1.0,
    loss_type: str = "hinge",
):
    """Discriminator-side loss (reference contperceptual.py, optimizer_idx=1)."""
    logits_real = disc_apply(disc_params, jax.lax.stop_gradient(inputs))
    logits_fake = disc_apply(disc_params, jax.lax.stop_gradient(reconstructions))
    d = hinge_d_loss if loss_type == "hinge" else vanilla_d_loss
    factor = jnp.where(global_step >= disc_start, disc_factor, 0.0)
    loss = factor * d(logits_real, logits_fake)
    return loss, {
        "disc_loss": loss,
        "logits_real": jnp.mean(logits_real),
        "logits_fake": jnp.mean(logits_fake),
    }
