"""Autoencoder training task (reference ``models/model_autoencoder.py`` +
``train/train_autoencoder.py`` — marked "unused" there; functional here).

Pads the 2-channel prmat2c to ``in_channels`` (reference pads 2->3,
model_autoencoder.py:18-24) and trains the KL autoencoder.  GAN specifics: both the
generator (AE) and discriminator parameter groups live in one pytree; the jitted
step computes generator and discriminator losses with stop-gradients partitioning
the flow, so one optimizer update trains both adversaries — the TPU-first
replacement for Lightning's alternating optimizer_idx scheme.
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from ..models.autoencoder import Autoencoder
from ..models.losses import (
    NLayerDiscriminator,
    ae_discriminator_loss,
    ae_generator_loss,
)
from ..models.unet import nchw_to_nhwc


class AutoencoderTask:
    name = "autoencoder"

    #: batch fields the loss reads (data/loader.py DeviceFeeder placeholders)
    used_batch_fields = frozenset({"prmat2c"})

    def __init__(self, cfg):
        self.cfg = cfg
        dtype = jnp.bfloat16 if cfg.get("bf16", False) else jnp.float32
        self.ae = Autoencoder(
            channels=cfg.get("channels", 64),
            channel_multipliers=tuple(cfg.get("channel_multipliers", (1, 2, 4, 4))),
            n_resnet_blocks=cfg.get("n_res_blocks", 2),
            in_channels=cfg.get("in_channels", 3),
            out_channels=cfg.get("out_channels", 3),
            z_channels=cfg.get("z_channels", 4),
            emb_channels=cfg.get("emb_channels", 4),
            dtype=dtype,
        )
        self.disc = NLayerDiscriminator(dtype=dtype)
        self.disc_start = int(cfg.get("disc_start", 50001))
        self.kl_weight = float(cfg.get("kl_weight", 1e-6))
        self.disc_weight = float(cfg.get("disc_weight", 0.5))

        # LPIPS perceptual term (reference contperceptual.py:28-29, weight 1.0);
        # active only when converted VGG/LPIPS weights are supplied — the
        # reference's pretrained download is impossible offline (models/lpips.py).
        self.perceptual_weight = float(cfg.get("perceptual_weight", 1.0))
        self.lpips = None
        self.lpips_params = cfg.get("lpips_params")  # injectable for tests
        lpips_path = cfg.get("lpips_path")
        if lpips_path:
            from ..convert.torch_import import torch_file_to_numpy
            from ..models.lpips import lpips_params_from_torch

            self.lpips_params = lpips_params_from_torch(
                torch_file_to_numpy(lpips_path)
            )
        if self.lpips_params is not None:
            from ..models.lpips import LPIPS

            self.lpips = LPIPS(dtype=dtype)

    def _pad_channels(self, prmat2c: jnp.ndarray) -> jnp.ndarray:
        """(B, 2, H, W) -> NHWC padded to in_channels (model_autoencoder.py:18-24)."""
        x = nchw_to_nhwc(prmat2c)
        extra = self.ae.in_channels - x.shape[-1]
        if extra > 0:
            x = jnp.concatenate(
                [x, jnp.zeros((*x.shape[:-1], extra), x.dtype)], axis=-1
            )
        return x

    def init_params(self, rng: jax.Array):
        r1, r2, r3 = jax.random.split(rng, 3)
        h = self.cfg.get("img_h", 128)
        img = jnp.zeros((1, h, h, self.ae.in_channels))
        return {
            "ae": self.ae.init(r1, img, r2)["params"],
            "disc": self.disc.init(r3, img)["params"],
            # per-model learned output log-variance (contperceptual.py logvar)
            "logvar": jnp.zeros(()),
        }

    def disc_apply(self, params, x):
        return self.disc.apply({"params": params}, x)

    def _adaptive_weight(self, params, x, recon, rng):
        """Grad-norm-ratio disc weight on the decoder's last conv kernel
        (reference contperceptual.py calculate_adaptive_weight).

        Recomputes the decode as a function of that kernel — two small extra
        backward passes, stop-gradiented (the weight is a scalar coefficient,
        not a differentiable quantity)."""
        from ..models.losses import adaptive_disc_weight

        mean, log_var = self.ae.apply(
            {"params": params["ae"]}, x, method=self.ae.encode_moments
        )
        std = jnp.exp(0.5 * log_var)
        z = jax.lax.stop_gradient(
            mean + std * jax.random.normal(rng, std.shape, std.dtype)
        )

        def with_kernel(kernel, which):
            p = jax.tree_util.tree_map(lambda a: a, params["ae"])  # shallow copy
            p = dict(p)
            dec = dict(p["decoder"])
            out = dict(dec["conv_out"])
            out["kernel"] = kernel
            dec["conv_out"] = out
            p["decoder"] = dec
            rec = self.ae.apply({"params": p}, z, method=self.ae.decode).astype(
                jnp.float32
            )
            if which == "nll":
                nll = jnp.abs(x - rec) / jnp.exp(params["logvar"]) + params["logvar"]
                return jnp.sum(nll) / x.shape[0]
            return -jnp.mean(self.disc_apply(params["disc"], rec))

        kernel = params["ae"]["decoder"]["conv_out"]["kernel"]
        nll_grad = jax.grad(lambda k: with_kernel(k, "nll"))(kernel)
        g_grad = jax.grad(lambda k: with_kernel(k, "g"))(kernel)
        return adaptive_disc_weight(nll_grad, g_grad, self.disc_weight)

    def loss_fn(
        self, params, batch, rng: jax.Array, sched_params: Dict
    ) -> Tuple[jnp.ndarray, Dict]:
        step = sched_params.get("global_step", jnp.inf)
        from ..data.loader import decompress_batch

        x = self._pad_channels(decompress_batch(batch)[0])
        recon, moments = self.ae.apply({"params": params["ae"]}, x, rng)
        recon = recon.astype(jnp.float32)

        disc_weight = self.disc_weight
        if self.cfg.get("adaptive_disc_weight", True):
            disc_weight = self._adaptive_weight(
                jax.lax.stop_gradient(params), x, recon, rng
            )

        p_loss = None
        if self.lpips is not None and self.perceptual_weight > 0:
            # LPIPS network frozen; gradient flows through the reconstruction
            p_loss = self.lpips.apply(
                {"params": jax.lax.stop_gradient(self.lpips_params)}, x, recon
            )

        # generator side: discriminator params frozen
        g_loss, g_metrics = ae_generator_loss(
            x,
            recon,
            moments,
            self.disc_apply,
            jax.lax.stop_gradient(params["disc"]),
            step,
            logvar=params["logvar"],
            disc_start=self.disc_start,
            kl_weight=self.kl_weight,
            disc_weight=disc_weight,
            p_loss=p_loss,
            perceptual_weight=self.perceptual_weight,
        )
        if p_loss is not None:
            g_metrics = {**g_metrics, "p_loss": jnp.mean(p_loss)}
        # discriminator side: ae outputs stop-gradiented inside
        d_loss, d_metrics = ae_discriminator_loss(
            x, recon, self.disc_apply, params["disc"], step,
            disc_start=self.disc_start,
        )
        total = g_loss + d_loss
        return total, {"loss": total, **g_metrics, **d_metrics}
