"""Unconditional DDPM task (reference ``models/model_ddpm.py`` + ``ddpm/__init__.py``):
plain UNet eps-prediction with the linear beta(1e-4 -> 0.02) schedule."""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from ..diffusion.gaussian import q_sample
from ..diffusion.schedule import make_schedule
from ..models.ddpm_unet import DDPMUNet
from ..models.unet import nchw_to_nhwc


class DDPMTask:
    name = "ddpm"

    #: batch fields the loss reads (data/loader.py DeviceFeeder placeholders)
    used_batch_fields = frozenset({"prmat2c"})

    def __init__(self, cfg):
        self.cfg = cfg
        dtype = jnp.bfloat16 if cfg.get("bf16", False) else jnp.float32
        self.unet = DDPMUNet(
            image_channels=cfg.get("image_channels", 2),
            n_channels=cfg.get("n_channels", 64),
            ch_mults=tuple(cfg.get("channel_multipliers", (1, 2, 2, 4))),
            is_attn=tuple(cfg.get("is_attention", (False, False, False, True))),
            dtype=dtype,
        )
        # beta = linspace(1e-4, 0.02) (ddpm/__init__.py:25)
        self.schedule = make_schedule(cfg.get("n_steps", 1000), 1e-4, 0.02, kind="linear")

    def init_params(self, rng: jax.Array):
        h = self.cfg.get("image_size_h", 128)
        w = self.cfg.get("image_size_w", 128)
        c = self.cfg.get("image_channels", 2)
        return self.unet.init(rng, jnp.zeros((1, h, w, c)), jnp.zeros((1,), jnp.int32))[
            "params"
        ]

    def apply_eps(self, params, x, t, cond=None):
        del cond
        return self.unet.apply({"params": params}, x, t)

    def loss_fn(
        self, params, batch, rng: jax.Array, sched_params: Dict
    ) -> Tuple[jnp.ndarray, Dict]:
        del sched_params
        from ..data.loader import decompress_batch

        batch = decompress_batch(batch)
        x0 = nchw_to_nhwc(batch[0])
        t_key, eps_key = jax.random.split(rng)
        t = jax.random.randint(t_key, (x0.shape[0],), 0, self.schedule.n_steps)
        noise = jax.random.normal(eps_key, x0.shape, x0.dtype)
        xt = q_sample(self.schedule, x0, t, noise)
        eps_theta = self.apply_eps(params, xt, t)
        loss = jnp.mean((noise - eps_theta) ** 2)
        return loss, {"loss": loss}
