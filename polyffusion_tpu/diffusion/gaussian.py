"""Forward (q) process and the simplified diffusion training loss.

Semantics follow the reference ``LatentDiffusion`` (``stable_diffusion/
latent_diffusion.py:149-240``): per-sample uniform t, q_sample, eps-prediction MSE.
Everything is a pure jittable function over NHWC arrays; the model's epsilon net is
passed in as ``apply_fn(params, x, t, cond) -> eps``.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp

from .schedule import NoiseSchedule

ApplyFn = Callable[..., jnp.ndarray]


def _bcast(coef: jnp.ndarray, ndim: int) -> jnp.ndarray:
    """(B,) -> (B, 1, 1, ..., 1) for image broadcasting."""
    return coef.reshape(coef.shape + (1,) * (ndim - 1))


def q_sample(
    schedule: NoiseSchedule, x0: jnp.ndarray, t: jnp.ndarray, noise: jnp.ndarray
) -> jnp.ndarray:
    """Sample x_t ~ q(x_t | x_0) with per-sample timesteps ``t`` (B,)."""
    sab = _bcast(jnp.asarray(schedule.sqrt_alpha_bar)[t], x0.ndim)
    s1m = _bcast(jnp.asarray(schedule.sqrt_1m_alpha_bar)[t], x0.ndim)
    return sab * x0 + s1m * noise


def q_sample_step(
    schedule: NoiseSchedule, x0: jnp.ndarray, step, noise: jnp.ndarray
) -> jnp.ndarray:
    """q_sample at a single scalar step index (SDFSampler.q_sample, sampler_sdf.py:173-192)."""
    sab = jnp.asarray(schedule.sqrt_alpha_bar)[step]
    s1m = jnp.asarray(schedule.sqrt_1m_alpha_bar)[step]
    return sab * x0 + s1m * noise


def diffusion_loss(
    apply_fn: ApplyFn,
    params,
    schedule: NoiseSchedule,
    x0: jnp.ndarray,
    cond: jnp.ndarray,
    rng: jax.Array,
    cond_concat: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Simplified eps-MSE loss (latent_diffusion.py:203-240). x0 is NHWC."""
    t_key, eps_key = jax.random.split(rng)
    bsz = x0.shape[0]
    t = jax.random.randint(t_key, (bsz,), 0, schedule.n_steps)
    noise = jax.random.normal(eps_key, x0.shape, x0.dtype)
    xt = q_sample(schedule, x0, t, noise)
    if cond_concat is not None:
        xt = jnp.concatenate([xt, cond_concat.astype(xt.dtype)], axis=-1)
    eps_theta = apply_fn(params, xt, t, cond)
    return jnp.mean((noise - eps_theta.astype(noise.dtype)) ** 2)
