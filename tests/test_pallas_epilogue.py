"""Pallas fused RePaint epilogue: kernel equivalence (interpret mode on CPU) and
full-sampler integration under POLYFF_PALLAS_EPILOGUE=1."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from polyffusion_tpu.ops.pallas_sampler import (
    fused_repaint_epilogue,
    repaint_epilogue_reference,
)


def test_kernel_matches_reference_composition(rng):
    shape = (2, 16, 16, 2)
    args = [
        jnp.asarray(rng.standard_normal(shape).astype(np.float32)) for _ in range(5)
    ]
    mask = jnp.asarray((rng.random(shape) < 0.5).astype(np.float32))
    scalars = jnp.asarray(rng.standard_normal(7).astype(np.float32))
    got = fused_repaint_epilogue(*args, mask, scalars, interpret=True)
    want = repaint_epilogue_reference(*args, mask, scalars)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-6)


def test_sampler_with_pallas_epilogue_matches(monkeypatch, rng):
    """ddpm_paint with the fused epilogue equals the default path exactly."""
    from polyffusion_tpu.diffusion import make_schedule
    from polyffusion_tpu.diffusion import sampler as S
    from polyffusion_tpu.models.unet import UNetModel

    jm = UNetModel(
        channels=32, n_res_blocks=1, attention_levels=(), channel_multipliers=(1, 2),
        n_heads=2, d_cond=12,
    )
    params = jm.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 16, 16, 2)),
        jnp.zeros((1,), jnp.int32), jnp.zeros((1, 1, 12)),
    )["params"]
    apply_fn = lambda p, x, t, c: jm.apply({"params": p}, x, t, c)  # noqa: E731

    sch = make_schedule(10)
    shape = (1, 16, 16, 2)
    x = jnp.asarray(rng.standard_normal(shape).astype(np.float32))
    cond = jnp.asarray(rng.standard_normal((1, 1, 12)).astype(np.float32))
    orig = jnp.asarray(rng.standard_normal(shape).astype(np.float32))
    mask = jnp.zeros(shape).at[:, :, :8].set(1.0)
    noise = jnp.asarray(rng.standard_normal((10, 2, 3, *shape)).astype(np.float32))

    kwargs = dict(
        orig=orig, mask=mask, uncond_scale=1.0, repaint_n=2, noise_override=noise
    )
    import polyffusion_tpu.ops.pallas_sampler as PS

    PS.pallas_epilogue_enabled.cache_clear()
    monkeypatch.delenv("POLYFF_PALLAS_EPILOGUE", raising=False)
    base = S.ddpm_paint(apply_fn, params, sch, x, cond, 9, jax.random.PRNGKey(0), **kwargs)

    PS.pallas_epilogue_enabled.cache_clear()
    monkeypatch.setenv("POLYFF_PALLAS_EPILOGUE", "1")
    fused = S.ddpm_paint(apply_fn, params, sch, x, cond, 9, jax.random.PRNGKey(0), **kwargs)
    PS.pallas_epilogue_enabled.cache_clear()

    np.testing.assert_allclose(np.asarray(fused), np.asarray(base), atol=1e-5)
