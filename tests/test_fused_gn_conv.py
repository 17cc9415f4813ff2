"""Parity + differentiability of the fused GN-affine+SiLU+conv3x3 kernel."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from polyffusion_tpu.ops.fused_gn_conv import _reference, gn_silu_conv3x3

pytestmark = pytest.mark.slow  # full-UNet/e2e XLA compiles: skip with -m 'not slow'


def _rand(shape, rng, dtype=np.float32):
    return jnp.asarray(rng.standard_normal(shape).astype(np.float32), dtype)


@pytest.mark.parametrize(
    "b,h,w,c,o", [(2, 16, 16, 64, 64), (2, 8, 8, 128, 64), (1, 8, 16, 64, 128)]
)
def test_matches_xla_reference_fp32(b, h, w, c, o):
    rng = np.random.default_rng(0)
    x = _rand((b, h, w, c), rng)
    a = _rand((b, c), rng) * 0.5
    off = _rand((b, c), rng) * 0.1
    wk = _rand((3, 3, c, o), rng) * (c * 9) ** -0.5
    bias = _rand((o,), rng) * 0.1

    got = gn_silu_conv3x3(x, a, off, wk, bias, interpret=True)
    want = _reference(x, a, off, wk, bias, None)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-4)


def test_residual_fold():
    rng = np.random.default_rng(1)
    b, h, w, c, o = 2, 8, 8, 64, 64
    x = _rand((b, h, w, c), rng)
    a = _rand((b, c), rng)
    off = _rand((b, c), rng)
    wk = _rand((3, 3, c, o), rng) * 0.05
    bias = _rand((o,), rng)
    res = _rand((b, h, w, o), rng)
    got = gn_silu_conv3x3(x, a, off, wk, bias, res, interpret=True)
    want = _reference(x, a, off, wk, bias, res)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-4)


def test_bf16_path():
    rng = np.random.default_rng(2)
    b, h, w, c, o = 2, 16, 16, 64, 64
    x = _rand((b, h, w, c), rng, jnp.bfloat16)
    a = _rand((b, c), rng)
    off = _rand((b, c), rng)
    wk = _rand((3, 3, c, o), rng, jnp.bfloat16) * 0.1
    bias = _rand((o,), rng)
    got = gn_silu_conv3x3(x, a, off, wk, bias, interpret=True)
    want = _reference(x, a, off, wk, bias, None)
    assert got.dtype == jnp.bfloat16
    err = np.abs(np.asarray(got, np.float32) - np.asarray(want, np.float32))
    assert err.max() < 0.15, err.max()


def test_differentiable_matches_reference_grads():
    rng = np.random.default_rng(3)
    b, h, w, c, o = 1, 8, 8, 64, 64
    x = _rand((b, h, w, c), rng)
    a = _rand((b, c), rng)
    off = _rand((b, c), rng)
    wk = _rand((3, 3, c, o), rng) * 0.05
    bias = _rand((o,), rng)

    def loss_fused(x, a, off, wk, bias):
        return jnp.sum(gn_silu_conv3x3(x, a, off, wk, bias, interpret=True) ** 2)

    def loss_ref(x, a, off, wk, bias):
        return jnp.sum(_reference(x, a, off, wk, bias, None) ** 2)

    gf = jax.grad(loss_fused, argnums=(0, 1, 2, 3, 4))(x, a, off, wk, bias)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2, 3, 4))(x, a, off, wk, bias)
    for i, (af, ar) in enumerate(zip(gf, gr)):
        np.testing.assert_allclose(np.asarray(af), np.asarray(ar), atol=5e-4, err_msg=str(i))


def test_unet_parity_with_fused_gn_conv(monkeypatch):
    """Whole tiny UNet: fused-kernel path vs standard path, same params."""
    from polyffusion_tpu.models.unet import UNetModel

    kw = dict(in_channels=2, out_channels=2, channels=32, n_res_blocks=1,
              attention_levels=(1,), channel_multipliers=(1, 2), n_heads=2,
              tf_layers=1, d_cond=12)
    m = UNetModel(**kw)
    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.standard_normal((2, 16, 16, 2)), jnp.float32)
    t = jnp.asarray(np.array([3, 40], np.int32))
    cond = jnp.asarray(rng.standard_normal((2, 3, 12)), jnp.float32)

    monkeypatch.setenv("POLYFF_FUSED_GN_CONV", "0")
    params = m.init(jax.random.PRNGKey(0), x, t, cond)["params"]
    base = m.apply({"params": params}, x, t, cond)

    monkeypatch.setenv("POLYFF_FUSED_GN_CONV", "1")
    fused = m.apply({"params": params}, x, t, cond)
    np.testing.assert_allclose(np.asarray(fused), np.asarray(base), atol=5e-4)

    # param structure identical under both flags (converters unaffected)
    params2 = m.init(jax.random.PRNGKey(0), x, t, cond)["params"]
    assert jax.tree_util.tree_structure(params) == jax.tree_util.tree_structure(params2)


def test_concat_variant_matches_reference():
    from polyffusion_tpu.ops.fused_gn_conv import (
        _reference2,
        gn_silu_conv3x3_concat,
    )

    rng = np.random.default_rng(6)
    b, h, w, c1, c2, o = 2, 8, 8, 64, 64, 64
    x = _rand((b, h, w, c1), rng)
    x2 = _rand((b, h, w, c2), rng)
    a, off = _rand((b, c1), rng), _rand((b, c1), rng) * 0.2
    a2, off2 = _rand((b, c2), rng), _rand((b, c2), rng) * 0.2
    wk = _rand((3, 3, c1 + c2, o), rng) * 0.05
    bias = _rand((o,), rng)
    got = gn_silu_conv3x3_concat(x, a, off, x2, a2, off2, wk, bias, interpret=True)
    want = _reference2(x, a, off, x2, a2, off2, wk, bias, None)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-4)

    g = jax.grad(
        lambda x2: jnp.sum(
            gn_silu_conv3x3_concat(x, a, off, x2, a2, off2, wk, bias, interpret=True) ** 2
        )
    )(x2)
    gr = jax.grad(
        lambda x2: jnp.sum(_reference2(x, a, off, x2, a2, off2, wk, bias, None) ** 2)
    )(x2)
    np.testing.assert_allclose(np.asarray(g), np.asarray(gr), atol=5e-4)
