"""Parity of the Pallas GroupNorm backward vs autodiff of the same primal."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from polyffusion_tpu.ops.gn_bwd import (
    _gn_primal,
    _gna_bwd,
    gn_bwd_pallas,
    group_norm_affine,
)

pytestmark = pytest.mark.slow  # full-UNet/e2e XLA compiles: skip with -m 'not slow'


def _autodiff_grads(x, scale, bias, num_groups, eps, co):
    def loss(x, scale, bias):
        y, _, _ = _gn_primal(x, scale, bias, num_groups, eps)
        return jnp.sum(co * y.astype(jnp.float32))

    return jax.grad(loss, argnums=(0, 1, 2))(x, scale, bias)


@pytest.mark.parametrize("b,h,w,c,g", [(2, 16, 16, 64, 32), (1, 8, 8, 128, 32)])
def test_pallas_gn_bwd_matches_autodiff_fp32(b, h, w, c, g):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((b, h, w, c)) * 2 + 0.5, jnp.float32)
    scale = jnp.asarray(rng.standard_normal(c) * 0.5 + 1.0, jnp.float32)
    bias = jnp.asarray(rng.standard_normal(c) * 0.1, jnp.float32)
    co = jnp.asarray(rng.standard_normal((b, h, w, c)), jnp.float32)
    eps = 1e-5

    gx, gs, gb = _autodiff_grads(x, scale, bias, g, eps, co)

    _, mean_c, inv_c = _gn_primal(x, scale, bias, g, eps)
    dx, dgb, dbb = gn_bwd_pallas(
        x, co, mean_c, inv_c, scale.astype(jnp.float32), g, interpret=True
    )
    np.testing.assert_allclose(np.asarray(dx), np.asarray(gx), atol=2e-4, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(dgb.sum(0)), np.asarray(gs), atol=2e-3, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(dbb.sum(0)), np.asarray(gb), atol=2e-3, rtol=1e-4)


def test_xla_fallback_bwd_matches_autodiff():
    rng = np.random.default_rng(1)
    b, h, w, c, g = 2, 16, 16, 64, 32
    x = jnp.asarray(rng.standard_normal((b, h, w, c)), jnp.float32)
    scale = jnp.asarray(rng.standard_normal(c) * 0.5 + 1.0, jnp.float32)
    bias = jnp.asarray(rng.standard_normal(c) * 0.1, jnp.float32)
    co = jnp.asarray(rng.standard_normal((b, h, w, c)), jnp.float32)
    eps = 1e-5

    gx, gs, gb = _autodiff_grads(x, scale, bias, g, eps, co)
    _, mean_c, inv_c = _gn_primal(x, scale, bias, g, eps)
    dx, dgamma, dbeta = _gna_bwd(g, eps, (x, scale, mean_c, inv_c), co)
    np.testing.assert_allclose(np.asarray(dx), np.asarray(gx), atol=2e-4, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(dgamma), np.asarray(gs), atol=2e-3, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(dbeta), np.asarray(gb), atol=2e-3, rtol=1e-4)


def test_group_norm_affine_primal_and_grad_cpu():
    """On CPU the custom-VJP op must route to the XLA fallback and still match
    end-to-end autodiff through the inline formulation."""
    rng = np.random.default_rng(2)
    b, h, w, c, g = 2, 8, 8, 64, 32
    x = jnp.asarray(rng.standard_normal((b, h, w, c)), jnp.float32)
    scale = jnp.asarray(rng.standard_normal(c) * 0.5 + 1.0, jnp.float32)
    bias = jnp.asarray(rng.standard_normal(c) * 0.1, jnp.float32)
    eps = 1e-5

    y = group_norm_affine(x, scale, bias, g, eps)
    y_ref, _, _ = _gn_primal(x, scale, bias, g, eps)
    np.testing.assert_array_equal(np.asarray(y), np.asarray(y_ref))

    def loss_op(x, scale, bias):
        return jnp.sum(group_norm_affine(x, scale, bias, g, eps) ** 2)

    def loss_ref(x, scale, bias):
        y, _, _ = _gn_primal(x, scale, bias, g, eps)
        return jnp.sum(y**2)

    got = jax.grad(loss_op, argnums=(0, 1, 2))(x, scale, bias)
    want = jax.grad(loss_ref, argnums=(0, 1, 2))(x, scale, bias)
    for a, b_ in zip(got, want):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), atol=2e-3, rtol=1e-4)


def test_pallas_gn_bwd_bf16_close():
    rng = np.random.default_rng(3)
    b, h, w, c, g = 2, 16, 16, 64, 32
    x32 = rng.standard_normal((b, h, w, c)).astype(np.float32)
    co32 = rng.standard_normal((b, h, w, c)).astype(np.float32)
    scale = jnp.asarray(rng.standard_normal(c) * 0.5 + 1.0, jnp.float32)
    bias = jnp.asarray(rng.standard_normal(c) * 0.1, jnp.float32)
    eps = 1e-5

    gx, gs, gb = _autodiff_grads(
        jnp.asarray(x32), scale, bias, g, eps, jnp.asarray(co32)
    )
    xb = jnp.asarray(x32, jnp.bfloat16)
    _, mean_c, inv_c = _gn_primal(xb, scale, bias, g, eps)
    dx, dgb, dbb = gn_bwd_pallas(
        xb, jnp.asarray(co32, jnp.bfloat16), mean_c, inv_c,
        scale.astype(jnp.float32), g, interpret=True,
    )
    err = np.abs(np.asarray(dx, np.float32) - np.asarray(gx))
    assert err.max() < 0.05, err.max()
    np.testing.assert_allclose(np.asarray(dgb.sum(0)), np.asarray(gs), atol=0.5, rtol=0.02)
