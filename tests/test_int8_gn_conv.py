"""int8 quantized fused GN+SiLU+conv kernel: exact-arithmetic emulation parity,
accuracy vs the fp32 reference, and whole-UNet behavior under POLYFF_INT8_CONV."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from polyffusion_tpu.ops.fused_gn_conv import (
    _reference,
    _reference2,
    _reference_q,
    gn_silu_conv3x3_q,
    gn_silu_conv3x3_concat_q,
    quantize_conv_kernel,
)

pytestmark = pytest.mark.slow  # full-UNet/e2e XLA compiles: skip with -m 'not slow'


def _rand(shape, rng, dtype=np.float32):
    return jnp.asarray(rng.standard_normal(shape).astype(np.float32), dtype)


def test_quantize_conv_kernel_roundtrip():
    rng = np.random.default_rng(0)
    w = _rand((3, 3, 64, 64), rng) * 0.07
    q, scale = quantize_conv_kernel(w)
    assert q.dtype == jnp.int8 and scale.shape == (64,)
    deq = np.asarray(q, np.float32) * np.asarray(scale)[None, None, None, :]
    err = np.abs(deq - np.asarray(w))
    # symmetric 127-level quantization: error bounded by scale/2 per channel
    assert (err <= np.asarray(scale)[None, None, None, :] * 0.5 + 1e-7).all()


@pytest.mark.parametrize("b,h,w,c,o", [(2, 16, 16, 64, 64), (1, 8, 16, 128, 64)])
def test_matches_int8_emulation(b, h, w, c, o):
    """Kernel arithmetic == the XLA int8 emulation (same quantization points)."""
    rng = np.random.default_rng(1)
    x = _rand((b, h, w, c), rng)
    a = _rand((b, c), rng) * 0.5
    off = _rand((b, c), rng) * 0.1
    wk = _rand((3, 3, c, o), rng) * (c * 9) ** -0.5
    bias = _rand((o,), rng) * 0.1
    w_q, w_scale = quantize_conv_kernel(wk)

    got = gn_silu_conv3x3_q(x, a, off, w_q, w_scale, bias, interpret=True)
    want = _reference_q(x, a, off, w_q, w_scale, bias, None)
    # int32 vs fp32 accumulation reassociation only: products are exact ints
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-3, rtol=1e-5)


def test_int8_close_to_fp32_reference():
    """Quantization error vs the unquantized op stays small relative to scale."""
    rng = np.random.default_rng(2)
    b, h, w, c, o = 2, 16, 16, 64, 64
    x = _rand((b, h, w, c), rng)
    a = _rand((b, c), rng) * 0.5
    off = _rand((b, c), rng) * 0.1
    wk = _rand((3, 3, c, o), rng) * (c * 9) ** -0.5
    bias = _rand((o,), rng) * 0.1
    res = _rand((b, h, w, o), rng)
    w_q, w_scale = quantize_conv_kernel(wk)

    got = np.asarray(gn_silu_conv3x3_q(x, a, off, w_q, w_scale, bias, res, interpret=True))
    want = np.asarray(_reference(x, a, off, wk, bias, res))
    rel = np.abs(got - want).mean() / (np.abs(want).mean() + 1e-9)
    assert rel < 0.02, rel  # ~1e-3 typical for 7-bit symmetric quantization


def test_concat_variant_matches_emulation():
    rng = np.random.default_rng(3)
    b, h, w, c1, c2, o = 2, 8, 8, 64, 64, 64
    x, x2 = _rand((b, h, w, c1), rng), _rand((b, h, w, c2), rng)
    a, off = _rand((b, c1), rng), _rand((b, c1), rng) * 0.2
    a2, off2 = _rand((b, c2), rng), _rand((b, c2), rng) * 0.2
    wk = _rand((3, 3, c1 + c2, o), rng) * 0.03
    bias = _rand((o,), rng)
    w_q, w_scale = quantize_conv_kernel(wk)

    got = gn_silu_conv3x3_concat_q(
        x, a, off, x2, a2, off2, w_q, w_scale, bias, interpret=True
    )
    want = _reference_q(x, a, off, w_q, w_scale, bias, None, x2, a2, off2)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-3, rtol=1e-5)
    # and close to the unquantized math
    base = _reference2(x, a, off, x2, a2, off2, wk, bias, None)
    rel = np.abs(np.asarray(got) - np.asarray(base)).mean() / (
        np.abs(np.asarray(base)).mean() + 1e-9
    )
    assert rel < 0.02, rel


def test_bf16_storage_path():
    """bf16 activations (the sampling configuration): quantize from bf16 storage."""
    rng = np.random.default_rng(4)
    b, h, w, c, o = 2, 16, 16, 64, 64
    x = _rand((b, h, w, c), rng, jnp.bfloat16)
    a = _rand((b, c), rng)
    off = _rand((b, c), rng) * 0.2
    wk = _rand((3, 3, c, o), rng, jnp.bfloat16) * 0.1
    bias = _rand((o,), rng)
    w_q, w_scale = quantize_conv_kernel(wk)
    got = gn_silu_conv3x3_q(x, a, off, w_q, w_scale, bias, interpret=True)
    assert got.dtype == jnp.bfloat16
    want = _reference_q(x, a, off, w_q, w_scale, bias, None)
    err = np.abs(np.asarray(got, np.float32) - np.asarray(want, np.float32))
    assert err.max() < 0.2, err.max()  # bf16 output rounding on top of int8


def test_xla_int8_conv_close_to_float():
    from polyffusion_tpu.ops.quant import int8_conv

    rng = np.random.default_rng(7)
    y = jnp.asarray(np.abs(rng.standard_normal((2, 16, 16, 64))).astype(np.float32))
    wk = _rand((3, 3, 64, 64), rng) * 0.06
    bias = _rand((64,), rng) * 0.1
    got = np.asarray(int8_conv(y, wk, bias))
    want = np.asarray(
        jax.lax.conv_general_dilated(
            y, wk, (1, 1), ((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        + bias
    )
    rel = np.abs(got - want).mean() / (np.abs(want).mean() + 1e-9)
    assert rel < 0.02, rel


def test_unet_int8_xla_eps_error_bounded(monkeypatch):
    """Whole tiny UNet under POLYFF_INT8_XLA (the non-Pallas int8 route)."""
    from polyffusion_tpu.models.unet import UNetModel

    kw = dict(in_channels=2, out_channels=2, channels=32, n_res_blocks=1,
              attention_levels=(1,), channel_multipliers=(1, 2), n_heads=2,
              tf_layers=1, d_cond=12)
    m = UNetModel(**kw)
    rng = np.random.default_rng(8)
    x = jnp.asarray(rng.standard_normal((2, 16, 16, 2)), jnp.float32)
    t = jnp.asarray(np.array([3, 40], np.int32))
    cond = jnp.asarray(rng.standard_normal((2, 3, 12)), jnp.float32)

    monkeypatch.delenv("POLYFF_INT8_XLA", raising=False)
    monkeypatch.delenv("POLYFF_INT8_CONV", raising=False)
    monkeypatch.setenv("POLYFF_FUSED_GN_CONV", "0")
    params = m.init(jax.random.PRNGKey(0), x, t, cond)["params"]
    base = np.asarray(m.apply({"params": params}, x, t, cond))

    monkeypatch.setenv("POLYFF_INT8_XLA", "1")
    q = np.asarray(m.apply({"params": params}, x, t, cond))
    rel = np.abs(q - base).mean() / (np.abs(base).mean() + 1e-9)
    assert rel < 0.05, rel
    params2 = m.init(jax.random.PRNGKey(0), x, t, cond)["params"]
    assert jax.tree_util.tree_structure(params) == jax.tree_util.tree_structure(params2)


def test_xla_int8_conv_grad_raises():
    """Training with POLYFF_INT8_XLA leaked must fail loudly, not learn nothing."""
    from polyffusion_tpu.ops.quant import int8_conv

    rng = np.random.default_rng(9)
    y = _rand((1, 8, 8, 32), rng)
    wk = _rand((3, 3, 32, 32), rng) * 0.06
    with pytest.raises(NotImplementedError, match="sampling-only"):
        jax.grad(lambda w: jnp.sum(int8_conv(y, w)))(wk)


def test_unet_int8_eps_error_bounded(monkeypatch):
    """Whole tiny UNet under POLYFF_INT8_CONV: eps stays within a small relative
    error of the fp32 path (ResBlock convs quantized, attention/head bf16-free)."""
    from polyffusion_tpu.models.unet import UNetModel

    kw = dict(in_channels=2, out_channels=2, channels=32, n_res_blocks=1,
              attention_levels=(1,), channel_multipliers=(1, 2), n_heads=2,
              tf_layers=1, d_cond=12)
    m = UNetModel(**kw)
    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.standard_normal((2, 16, 16, 2)), jnp.float32)
    t = jnp.asarray(np.array([3, 40], np.int32))
    cond = jnp.asarray(rng.standard_normal((2, 3, 12)), jnp.float32)

    monkeypatch.delenv("POLYFF_INT8_CONV", raising=False)
    monkeypatch.setenv("POLYFF_FUSED_GN_CONV", "0")
    params = m.init(jax.random.PRNGKey(0), x, t, cond)["params"]
    base = np.asarray(m.apply({"params": params}, x, t, cond))

    monkeypatch.setenv("POLYFF_INT8_CONV", "1")
    q = np.asarray(m.apply({"params": params}, x, t, cond))
    rel = np.abs(q - base).mean() / (np.abs(base).mean() + 1e-9)
    assert rel < 0.05, rel

    # param structure identical (converters/checkpoints unaffected)
    params2 = m.init(jax.random.PRNGKey(0), x, t, cond)["params"]
    assert jax.tree_util.tree_structure(params) == jax.tree_util.tree_structure(params2)
