"""Parity of the fused whole-sequence self-attention kernel vs the einsum path.

The kernel only auto-dispatches on TPU; here it runs in Pallas interpret mode on
the CPU mesh and is pinned against the fp32 einsum reference.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from polyffusion_tpu.ops.attention import _einsum_attention
from polyffusion_tpu.ops.fused_attention import fused_self_attention

pytestmark = pytest.mark.slow  # full-UNet/e2e XLA compiles: skip with -m 'not slow'


@pytest.mark.parametrize("t,d,bh", [(256, 64, 8), (1024, 64, 4), (128, 128, 6)])
def test_fused_matches_einsum_fp32(t, d, bh):
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.standard_normal((bh, t, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((bh, t, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((bh, t, d)), jnp.float32)
    scale = d**-0.5

    out = fused_self_attention(q, k, v, scale, interpret=True)

    # einsum reference wants (B, T, H, D); use H=1 per bh row
    ref = _einsum_attention(
        q[:, :, None, :], k[:, :, None, :], v[:, :, None, :], scale, jnp.float32
    )[:, :, 0, :]
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_fused_bf16_close_to_fp32_reference():
    rng = np.random.default_rng(1)
    t, d, bh = 256, 64, 4
    q32 = rng.standard_normal((bh, t, d)).astype(np.float32)
    k32 = rng.standard_normal((bh, t, d)).astype(np.float32)
    v32 = rng.standard_normal((bh, t, d)).astype(np.float32)
    scale = d**-0.5

    out = fused_self_attention(
        jnp.asarray(q32, jnp.bfloat16),
        jnp.asarray(k32, jnp.bfloat16),
        jnp.asarray(v32, jnp.bfloat16),
        scale,
        interpret=True,
    )
    ref = _einsum_attention(
        jnp.asarray(q32)[:, :, None, :],
        jnp.asarray(k32)[:, :, None, :],
        jnp.asarray(v32)[:, :, None, :],
        scale,
        jnp.float32,
    )[:, :, 0, :]
    # bf16 inputs, fp32 softmax: row-level agreement within bf16 resolution
    err = np.abs(np.asarray(out, np.float32) - np.asarray(ref))
    assert err.max() < 0.05, err.max()


def test_block_auto_sizing_covers_odd_bh():
    rng = np.random.default_rng(2)
    t, d, bh = 256, 64, 7  # prime-ish BH must still partition the grid
    q = jnp.asarray(rng.standard_normal((bh, t, d)), jnp.float32)
    out = fused_self_attention(q, q, q, d**-0.5, interpret=True)
    assert out.shape == (bh, t, d)
    assert np.isfinite(np.asarray(out)).all()


def test_fused_attention_is_differentiable():
    """Training path: custom VJP recomputes through the einsum reference."""
    rng = np.random.default_rng(3)
    t, d, bh = 128, 64, 4
    q = jnp.asarray(rng.standard_normal((bh, t, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((bh, t, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((bh, t, d)), jnp.float32)
    scale = d**-0.5

    def loss_fused(q, k, v):
        return jnp.sum(fused_self_attention(q, k, v, scale, interpret=True) ** 2)

    from polyffusion_tpu.ops.fused_attention import _einsum_reference

    def loss_ref(q, k, v):
        return jnp.sum(_einsum_reference(q, k, v, scale) ** 2)

    g_fused = jax.grad(loss_fused, argnums=(0, 1, 2))(q, k, v)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g_fused, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-4)


def test_packed_kernel_matches_reference():
    from polyffusion_tpu.ops.fused_attention import (
        _einsum_reference_packed,
        fused_self_attention_packed,
    )

    rng = np.random.default_rng(4)
    b, t, nh, d = 3, 256, 4, 64
    q = jnp.asarray(rng.standard_normal((b, t, nh * d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, t, nh * d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, t, nh * d)), jnp.float32)
    scale = d**-0.5
    got = fused_self_attention_packed(q, k, v, scale, nh, interpret=True)
    want = _einsum_reference_packed(q, k, v, scale, nh)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)

    g = jax.grad(
        lambda q: jnp.sum(
            fused_self_attention_packed(q, k, v, scale, nh, interpret=True) ** 2
        )
    )(q)
    gr = jax.grad(
        lambda q: jnp.sum(_einsum_reference_packed(q, k, v, scale, nh) ** 2)
    )(q)
    np.testing.assert_allclose(np.asarray(g), np.asarray(gr), atol=2e-4)


@pytest.mark.parametrize("b,t,nh,d", [(2, 256, 4, 64), (1, 1024, 4, 64)])
def test_packed_pallas_backward_full_grads_fp32(b, t, nh, d):
    """The flash-style Pallas backward must match the einsum VJP for q, k, AND v."""
    from polyffusion_tpu.ops.fused_attention import (
        _einsum_reference_packed,
        fused_self_attention_packed,
    )

    rng = np.random.default_rng(5)
    q = jnp.asarray(rng.standard_normal((b, t, nh * d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, t, nh * d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, t, nh * d)), jnp.float32)
    co = jnp.asarray(rng.standard_normal((b, t, nh * d)), jnp.float32)
    scale = d**-0.5

    def loss_fused(q, k, v):
        return jnp.sum(co * fused_self_attention_packed(q, k, v, scale, nh, interpret=True))

    def loss_ref(q, k, v):
        return jnp.sum(co * _einsum_reference_packed(q, k, v, scale, nh))

    gf = jax.grad(loss_fused, argnums=(0, 1, 2))(q, k, v)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for name, a, b_ in zip("qkv", gf, gr):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b_), atol=5e-4, err_msg=f"d{name}"
        )


def test_packed_pallas_backward_bf16_close():
    """bf16 training path: kernel grads within bf16 resolution of the fp32 VJP."""
    from polyffusion_tpu.ops.fused_attention import (
        _einsum_reference_packed,
        fused_self_attention_packed,
    )

    rng = np.random.default_rng(6)
    b, t, nh, d = 2, 256, 4, 64
    q32 = rng.standard_normal((b, t, nh * d)).astype(np.float32)
    k32 = rng.standard_normal((b, t, nh * d)).astype(np.float32)
    v32 = rng.standard_normal((b, t, nh * d)).astype(np.float32)
    scale = d**-0.5

    gf = jax.grad(
        lambda q, k, v: jnp.sum(
            fused_self_attention_packed(q, k, v, scale, nh, interpret=True)
            .astype(jnp.float32) ** 2
        ),
        argnums=(0, 1, 2),
    )(
        jnp.asarray(q32, jnp.bfloat16),
        jnp.asarray(k32, jnp.bfloat16),
        jnp.asarray(v32, jnp.bfloat16),
    )
    gr = jax.grad(
        lambda q, k, v: jnp.sum(
            _einsum_reference_packed(q, k, v, scale, nh).astype(jnp.float32) ** 2
        ),
        argnums=(0, 1, 2),
    )(jnp.asarray(q32), jnp.asarray(k32), jnp.asarray(v32))
    for name, a, b_ in zip("qkv", gf, gr):
        err = np.abs(np.asarray(a, np.float32) - np.asarray(b_))
        denom = max(1.0, np.abs(np.asarray(b_)).max())
        assert err.max() / denom < 0.06, (name, err.max(), denom)
