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
