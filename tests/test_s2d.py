"""Exactness of the space-to-depth conv reformulations (ops/s2d.py).

Every transform must reproduce the plain NHWC conv bit-for-bit up to float
reassociation (the structured kernels add exact zeros, so fp32 tolerances are
tight).  These are the algebraic guarantees that let the UNet's level-0 run
in the lane-filling folded layout with no numerical drift.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from polyffusion_tpu.ops.s2d import (
    fold_channel_vec,
    from_s2d,
    s2d_entry_kernel,
    s2d_exit_stride2_kernel,
    s2d_kernel,
    to_s2d,
    unfold_channel_sums,
    upsample2x_s2d,
)


def _conv(x, w, strides=(1, 1), padding=((1, 1), (1, 1))):
    return jax.lax.conv_general_dilated(
        x, w, strides, padding, dimension_numbers=("NHWC", "HWIO", "NHWC")
    )


@pytest.fixture
def rng():
    return np.random.default_rng(0)


def test_s2d_roundtrip(rng):
    x = jnp.asarray(rng.standard_normal((2, 8, 16, 6)), jnp.float32)
    np.testing.assert_array_equal(from_s2d(to_s2d(x)), x)
    # and the fold really is the W-parity interleave
    xs = to_s2d(x)
    np.testing.assert_array_equal(xs[:, :, 3, :6], x[:, :, 6])
    np.testing.assert_array_equal(xs[:, :, 3, 6:], x[:, :, 7])


@pytest.mark.parametrize("ci,co", [(6, 4), (4, 4), (2, 6)])
def test_s2d_conv3x3_exact(rng, ci, co):
    x = jnp.asarray(rng.standard_normal((2, 8, 16, ci)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((3, 3, ci, co)), jnp.float32)
    want = _conv(x, w)
    got = from_s2d(_conv(to_s2d(x), s2d_kernel(w)))
    np.testing.assert_allclose(got, want, atol=1e-5, rtol=1e-5)


def test_s2d_conv1x1_exact(rng):
    x = jnp.asarray(rng.standard_normal((2, 8, 16, 6)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((1, 1, 6, 4)), jnp.float32)
    want = _conv(x, w, padding=((0, 0), (0, 0)))
    got = from_s2d(_conv(to_s2d(x), s2d_kernel(w), padding=((0, 0), (0, 0))))
    np.testing.assert_allclose(got, want, atol=1e-5, rtol=1e-5)


def test_s2d_entry_conv_exact(rng):
    """normal-layout input -> s2d output == to_s2d(plain conv)."""
    x = jnp.asarray(rng.standard_normal((2, 8, 16, 5)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((3, 3, 5, 4)), jnp.float32)
    want = to_s2d(_conv(x, w))
    got = _conv(x, s2d_entry_kernel(w), strides=(1, 2), padding=((1, 1), (1, 1)))
    np.testing.assert_allclose(got, want, atol=1e-5, rtol=1e-5)


def test_s2d_exit_stride2_conv_exact(rng):
    """s2d input -> stride-(2,2) normal output == plain stride-2 conv
    (the DownSample site)."""
    x = jnp.asarray(rng.standard_normal((2, 8, 16, 6)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((3, 3, 6, 7)), jnp.float32)
    want = _conv(x, w, strides=(2, 2))
    got = _conv(
        to_s2d(x), s2d_exit_stride2_kernel(w), strides=(2, 1),
        padding=((1, 1), (1, 0)),
    )
    np.testing.assert_allclose(got, want, atol=1e-5, rtol=1e-5)


def test_upsample2x_s2d_exact(rng):
    x = jnp.asarray(rng.standard_normal((2, 4, 8, 6)), jnp.float32)
    b, h, w, c = x.shape
    up = jnp.broadcast_to(x[:, :, None, :, None, :], (b, h, 2, w, 2, c))
    want = to_s2d(up.reshape(b, 2 * h, 2 * w, c))
    got = upsample2x_s2d(to_s2d(x))
    np.testing.assert_array_equal(got, want)


def test_channel_vec_fold_consistency(rng):
    """Per-channel affine applied in s2d == applied in normal layout; channel
    sums folded back match normal-layout sums (the GroupNorm contract)."""
    x = jnp.asarray(rng.standard_normal((2, 8, 16, 6)), jnp.float32)
    a = jnp.asarray(rng.standard_normal((6,)), jnp.float32)
    want = x * a
    got = from_s2d(to_s2d(x) * fold_channel_vec(a))
    np.testing.assert_array_equal(got, want)

    sums = to_s2d(x).sum(axis=(1, 2))
    np.testing.assert_allclose(
        unfold_channel_sums(sums), x.sum(axis=(1, 2)), atol=1e-4
    )
