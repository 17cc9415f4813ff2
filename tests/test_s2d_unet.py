"""Whole-UNet exactness of the folded (space-to-depth) level-0 path.

POLYFF_S2D=1 reroutes every level-0 conv/GN through the folded layout
(ops/s2d.py, models/unet.py S2d* modules).  The reformulation is algebraic:
applied to the SAME parameter tree it must reproduce the normal path up to
float reassociation.  These tests pin that end-to-end, plus the param-tree
invariance that keeps checkpoints/converters oblivious to the knob.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from polyffusion_tpu.models.unet import UNetModel

pytestmark = pytest.mark.slow  # full-UNet/e2e XLA compiles: skip with -m 'not slow'


def _small_unet():
    return UNetModel(
        in_channels=2,
        out_channels=2,
        channels=32,
        n_res_blocks=1,
        attention_levels=(2, 3),
        channel_multipliers=(1, 2, 4, 4),
        n_heads=4,
        tf_layers=1,
        d_cond=16,
    )


@pytest.fixture
def unet_setup():
    model = _small_unet()
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((2, 32, 32, 2)), jnp.float32)
    t = jnp.asarray([3, 500])
    cond = jnp.asarray(rng.standard_normal((2, 1, 16)), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), x, t, cond)["params"]
    return model, params, x, t, cond


def test_s2d_unet_forward_exact(unet_setup, monkeypatch):
    model, params, x, t, cond = unet_setup
    monkeypatch.delenv("POLYFF_S2D", raising=False)
    want = model.apply({"params": params}, x, t, cond)
    monkeypatch.setenv("POLYFF_S2D", "1")
    got = model.apply({"params": params}, x, t, cond)
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=2e-4, rtol=1e-4)


def test_s2d_param_tree_identical(monkeypatch):
    """Init under POLYFF_S2D=1 yields the exact same tree (names, shapes,
    dtypes) as the normal path — checkpoints and converters are untouched."""
    model = _small_unet()
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((1, 32, 32, 2)), jnp.float32)
    t = jnp.asarray([7])
    cond = jnp.asarray(rng.standard_normal((1, 1, 16)), jnp.float32)

    monkeypatch.delenv("POLYFF_S2D", raising=False)
    p0 = model.init(jax.random.PRNGKey(0), x, t, cond)["params"]
    monkeypatch.setenv("POLYFF_S2D", "1")
    p1 = model.init(jax.random.PRNGKey(0), x, t, cond)["params"]

    s0 = jax.tree.map(lambda a: (a.shape, a.dtype), p0)
    s1 = jax.tree.map(lambda a: (a.shape, a.dtype), p1)
    assert jax.tree.structure(s0) == jax.tree.structure(s1)
    assert jax.tree.all(jax.tree.map(lambda a, b: a == b, s0, s1))


def test_s2d_flagship_shape_compiles(monkeypatch):
    """The real sdf_chd8bar topology (4 levels, attention [2,3], channels 64)
    traces under POLYFF_S2D=1 with the right output shape (eval_shape only —
    no full-size CPU forward)."""
    from polyffusion_tpu.config import load_params

    cfg = load_params("sdf_chd8bar")
    model = UNetModel(
        in_channels=cfg.in_channels,
        out_channels=cfg.out_channels,
        channels=cfg.channels,
        n_res_blocks=cfg.n_res_blocks,
        attention_levels=tuple(cfg.attention_levels),
        channel_multipliers=tuple(cfg.channel_multipliers),
        n_heads=cfg.n_heads,
        tf_layers=cfg.tf_layers,
        d_cond=cfg.d_cond,
    )
    monkeypatch.setenv("POLYFF_S2D", "1")
    x = jax.ShapeDtypeStruct((2, 128, 128, 2), jnp.float32)
    t = jax.ShapeDtypeStruct((2,), jnp.int32)
    cond = jax.ShapeDtypeStruct((2, 1, cfg.d_cond), jnp.float32)
    var_shapes = jax.eval_shape(
        lambda xx, tt, cc: model.init(jax.random.PRNGKey(0), xx, tt, cc), x, t, cond
    )
    out = jax.eval_shape(
        lambda v, xx, tt, cc: model.apply(v, xx, tt, cc), var_shapes, x, t, cond
    )
    assert out.shape == (2, 128, 128, 2)

    monkeypatch.delenv("POLYFF_S2D")
    var_plain = jax.eval_shape(
        lambda xx, tt, cc: model.init(jax.random.PRNGKey(0), xx, tt, cc), x, t, cond
    )
    sf = jax.tree.map(lambda a: a.shape, var_shapes)
    sp = jax.tree.map(lambda a: a.shape, var_plain)
    assert jax.tree.structure(sf) == jax.tree.structure(sp)
    assert jax.tree.all(jax.tree.map(lambda a, b: a == b, sf, sp))
