"""Abstract shape/dtype checks across ALL shipped presets (SURVEY §4(c)):
jax.eval_shape traces init + loss without running any compute."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from polyffusion_tpu.config import available_presets, load_params
from polyffusion_tpu.main import build_task


def abstract_batch(b=2):
    return (
        jax.ShapeDtypeStruct((b, 2, 128, 128), jnp.float32),
        jax.ShapeDtypeStruct((b, 128, 20, 6), jnp.int64),
        jax.ShapeDtypeStruct((b, 32, 36), jnp.float32),
        jax.ShapeDtypeStruct((b, 128, 128), jnp.float32),
    )


def random_encoders(cfg):
    """Random-init the frozen encoders a preset would load from pretrained files."""
    from polyffusion_tpu.models.encoders import (
        ChordEncoder,
        PianoTreeEncoder,
        TextureEncoder,
    )
    from polyffusion_tpu.parallel.mesh import init_on_cpu

    kwargs = {}
    cond_type = cfg.get("cond_type", "chord")
    if "chord" in cond_type and cfg.get("use_enc", False):
        enc = ChordEncoder(hidden_dim=cfg["chd_hidden_dim"], z_dim=cfg["chd_z_dim"])
        kwargs["chord_enc"] = enc
        kwargs["chord_enc_params"] = init_on_cpu(
            lambda r: enc.init(r, jnp.zeros((1, 32, 36)))["params"], jax.random.PRNGKey(0)
        )
    if "txt" in cond_type and cfg.get("use_enc", False):
        enc = TextureEncoder(
            emb_size=cfg["txt_emb_size"], hidden_dim=cfg["txt_hidden_dim"],
            z_dim=cfg["txt_z_dim"], num_channel=cfg["txt_num_channel"],
        )
        kwargs["txt_enc"] = enc
        kwargs["txt_enc_params"] = init_on_cpu(
            lambda r: enc.init(r, jnp.zeros((1, 32, 128)))["params"], jax.random.PRNGKey(1)
        )
    if cond_type == "pnotree":
        enc = PianoTreeEncoder()
        kwargs["pnotree_enc"] = enc
        kwargs["pnotree_enc_params"] = init_on_cpu(
            lambda r: enc.init(r, jnp.zeros((1, 32, 20, 6), jnp.int64))["params"],
            jax.random.PRNGKey(2),
        )
    return kwargs


@pytest.mark.parametrize("preset", available_presets())
def test_preset_init_and_loss_shapes(preset):
    cfg = load_params(preset)
    try:
        task = build_task(cfg)
    except FileNotFoundError:
        from polyffusion_tpu.tasks import SDFTask

        task = SDFTask(cfg, **random_encoders(cfg))

    params_shapes = jax.eval_shape(task.init_params, jax.random.PRNGKey(0))
    n_params = sum(int(np.prod(s.shape)) for s in jax.tree_util.tree_leaves(params_shapes))
    assert n_params > 1e5, f"{preset}: suspiciously few params ({n_params})"

    loss_shape, metrics_shapes = jax.eval_shape(
        lambda p, b, r: task.loss_fn(p, b, r, {"tfr_chd": 0.5, "global_step": 0}),
        params_shapes,
        abstract_batch(),
        jax.ShapeDtypeStruct((2,), jnp.uint32),
    )
    assert loss_shape.shape == ()
    assert "loss" in metrics_shapes


def test_flagship_param_count_matches_reference_scale():
    """The flagship UNet must land in the reference's ~25-60M range (SURVEY §5.8)."""
    cfg = load_params("sdf_chd8bar")
    task = build_task_no_enc(cfg)
    shapes = jax.eval_shape(task.init_params, jax.random.PRNGKey(0))
    n = sum(int(np.prod(s.shape)) for s in jax.tree_util.tree_leaves(shapes))
    assert 20e6 < n < 80e6, n


def build_task_no_enc(cfg):
    from polyffusion_tpu.tasks import SDFTask

    cfg = dict(cfg)
    cfg["use_enc"] = False
    from polyffusion_tpu.config import Params

    return SDFTask(Params(cfg))
