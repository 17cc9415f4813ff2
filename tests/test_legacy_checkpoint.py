"""Round-trip: train 2 steps here -> export legacy learner .pt -> the REFERENCE
resume path accepts it.

Covers VERDICT item 6: the reference's ``learner.load_state_dict`` (learner.py:86-91)
needs ``{step, epoch, model, optimizer, scaler}`` with a STRICT model state dict and
a torch-Adam optimizer dict whose parameter indices follow
``Polyffusion_SDF.parameters()`` order — all verified below against the actual
reference modules (imported, never copied).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from polyffusion_tpu.config import Params
from polyffusion_tpu.convert.torch_export import (
    export_learner_checkpoint,
    unet_param_order,
    _leaf_pairs,
    _get_path,
)
from polyffusion_tpu.parallel.mesh import init_on_cpu
from polyffusion_tpu.tasks import SDFTask
from polyffusion_tpu.train import create_state, make_optimizer, make_train_step
from polyffusion_tpu.parallel import make_mesh, shard_batch, replicated
from polyffusion_tpu.data.loader import Batch

from reference_oracle import import_reference_samplers, reference_available

pytestmark = pytest.mark.skipif(
    not reference_available(), reason="torch reference unavailable"
)

TINY = dict(
    model_name="sdf_tiny",
    batch_size=8,
    learning_rate=5e-5,
    max_grad_norm=10,
    bf16=False,
    in_channels=2,
    out_channels=2,
    channels=32,
    attention_levels=[1],
    n_res_blocks=1,
    channel_multipliers=[1, 2],
    n_heads=2,
    tf_layers=1,
    d_cond=1152,
    linear_start=0.00085,
    linear_end=0.012,
    n_steps=20,
    img_h=64,
    img_w=64,
    cond_type="chord",
    cond_mode="cond",
    use_enc=False,
)


def _build_reference_model():
    import_reference_samplers()
    from stable_diffusion.latent_diffusion import LatentDiffusion
    from stable_diffusion.model.unet import UNetModel
    from models.model_sdf import Polyffusion_SDF

    unet = UNetModel(
        in_channels=2, out_channels=2, channels=32, n_res_blocks=1,
        attention_levels=[1], channel_multipliers=[1, 2], n_heads=2,
        tf_layers=1, d_cond=1152,
    )
    ldm = LatentDiffusion(unet, None, 1152, 20, 0.00085, 0.012)
    return Polyffusion_SDF(ldm, cond_type="chord", cond_mode="cond")


@pytest.fixture(scope="module")
def trained():
    """2 real train steps of the tiny sdf config."""
    cfg = Params(TINY)
    task = SDFTask(cfg)
    mesh = make_mesh(jax.devices()[:1])
    optimizer = make_optimizer(cfg.learning_rate, cfg.max_grad_norm)
    train_step = make_train_step(task, optimizer, mesh)
    rng = jax.random.PRNGKey(0)
    params = init_on_cpu(task.init_params, rng)
    state = jax.device_put(create_state(params, optimizer), replicated(mesh))
    b = 8
    r = np.random.default_rng(0)
    batch = shard_batch(
        Batch(
            prmat2c=r.random((b, 2, 64, 64), np.float32),
            pnotree=np.zeros((b, 128, 20, 6), np.int64),
            chord=r.random((b, 32, 36)).astype(np.float32),
            prmat=np.zeros((b, 128, 128), np.float32),
        ),
        mesh,
    )
    for i in range(2):
        state, _ = train_step(state, tuple(batch), jax.random.fold_in(rng, i), ())
    return task, state


def test_param_order_matches_reference(trained):
    task, state = trained
    ref = _build_reference_model()
    want = [n for n, _ in ref.named_parameters()]
    got = ["ldm.alpha", "ldm.beta", "ldm.alpha_bar"]
    for tk, fp, kind in unet_param_order(jax.device_get(state.params)):
        sub = _get_path(jax.device_get(state.params), fp)
        for torch_key, leaf, _ in _leaf_pairs(kind, tk, sub):
            got.append(f"ldm.eps_model.{torch_key}")
    assert got == want


def test_reference_resume_roundtrip(tmp_path, trained):
    import torch

    task, state = trained
    path = str(tmp_path / "weights.pt")
    export_learner_checkpoint(
        jax.device_get(state.params),
        path,
        schedule=task.schedule,
        opt_state=jax.device_get(state.opt_state),
        step=2,
        epoch=0,
        learning_rate=TINY["learning_rate"],
    )

    ck = torch.load(path, weights_only=False)
    assert set(ck) == {"step", "epoch", "model", "optimizer", "scaler"}

    ref = _build_reference_model()
    # STRICT load — the reference resume path (learner.py:88)
    ref.load_state_dict(ck["model"])

    opt = torch.optim.Adam(ref.parameters(), lr=TINY["learning_rate"])
    opt.load_state_dict(ck["optimizer"])
    # optimizer-state keys present with Adam moments
    st = opt.state_dict()["state"]
    assert len(st) > 0
    any_entry = st[min(st)]
    assert {"step", "exp_avg", "exp_avg_sq"} <= set(any_entry)
    assert float(any_entry["step"]) == 2.0

    scaler = torch.amp.GradScaler("cpu", enabled=False)
    scaler.load_state_dict(ck["scaler"])  # fp32 run: empty dict accepted

    # the restored reference model reproduces our UNet's forward output
    x = np.random.default_rng(1).standard_normal((2, 64, 64, 2)).astype(np.float32)
    t = np.array([3, 7], np.int64)
    cond = np.random.default_rng(2).random((2, 1, 1152)).astype(np.float32)
    ours = np.asarray(
        task.apply_eps(state.params, jnp.asarray(x), jnp.asarray(t), jnp.asarray(cond))
    )
    with torch.no_grad():
        theirs = ref.ldm.eps_model(
            torch.from_numpy(x.transpose(0, 3, 1, 2)),
            torch.from_numpy(t),
            torch.from_numpy(cond),
        ).numpy().transpose(0, 2, 3, 1)
    # 5e-4: the virtual skip-concat splits decoder convs into two partial sums
    # (models/unet.py ConcatConv), shifting fp32 accumulation order slightly
    np.testing.assert_allclose(ours, theirs, atol=5e-4)


def test_load_trained_inference_path(tmp_path, trained):
    """The reference's .pt INFERENCE loader also accepts the export
    (Polyffusion_SDF.load_trained, model_sdf.py:59-84)."""
    import torch

    task, state = trained
    path = str(tmp_path / "weights.pt")
    export_learner_checkpoint(
        jax.device_get(state.params), path, schedule=task.schedule
    )
    import_reference_samplers()
    from models.model_sdf import Polyffusion_SDF

    ref = _build_reference_model()
    loaded = Polyffusion_SDF.load_trained(
        ref.ldm, path, "chord", "cond"
    )
    assert loaded is not None
