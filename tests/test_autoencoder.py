"""Autoencoder family: forward parity vs the reference model + task smoke test."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from polyffusion_tpu.config import Params
from polyffusion_tpu.models.autoencoder import Autoencoder
from polyffusion_tpu.tasks.autoencoder import AutoencoderTask

from reference_oracle import reference_available, torch_state_to_numpy


def test_autoencoder_roundtrip_shapes():
    ae = Autoencoder(channels=32, channel_multipliers=(1, 2), n_resnet_blocks=1,
                     in_channels=3, out_channels=3, z_channels=4, emb_channels=4)
    rng = jax.random.PRNGKey(0)
    img = jnp.zeros((2, 32, 32, 3))
    variables = ae.init(rng, img, rng)
    recon, (mean, log_var) = ae.apply(variables, img, rng)
    assert recon.shape == img.shape
    assert mean.shape == (2, 16, 16, 4)  # one downsample level
    assert np.isfinite(np.asarray(recon)).all()


@pytest.mark.skipif(not reference_available(), reason="torch/reference unavailable")
def test_encoder_forward_parity():
    """Converted-weight parity of the Encoder path vs the reference torch module."""
    import torch

    from reference_oracle import add_reference_path, import_reference_samplers

    import_reference_samplers()  # installs torchvision stubs for the losses import
    add_reference_path()
    from stable_diffusion.model.autoencoder import Encoder as TorchEncoder

    torch.manual_seed(0)
    tm = TorchEncoder(channels=32, channel_multipliers=[1, 2], n_resnet_blocks=1,
                      in_channels=3, z_channels=4)
    tm.eval()
    sd = torch_state_to_numpy(tm)

    from polyffusion_tpu.convert.torch_import import _conv, _linear, _norm  # noqa

    # build flax params mechanically from the torch keys
    from polyffusion_tpu.models.autoencoder import Encoder

    jm = Encoder(channels=32, channel_multipliers=(1, 2), n_resnet_blocks=1, z_channels=4)
    rng = np.random.default_rng(0)
    x = rng.standard_normal((1, 3, 32, 32)).astype(np.float32)

    from polyffusion_tpu.convert.torch_import import autoencoder_encoder_params_from_torch

    params = autoencoder_encoder_params_from_torch(sd)
    with torch.no_grad():
        want = tm(torch.from_numpy(x)).numpy()
    got = jm.apply({"params": params}, jnp.transpose(jnp.asarray(x), (0, 2, 3, 1)))
    np.testing.assert_allclose(
        np.transpose(np.asarray(got), (0, 3, 1, 2)), want, atol=2e-4, rtol=1e-4
    )


def test_autoencoder_task_step():
    cfg = Params(
        model_name="autoencoder", batch_size=2, learning_rate=1e-4, bf16=False,
        in_channels=3, out_channels=3, z_channels=4, channels=32, n_res_blocks=1,
        channel_multipliers=[1, 2], emb_channels=4, disc_start=0, kl_weight=1e-6,
        disc_weight=0.5, img_h=32,
    )
    task = AutoencoderTask(cfg)
    params = task.init_params(jax.random.PRNGKey(0))
    batch = (
        jnp.zeros((2, 2, 32, 32)).at[:, 0, ::4, 16].set(1.0),
        None, None, None,
    )
    loss, metrics = task.loss_fn(params, batch, jax.random.PRNGKey(1), {"global_step": 10})
    assert np.isfinite(float(loss))
    assert {"nll_loss", "kl_loss", "g_loss", "disc_loss"} <= set(metrics)

    # gradient flows to both parameter groups
    grads = jax.grad(lambda p: task.loss_fn(p, batch, jax.random.PRNGKey(1), {"global_step": 10})[0])(params)
    ae_norm = sum(float(jnp.abs(g).sum()) for g in jax.tree_util.tree_leaves(grads["ae"]))
    d_norm = sum(float(jnp.abs(g).sum()) for g in jax.tree_util.tree_leaves(grads["disc"]))
    assert ae_norm > 0 and d_norm > 0
