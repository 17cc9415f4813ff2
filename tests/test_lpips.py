"""LPIPS parity vs a torch oracle with shared random-initialized VGG weights.

torchvision is not installed here, so the reference module
(stable_diffusion/losses/lpips.py — it imports torchvision at module scope)
cannot be imported; the oracle below reconstructs the same computation in plain
torch, transcribed line-for-line from the reference:

- vgg16.features conv/pool trunk with taps after relu1_2/2_2/3_3/4_3/5_3
  (reference lpips.py vgg16 class, slices [0:4)[4:9)[9:16)[16:23)[23:30));
- ScalingLayer shift/scale constants (lpips.py:70-77);
- normalize_tensor (channel unit norm, eps 1e-10), squared diff, 1x1 lin conv,
  spatial_average, sum over the 5 taps (lpips.py forward :46-67).

Weights are random (no download) and injected identically into both sides.
"""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax.numpy as jnp

from polyffusion_tpu.models.lpips import (
    _CHNS,
    _POOL_BEFORE,
    _SCALE,
    _SHIFT,
    _TAP_AFTER,
    _VGG_CONVS,
    LPIPS,
    lpips_params_from_torch,
)


def _random_state_dict(rng):
    sd = {}
    in_c = 3
    for idx, out_c in _VGG_CONVS.items():
        sd[f"features.{idx}.weight"] = rng.standard_normal(
            (out_c, in_c, 3, 3)
        ).astype(np.float32) * (in_c * 9) ** -0.5
        sd[f"features.{idx}.bias"] = (
            rng.standard_normal(out_c).astype(np.float32) * 0.1
        )
        in_c = out_c
    for k, c in enumerate(_CHNS):
        sd[f"lin{k}.model.1.weight"] = np.abs(
            rng.standard_normal((1, c, 1, 1)).astype(np.float32)
        )
    return sd


def _torch_lpips(sd, x_nchw, y_nchw):
    shift = torch.tensor(list(_SHIFT))[None, :, None, None]
    scale = torch.tensor(list(_SCALE))[None, :, None, None]

    def trunk(t):
        h = (t - shift) / scale
        taps = []
        for idx in _VGG_CONVS:
            if idx in _POOL_BEFORE:
                h = F.max_pool2d(h, 2, 2)
            h = F.conv2d(
                h,
                torch.from_numpy(sd[f"features.{idx}.weight"]),
                torch.from_numpy(sd[f"features.{idx}.bias"]),
                padding=1,
            )
            h = F.relu(h)
            if idx in _TAP_AFTER:
                taps.append(h)
        return taps

    def normalize_tensor(t, eps=1e-10):
        norm = torch.sqrt(torch.sum(t**2, dim=1, keepdim=True))
        return t / (norm + eps)

    taps_x, taps_y = trunk(x_nchw), trunk(y_nchw)
    val = 0.0
    for k in range(5):
        diff = (normalize_tensor(taps_x[k]) - normalize_tensor(taps_y[k])) ** 2
        lin = torch.from_numpy(sd[f"lin{k}.model.1.weight"])
        val = val + F.conv2d(diff, lin).mean(dim=(2, 3), keepdim=True)
    return val.reshape(-1)


@pytest.fixture(scope="module")
def sd():
    return _random_state_dict(np.random.default_rng(0))


def test_lpips_matches_torch_oracle(sd):
    rng = np.random.default_rng(1)
    x = rng.random((2, 3, 64, 64)).astype(np.float32)
    y = np.clip(x + 0.1 * rng.standard_normal(x.shape).astype(np.float32), 0, 1)

    want = _torch_lpips(sd, torch.from_numpy(x), torch.from_numpy(y)).numpy()

    params = lpips_params_from_torch(sd)
    got = LPIPS().apply(
        {"params": params},
        jnp.asarray(x.transpose(0, 2, 3, 1)),
        jnp.asarray(y.transpose(0, 2, 3, 1)),
    )
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-5)
    assert (want > 0).all()


def test_lpips_zero_for_identical_inputs(sd):
    params = lpips_params_from_torch(sd)
    x = jnp.asarray(np.random.default_rng(2).random((1, 64, 64, 3)), jnp.float32)
    d = LPIPS().apply({"params": params}, x, x)
    np.testing.assert_allclose(np.asarray(d), 0.0, atol=1e-6)


def test_autoencoder_task_uses_lpips(sd):
    """perceptual term wired per reference contperceptual.py:72-76."""
    import jax

    from polyffusion_tpu.config import Params
    from polyffusion_tpu.tasks.autoencoder import AutoencoderTask

    cfg = dict(
        model_name="autoencoder",
        channels=32,
        channel_multipliers=[1, 2],
        n_res_blocks=1,
        in_channels=3,
        out_channels=3,
        z_channels=2,
        emb_channels=2,
        img_h=32,
        adaptive_disc_weight=False,
        batch_size=2,
    )
    rng = jax.random.PRNGKey(0)
    batch = (jnp.asarray(np.random.default_rng(3).random((2, 2, 32, 32)), jnp.float32),
             None, None, None)

    base = AutoencoderTask(Params(cfg))
    params = base.init_params(rng)
    loss0, m0 = base.loss_fn(params, batch, rng, {"global_step": 0})
    assert "p_loss" not in m0  # default behavior unchanged without weights

    cfg["lpips_params"] = lpips_params_from_torch(sd)
    task = AutoencoderTask(Params(cfg))
    loss1, m1 = task.loss_fn(params, batch, rng, {"global_step": 0})
    assert "p_loss" in m1 and float(m1["p_loss"]) > 0
    assert float(loss1) > float(loss0)  # perceptual term adds to the NLL
