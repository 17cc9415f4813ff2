"""Numerical parity of the flax UNet vs the reference torch UNet (same weights)."""

import numpy as np
import pytest

from reference_oracle import add_reference_path, reference_available, torch_state_to_numpy

if not reference_available():
    pytest.skip("torch/reference unavailable", allow_module_level=True)

import torch  # noqa: E402

add_reference_path()
from stable_diffusion.model.unet import UNetModel as TorchUNet  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from polyffusion_tpu.convert import unet_params_from_torch  # noqa: E402
from polyffusion_tpu.models.unet import UNetModel, timestep_embedding  # noqa: E402

pytestmark = pytest.mark.slow  # full-UNet/e2e XLA compiles: skip with -m 'not slow'

TINY = dict(
    in_channels=2,
    out_channels=2,
    channels=32,
    n_res_blocks=1,
    attention_levels=[1],
    channel_multipliers=[1, 2],
    n_heads=2,
    tf_layers=1,
    d_cond=12,
)


def test_timestep_embedding_parity():
    tm = TorchUNet(**TINY)
    t = torch.arange(0, 1000, 37)
    want = tm.time_step_embedding(t).numpy()
    got = np.asarray(timestep_embedding(jnp.asarray(t.numpy()), 32))
    np.testing.assert_allclose(got, want, atol=2e-6)


@pytest.mark.parametrize("seed", [0, 1])
def test_unet_forward_parity(seed):
    torch.manual_seed(seed)
    tm = TorchUNet(**TINY)
    tm.eval()

    rng = np.random.default_rng(seed)
    x = rng.standard_normal((2, 2, 16, 16), dtype=np.float32)
    t = np.array([3, 977], dtype=np.int64)
    cond = rng.standard_normal((2, 3, 12), dtype=np.float32)

    with torch.no_grad():
        want = tm(torch.from_numpy(x), torch.from_numpy(t), torch.from_numpy(cond)).numpy()

    params = unet_params_from_torch(torch_state_to_numpy(tm))
    jm = UNetModel(**{**TINY, "attention_levels": (1,), "channel_multipliers": (1, 2)})
    got_nhwc = jm.apply(
        {"params": params},
        jnp.transpose(jnp.asarray(x), (0, 2, 3, 1)),
        jnp.asarray(t),
        jnp.asarray(cond),
    )
    got = np.transpose(np.asarray(got_nhwc), (0, 3, 1, 2))
    np.testing.assert_allclose(got, want, atol=2e-4, rtol=1e-4)


def test_converted_tree_matches_init_structure():
    """Converter output must be structurally identical to flax init (no silent misses)."""
    torch.manual_seed(0)
    tm = TorchUNet(**TINY)
    params = unet_params_from_torch(torch_state_to_numpy(tm))
    jm = UNetModel(**{**TINY, "attention_levels": (1,), "channel_multipliers": (1, 2)})
    init = jm.init(
        jax.random.PRNGKey(0),
        jnp.zeros((1, 16, 16, 2)),
        jnp.zeros((1,), jnp.int32),
        jnp.zeros((1, 3, 12)),
    )["params"]

    flat_init = jax.tree_util.tree_leaves_with_path(init)
    flat_conv = {jax.tree_util.keystr(p): v for p, v in jax.tree_util.tree_leaves_with_path(params)}
    assert len(flat_init) == len(flat_conv)
    for path, leaf in flat_init:
        key = jax.tree_util.keystr(path)
        assert key in flat_conv, f"missing converted param {key}"
        assert flat_conv[key].shape == leaf.shape, f"shape mismatch at {key}"


def test_cfg_fork_equals_double_batch():
    """cfg_fork computes the shared prefix once — outputs must be IDENTICAL to the
    plain double-batched call."""
    torch.manual_seed(3)
    tm = TorchUNet(**TINY)
    params = unet_params_from_torch(torch_state_to_numpy(tm))
    jm = UNetModel(**{**TINY, "attention_levels": (1,), "channel_multipliers": (1, 2)})

    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal((2, 16, 16, 2)).astype(np.float32))
    t = jnp.asarray(np.array([5, 40], np.int32))
    cond = jnp.asarray(rng.standard_normal((2, 3, 12)).astype(np.float32))
    uncond = -jnp.ones_like(cond)
    c_in = jnp.concatenate([uncond, cond], axis=0)

    plain = jm.apply(
        {"params": params},
        jnp.concatenate([x, x], 0),
        jnp.concatenate([t, t], 0),
        c_in,
    )
    forked = jm.apply({"params": params}, x, t, c_in, cfg_fork=True)
    # same math evaluated once vs twice; XLA tiles differently per batch size, so
    # agreement is to float32 reassociation noise, not bitwise
    np.testing.assert_allclose(np.asarray(forked), np.asarray(plain), atol=1e-5)


def test_torch_export_roundtrip_and_reference_load():
    """Export our params to a reference-format checkpoint; the reference torch UNet
    must load it and agree with our forward (train-here, run-there)."""
    import tempfile, os

    from polyffusion_tpu.convert.torch_export import (
        save_reference_checkpoint,
        unet_params_to_torch,
    )

    torch.manual_seed(9)
    tm = TorchUNet(**TINY)
    sd0 = torch_state_to_numpy(tm)
    params = unet_params_from_torch(sd0)

    # key-exact round trip
    sd1 = unet_params_to_torch(params)
    assert set(sd1) == set(sd0)
    for k in sd0:
        np.testing.assert_array_equal(sd1[k], sd0[k], err_msg=k)

    # the reference loads our exported checkpoint
    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "weights.pt")
        save_reference_checkpoint(params, path)
        blob = torch.load(path, weights_only=False)["model"]
        stripped = {k[len("ldm.eps_model."):]: v for k, v in blob.items()}
        tm2 = TorchUNet(**TINY)
        tm2.load_state_dict(stripped)

    rng = np.random.default_rng(9)
    x = rng.standard_normal((1, 2, 16, 16), dtype=np.float32)
    t = np.array([123], np.int64)
    cond = rng.standard_normal((1, 2, 12), dtype=np.float32)
    with torch.no_grad():
        a = tm(torch.from_numpy(x), torch.from_numpy(t), torch.from_numpy(cond))
        b = tm2(torch.from_numpy(x), torch.from_numpy(t), torch.from_numpy(cond))
    np.testing.assert_array_equal(a.numpy(), b.numpy())


def test_groupnorm_bf16_large_mean_robustness():
    """Pin the one-pass E[x^2]-E[x]^2 GroupNorm statistics (models/unet.py
    FP32GroupNorm) against two-pass references at BF16 activations with
    adversarially large-mean inputs (VERDICT r1 item 7: catastrophic
    cancellation is the known failure mode of one-pass variance).

    The reference below emulates the module's own affine/output quantization
    (a/off cast to the activation dtype), so the residual isolates the STATS
    error of the one-pass formulation: it must stay at bf16-output-rounding
    magnitude for mean scales far beyond anything post-conv GN inputs reach,
    and only degrade gracefully (documented bound) at mean ~100x the signal."""
    import jax.numpy as jnp

    from polyffusion_tpu.models.unet import FP32GroupNorm

    rng = np.random.default_rng(11)
    b, h, w, c, g = 2, 16, 16, 64, 32

    def two_pass_like_module(x32, scale, bias, act_dtype):
        """fp64 two-pass stats + the module's exact affine quantization."""
        xq = np.asarray(jnp.asarray(x32, act_dtype).astype(jnp.float32), np.float64)
        xg = xq.reshape(b, h * w, g, c // g)
        mu = xg.mean(axis=(1, 3))  # (B, g)
        var = ((xg - mu[:, None, :, None]) ** 2).mean(axis=(1, 3))
        inv = 1.0 / np.sqrt(var + 1e-5)
        inv_c = np.repeat(inv, c // g, -1)
        mu_c = np.repeat(mu, c // g, -1)
        a = (inv_c * scale).astype(np.float32)
        off = (bias - mu_c * inv_c * scale).astype(np.float32)
        aq = jnp.asarray(a, act_dtype)
        offq = jnp.asarray(off, act_dtype)
        y = jnp.asarray(xq.reshape(b, h, w, c), act_dtype) * aq.reshape(
            b, 1, 1, c
        ) + offq.reshape(b, 1, 1, c)
        return np.asarray(y.astype(jnp.float32))

    for mean_scale, tol in ((0.0, 5e-6), (10.0, 2e-4), (30.0, 2e-3), (100.0, 0.05)):
        # large common mode + unit signal: var ~ 1 while E[x^2] ~ mean^2
        x32 = (mean_scale + rng.standard_normal((b, h, w, c))).astype(np.float32)
        scale = rng.standard_normal(c).astype(np.float32)
        bias = rng.standard_normal(c).astype(np.float32)
        params = {"scale": jnp.asarray(scale), "bias": jnp.asarray(bias)}

        for act_dtype in (jnp.float32, jnp.bfloat16):
            got = np.asarray(
                FP32GroupNorm(num_groups=g).apply(
                    {"params": params}, jnp.asarray(x32, act_dtype)
                ),
                np.float32,
            )
            ref = two_pass_like_module(x32, scale, bias, act_dtype)
            err = np.abs(got - ref).max()
            # the output itself is act_dtype-rounded; pure stats error on top
            out_round = 0.0 if act_dtype == jnp.float32 else 0.05 * (1 + mean_scale / 10)
            assert err <= tol * (1 + mean_scale) + out_round, (
                mean_scale, act_dtype.__name__, err,
            )
