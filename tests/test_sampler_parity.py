"""Trajectory parity of the lax.scan samplers vs the reference torch samplers.

Same tiny UNet weights on both sides, identical injected noise -> final samples must
match to float32 accumulation tolerance.  This is the BASELINE.md north-star check
("numerically matched denoising trajectories").
"""

import numpy as np
import pytest

from reference_oracle import (
    import_reference_samplers,
    reference_available,
    torch_state_to_numpy,
)

if not reference_available():
    pytest.skip("torch/reference unavailable", allow_module_level=True)

import torch  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from polyffusion_tpu.convert import unet_params_from_torch  # noqa: E402
from polyffusion_tpu.diffusion import make_ddim_schedule, make_schedule  # noqa: E402
from polyffusion_tpu.diffusion import sampler as S  # noqa: E402
from polyffusion_tpu.models.unet import UNetModel  # noqa: E402

LatentDiffusion, SDFSampler, TorchDDIM = import_reference_samplers()

from stable_diffusion.model.unet import UNetModel as TorchUNet  # noqa: E402

pytestmark = pytest.mark.slow  # full-UNet/e2e XLA compiles: skip with -m 'not slow'

T = 60  # tiny schedule for test speed
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


@pytest.fixture(scope="module")
def models():
    torch.manual_seed(0)
    tm = TorchUNet(**TINY)
    tm.eval()
    ldm = LatentDiffusion(tm, None, 0.18215, T, 0.00085, 0.012)
    params = unet_params_from_torch(torch_state_to_numpy(tm))
    jm = UNetModel(**{**TINY, "attention_levels": (1,), "channel_multipliers": (1, 2)})
    apply_fn = lambda p, x, t, c: jm.apply({"params": p}, x, t, c)  # noqa: E731
    sch = make_schedule(T, 0.00085, 0.012)
    return ldm, params, apply_fn, sch


def _nhwc(x):
    return jnp.transpose(jnp.asarray(x), (0, 2, 3, 1))


def _nchw(x):
    return np.transpose(np.asarray(x), (0, 3, 1, 2))


@pytest.mark.parametrize("scale", [1.0, 5.0, 0.0])
def test_ddpm_sample_trajectory_parity(models, scale):
    ldm, params, apply_fn, sch = models
    rng = np.random.default_rng(1)
    x_t = rng.standard_normal((2, 2, 16, 16), dtype=np.float32)
    cond = rng.standard_normal((2, 1, 12), dtype=np.float32)
    uncond = -np.ones_like(cond)

    sampler = SDFSampler(ldm)
    with torch.no_grad():
        want = sampler.sample(
            [2, 2, 16, 16],
            torch.from_numpy(cond),
            temperature=0.0,
            x_last=torch.from_numpy(x_t),
            uncond_scale=scale,
            uncond_cond=torch.from_numpy(uncond),
        ).numpy()

    got = S.ddpm_sample(
        apply_fn,
        params,
        sch,
        _nhwc(x_t),
        jnp.asarray(cond),
        jax.random.PRNGKey(0),
        uncond_scale=scale,
        uncond_cond=jnp.asarray(uncond),
        temperature=0.0,
    )
    np.testing.assert_allclose(_nchw(got), want, atol=5e-3, rtol=1e-3)


def test_ddim_sample_trajectory_parity(models):
    ldm, params, apply_fn, sch = models
    rng = np.random.default_rng(2)
    x_t = rng.standard_normal((1, 2, 16, 16), dtype=np.float32)
    cond = rng.standard_normal((1, 1, 12), dtype=np.float32)

    tsampler = TorchDDIM(ldm, n_steps=10, ddim_discretize="uniform", ddim_eta=0.0)
    with torch.no_grad():
        want = tsampler.sample(
            [1, 2, 16, 16],
            torch.from_numpy(cond),
            x_last=torch.from_numpy(x_t),
            uncond_scale=1.0,
        ).numpy()

    dd = make_ddim_schedule(sch, 10, "uniform", 0.0)
    got = S.ddim_sample(
        apply_fn,
        params,
        dd,
        _nhwc(x_t),
        jnp.asarray(cond),
        jax.random.PRNGKey(0),
        uncond_scale=1.0,
    )
    np.testing.assert_allclose(_nchw(got), want, atol=2e-3, rtol=1e-3)


def test_ddim_quad_trajectory_parity(models):
    """End-to-end trajectory on the QUAD tau grid (reference sampler_ddim.py:68-73,
    including its int-truncation + 1 off-by-one convention)."""
    ldm, params, apply_fn, sch = models
    rng = np.random.default_rng(7)
    x_t = rng.standard_normal((1, 2, 16, 16), dtype=np.float32)
    cond = rng.standard_normal((1, 1, 12), dtype=np.float32)

    tsampler = TorchDDIM(ldm, n_steps=10, ddim_discretize="quad", ddim_eta=0.0)
    with torch.no_grad():
        want = tsampler.sample(
            [1, 2, 16, 16],
            torch.from_numpy(cond),
            x_last=torch.from_numpy(x_t),
            uncond_scale=1.0,
        ).numpy()

    dd = make_ddim_schedule(sch, 10, "quad", 0.0)
    np.testing.assert_array_equal(dd.time_steps, tsampler.time_steps)
    got = S.ddim_sample(
        apply_fn,
        params,
        dd,
        _nhwc(x_t),
        jnp.asarray(cond),
        jax.random.PRNGKey(0),
        uncond_scale=1.0,
    )
    np.testing.assert_allclose(_nchw(got), want, atol=2e-3, rtol=1e-3)


def test_ddim_eta_trajectory_parity(models):
    """End-to-end stochastic-DDIM trajectory (eta=1) with injected identical
    per-step noise on both sides (reference sampler_ddim.py:88-99, 246-262:
    sigma > 0 at every index, so one randn is consumed per step)."""
    ldm, params, apply_fn, sch = models
    rng = np.random.default_rng(8)
    x_t = rng.standard_normal((1, 2, 16, 16), dtype=np.float32)
    cond = rng.standard_normal((1, 1, 12), dtype=np.float32)
    n = 10
    plan = rng.standard_normal((n, 1, 2, 16, 16)).astype(np.float32)

    tsampler = TorchDDIM(ldm, n_steps=n, ddim_discretize="uniform", ddim_eta=1.0)
    assert (tsampler.ddim_sigma.numpy() > 0).all()
    queue = [torch.from_numpy(p.copy()) for p in plan]
    orig_randn = torch.randn
    torch.randn = lambda *a, **k: queue.pop(0)
    try:
        with torch.no_grad():
            want = tsampler.sample(
                [1, 2, 16, 16],
                torch.from_numpy(cond),
                x_last=torch.from_numpy(x_t),
                uncond_scale=1.0,
            ).numpy()
    finally:
        torch.randn = orig_randn
    assert not queue, "torch side did not consume the whole noise plan"

    dd = make_ddim_schedule(sch, n, "uniform", 1.0)
    got = S.ddim_sample(
        apply_fn,
        params,
        dd,
        _nhwc(x_t),
        jnp.asarray(cond),
        jax.random.PRNGKey(0),
        uncond_scale=1.0,
        noise_override=jnp.asarray(np.transpose(plan, (0, 1, 3, 4, 2))),
    )
    np.testing.assert_allclose(_nchw(got), want, atol=2e-3, rtol=1e-3)


def test_ddpm_paint_repaint_parity(models):
    """RePaint with repaint_n=2 and injected identical noise on both sides."""
    ldm, params, apply_fn, sch = models
    rng = np.random.default_rng(3)
    shape = (1, 2, 16, 16)
    x_t = rng.standard_normal(shape, dtype=np.float32)
    cond = rng.standard_normal((1, 1, 12), dtype=np.float32)
    orig = rng.standard_normal(shape, dtype=np.float32)
    mask = np.zeros(shape, np.float32)
    mask[:, :, :, :64] = 1.0  # keep low pitches
    t_start = T - 1
    repaint_n = 2

    # Build the noise plan in the exact consumption order of the reference paint
    # loop (sampler_sdf.py:292-341): per step desc, per inner u: q-noise (step>0),
    # p-noise (step>0), renoise (u<n-1 and step>0).
    steps = list(range(t_start, -1, -1))
    plan = np.zeros((len(steps), repaint_n, 3, *shape), np.float32)
    feed = []
    for i, step in enumerate(steps):
        for u in range(repaint_n):
            if step > 0:
                plan[i, u, 0] = rng.standard_normal(shape, dtype=np.float32)
                feed.append(plan[i, u, 0])
                plan[i, u, 1] = rng.standard_normal(shape, dtype=np.float32)
                feed.append(plan[i, u, 1])
                if u < repaint_n - 1:
                    plan[i, u, 2] = rng.standard_normal(shape, dtype=np.float32)
                    feed.append(plan[i, u, 2])

    queue = [torch.from_numpy(f.copy()) for f in feed]

    def fake_randn(*args, **kw):
        if args and isinstance(args[0], torch.Tensor):  # randn_like
            return queue.pop(0)
        return queue.pop(0)

    sampler = SDFSampler(ldm)
    orig_randn, orig_randn_like = torch.randn, torch.randn_like
    torch.randn, torch.randn_like = fake_randn, fake_randn
    try:
        with torch.no_grad():
            want = sampler.paint(
                torch.from_numpy(x_t),
                torch.from_numpy(cond),
                t_start,
                orig=torch.from_numpy(orig),
                mask=torch.from_numpy(mask),
                uncond_scale=1.0,
                repaint_n=repaint_n,
            ).numpy()
    finally:
        torch.randn, torch.randn_like = orig_randn, orig_randn_like
    assert not queue, "torch side did not consume the whole noise plan"

    plan_nhwc = np.transpose(plan, (0, 1, 2, 3, 5, 6, 4))
    got = S.ddpm_paint(
        apply_fn,
        params,
        sch,
        _nhwc(x_t),
        jnp.asarray(cond),
        t_start,
        jax.random.PRNGKey(0),
        orig=_nhwc(orig),
        mask=_nhwc(mask),
        uncond_scale=1.0,
        repaint_n=repaint_n,
        noise_override=jnp.asarray(plan_nhwc),
    )
    np.testing.assert_allclose(_nchw(got), want, atol=5e-3, rtol=1e-3)
    # the known region must be exactly the original
    np.testing.assert_allclose(
        _nchw(got)[:, :, :, :64], want[:, :, :, :64], atol=1e-5
    )


def test_ddim_paint_parity(models):
    ldm, params, apply_fn, sch = models
    rng = np.random.default_rng(4)
    shape = (1, 2, 16, 16)
    x_t = rng.standard_normal(shape, dtype=np.float32)
    cond = rng.standard_normal((1, 1, 12), dtype=np.float32)
    orig = rng.standard_normal(shape, dtype=np.float32)
    orig_noise = rng.standard_normal(shape, dtype=np.float32)
    mask = np.zeros(shape, np.float32)
    mask[:, :, :8] = 1.0

    tsampler = TorchDDIM(ldm, n_steps=10, ddim_discretize="uniform", ddim_eta=0.0)
    t_start = 9
    with torch.no_grad():
        want = tsampler.paint(
            torch.from_numpy(x_t),
            torch.from_numpy(cond),
            t_start,
            orig=torch.from_numpy(orig),
            mask=torch.from_numpy(mask),
            orig_noise=torch.from_numpy(orig_noise),
            uncond_scale=1.0,
        ).numpy()

    dd = make_ddim_schedule(sch, 10, "uniform", 0.0)
    got = S.ddim_paint(
        apply_fn,
        params,
        dd,
        _nhwc(x_t),
        jnp.asarray(cond),
        t_start,
        jax.random.PRNGKey(0),
        orig=_nhwc(orig),
        mask=_nhwc(mask),
        orig_noise=_nhwc(orig_noise),
        uncond_scale=1.0,
    )
    np.testing.assert_allclose(_nchw(got), want, atol=2e-3, rtol=1e-3)


def test_ddpm_sample_cfg_fork_trajectory_parity(models, monkeypatch):
    """The in-UNet CFG fork must reproduce the reference trajectory too."""
    monkeypatch.setenv("POLYFF_CFG_FORK", "1")
    ldm, params, apply_fn, sch = models
    from polyffusion_tpu.models.unet import UNetModel as JUNet

    jm = JUNet(**{**TINY, "attention_levels": (1,), "channel_multipliers": (1, 2)})

    def forked_apply(p, x, t, c, cfg_fork=False):
        return jm.apply({"params": p}, x, t, c, cfg_fork=cfg_fork)

    forked_apply.supports_cfg_fork = True

    rng = np.random.default_rng(11)
    x_t = rng.standard_normal((2, 2, 16, 16), dtype=np.float32)
    cond = rng.standard_normal((2, 1, 12), dtype=np.float32)
    uncond = -np.ones_like(cond)

    sampler = SDFSampler(ldm)
    with torch.no_grad():
        want = sampler.sample(
            [2, 2, 16, 16],
            torch.from_numpy(cond),
            temperature=0.0,
            x_last=torch.from_numpy(x_t),
            uncond_scale=5.0,
            uncond_cond=torch.from_numpy(uncond),
        ).numpy()

    got = S.ddpm_sample(
        forked_apply,
        params,
        sch,
        _nhwc(x_t),
        jnp.asarray(cond),
        jax.random.PRNGKey(0),
        uncond_scale=5.0,
        uncond_cond=jnp.asarray(uncond),
        temperature=0.0,
    )
    np.testing.assert_allclose(_nchw(got), want, atol=5e-3, rtol=1e-3)
