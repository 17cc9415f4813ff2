"""Golden-parity tests for the noise schedules vs the torch reference computation."""

import numpy as np
import pytest

from polyffusion_tpu.diffusion import schedule as S

from reference_oracle import reference_available

torch = pytest.importorskip("torch") if reference_available() else None


def test_shapes_and_monotonicity():
    sch = S.make_schedule(1000, 0.00085, 0.012)
    assert sch.n_steps == 1000
    assert np.all(np.diff(sch.beta) > 0)
    assert np.all(np.diff(sch.alpha_bar) < 0)
    assert sch.alpha_bar[0] == pytest.approx(1 - 0.00085, rel=1e-6)


@pytest.mark.skipif(not reference_available(), reason="torch/reference unavailable")
def test_beta_bitwise_parity_with_torch():
    # the reference computes in torch float64 then casts (latent_diffusion.py:90-102)
    beta_t = (
        torch.linspace(0.00085**0.5, 0.012**0.5, 1000, dtype=torch.float64) ** 2
    )
    alpha_bar_t = torch.cumprod(1.0 - beta_t, dim=0)
    sch = S.make_schedule(1000, 0.00085, 0.012)
    np.testing.assert_array_equal(sch.beta, beta_t.to(torch.float32).numpy())
    np.testing.assert_array_equal(
        sch.alpha_bar, alpha_bar_t.to(torch.float32).numpy()
    )


@pytest.mark.skipif(not reference_available(), reason="torch/reference unavailable")
def test_ddpm_sampler_tables_parity():
    """Derived tables must match SDFSampler's float32 arithmetic (sampler_sdf.py:52-78)."""
    sch = S.make_schedule(1000, 0.00085, 0.012)
    alpha_bar = torch.from_numpy(sch.alpha_bar)
    beta = torch.from_numpy(sch.beta)
    alpha_bar_prev = torch.cat([alpha_bar.new_tensor([1.0]), alpha_bar[:-1]])
    variance = beta * (1.0 - alpha_bar_prev) / (1.0 - alpha_bar)

    def ulp_close(a, b):
        # our tables are correctly rounded from float64; torch's float32 pow may be
        # 1 ulp off -- require <= 1 ulp everywhere
        np.testing.assert_array_max_ulp(a, b.numpy(), maxulp=1)

    ulp_close(sch.sqrt_alpha_bar, alpha_bar**0.5)
    ulp_close(sch.sqrt_1m_alpha_bar, (1 - alpha_bar) ** 0.5)
    ulp_close(sch.sqrt_recip_alpha_bar, alpha_bar**-0.5)
    ulp_close(sch.sqrt_recip_m1_alpha_bar, (1 / alpha_bar - 1) ** 0.5)
    ulp_close(sch.log_var, torch.log(torch.clamp(variance, min=1e-20)))
    ulp_close(sch.mean_x0_coef, beta * (alpha_bar_prev**0.5) / (1 - alpha_bar))
    ulp_close(sch.mean_xt_coef, (1 - alpha_bar_prev) * ((1 - beta) ** 0.5) / (1 - alpha_bar))


def test_ddim_tau_grids():
    sch = S.make_schedule(1000)
    dd = S.make_ddim_schedule(sch, 50, "uniform", 0.0)
    np.testing.assert_array_equal(dd.time_steps, np.arange(0, 1000, 20) + 1)
    assert dd.alpha_prev[0] == sch.alpha_bar[0]
    np.testing.assert_array_equal(dd.alpha_prev[1:], sch.alpha_bar[dd.time_steps[:-1]])
    assert np.all(dd.sigma == 0.0)

    ddq = S.make_ddim_schedule(sch, 25, "quad", 1.0)
    want = ((np.linspace(0, np.sqrt(1000 * 0.8), 25)) ** 2).astype(int) + 1
    np.testing.assert_array_equal(ddq.time_steps, want)
    assert np.all(ddq.sigma[1:] > 0)


def test_ddpm_linear_schedule():
    sch = S.make_schedule(1000, 1e-4, 0.02, kind="linear")
    assert sch.beta[0] == pytest.approx(1e-4)
    assert sch.beta[-1] == pytest.approx(0.02)
