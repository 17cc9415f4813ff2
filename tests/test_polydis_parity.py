"""Parity of the PolyDis disentangled VAE vs the reference (converted weights)."""

import numpy as np
import pytest

from reference_oracle import (
    add_reference_path,
    reference_available,
    stub_pretty_midi,
    torch_state_to_numpy,
)

if not reference_available():
    pytest.skip("torch/reference unavailable", allow_module_level=True)

import torch  # noqa: E402

add_reference_path()
stub_pretty_midi()

from polydis.model import DisentangleVAE  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from polyffusion_tpu.models.polydis import PolyDis  # noqa: E402
from polyffusion_tpu.utils.reprs import chd_to_onehot, nmat_to_prmat  # noqa: E402


@pytest.fixture(scope="module")
def pair(tmp_path_factory):
    torch.manual_seed(0)
    tm = DisentangleVAE.init_model()
    tm.eval()
    # route the torch state dict through a temp file to exercise the loader path
    path = str(tmp_path_factory.mktemp("polydis") / "model.pt")
    torch.save({("module." + k): v for k, v in tm.state_dict().items()}, path)
    jm = PolyDis()
    params = jm.params_from_torch_file(path)
    return tm, jm, params


def make_inputs(rng):
    nmat = np.array([[t, 48 + (t * 5) % 36, 1 + t % 4] for t in range(32)], np.int64)
    prmat = nmat_to_prmat(nmat, 32).astype(np.float32)[None]
    chd = np.zeros((8, 14), np.int64)
    chd[:, 0] = rng.integers(0, 12, 8)
    chd[:, 1:13] = rng.integers(0, 2, (8, 12))
    chd[:, 13] = chd[:, 0]
    c = chd_to_onehot(chd)[None]
    return prmat, c


def test_encoder_dist_parity(pair, rng):
    tm, jm, params = pair
    prmat, c = make_inputs(rng)
    with torch.no_grad():
        dist_chd, dist_rhy = tm.inference_encode(
            torch.from_numpy(prmat), torch.from_numpy(c)
        )
    (mu_c, std_c), (mu_r, std_r) = jm.encode(params, jnp.asarray(prmat), jnp.asarray(c))
    np.testing.assert_allclose(np.asarray(mu_c), dist_chd.mean.numpy(), atol=1e-4)
    np.testing.assert_allclose(np.asarray(mu_r), dist_rhy.mean.numpy(), atol=1e-4)
    np.testing.assert_allclose(np.asarray(std_c), dist_chd.stddev.numpy(), atol=1e-4, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(std_r), dist_rhy.stddev.numpy(), atol=1e-4, rtol=1e-4)


def test_inference_grid_parity(pair, rng):
    """Deterministic inference (mean z): the decoded note grids should agree.

    The decode involves long argmax-feedback chains, so isolated flips from 1e-6
    logit differences are possible; require near-total agreement.
    """
    tm, jm, params = pair
    prmat, c = make_inputs(rng)
    with torch.no_grad():
        want = tm.inference(
            torch.from_numpy(prmat), torch.from_numpy(c), sample=False
        )
    got = jm.inference(params, prmat, c, sample=False)
    agree = (got == want).mean()
    assert agree > 0.98, f"grid agreement only {agree:.3f}"


def test_swap_and_interp_shapes(pair, rng):
    _, jm, params = pair
    prmat, c = make_inputs(rng)
    prmat2, c2 = make_inputs(np.random.default_rng(7))
    out = jm.swap(params, prmat, prmat2, c, c2, fix_rhy=True, fix_chd=False)
    assert out.shape == (1, 32, 31, 6)
    morphs = jm.interp(params, prmat, c, prmat2, c2, interp_chd=True, int_count=3)
    assert morphs.shape == (1, 3, 32, 31, 6)


def test_polydis_loss_runs(pair, rng):
    _, jm, params = pair
    prmat, c = make_inputs(rng)
    from polyffusion_tpu.utils.reprs import nmat_to_pianotree_repr

    nmat = np.array([[t, 48 + (t * 5) % 36, 1 + t % 4] for t in range(32)], np.int64)
    x = nmat_to_pianotree_repr(nmat, n_step=32, max_note_count=32)[None]
    total, metrics = jm.loss(
        params, jnp.asarray(x), jnp.asarray(c), jnp.asarray(prmat),
        jax.random.PRNGKey(0), tfr1=0.5, tfr2=0.5, tfr3=0.5,
    )
    assert np.isfinite(float(total))
    assert set(metrics) >= {"recon", "kl", "chord"}
