"""Parity of the PianoTree decoder vs the reference torch module (inference mode)."""

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
from dl_modules.pianotree_dec import PianoTreeDecoder as TorchDec  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from polyffusion_tpu.convert.torch_import import (  # noqa: E402
    pianotree_decoder_params_from_torch,
)
from polyffusion_tpu.models.pianotree_dec import (  # noqa: E402
    PianoTreeDecoder,
    pianotree_recon_loss,
)
from polyffusion_tpu.utils.reprs import nmat_to_pianotree_repr  # noqa: E402

SIZES = dict(
    max_simu_note=8,
    num_step=32,  # the reference's emb_x hardcodes 32 (pianotree_dec.py:130)
    note_emb_size=32,
    z_size=24,
    dec_emb_hid_size=16,
    dec_time_hid_size=48,
    dec_notes_hid_size=40,
    dec_z_in_size=20,
    dec_dur_hid_size=8,
)


@pytest.fixture(scope="module")
def pair():
    torch.manual_seed(0)
    tm = TorchDec(**SIZES)
    tm.eval()
    params = pianotree_decoder_params_from_torch(torch_state_to_numpy(tm))
    jm = PianoTreeDecoder(**SIZES)
    return tm, jm, params


def test_inference_parity(pair):
    tm, jm, params = pair
    rng = np.random.default_rng(0)
    z = rng.standard_normal((2, SIZES["z_size"])).astype(np.float32)
    with torch.no_grad():
        want_pitch, want_dur = tm(torch.from_numpy(z), True, None, None, 0.0, 0.0)
    got_pitch, got_dur = jm.apply(
        {"params": params}, jnp.asarray(z), True, None, None, 0.0, 0.0
    )
    np.testing.assert_allclose(np.asarray(got_pitch), want_pitch.numpy(), atol=1e-4)
    np.testing.assert_allclose(np.asarray(got_dur), want_dur.numpy(), atol=1e-4)


def test_training_mode_and_loss_parity(pair):
    """tfr=0 training mode: gt-embedded input path + recon loss must match."""
    tm, jm, params = pair
    # build a small pnotree gt (num_step=8, max_simu_note=8)
    nmat = np.array([[t, 40 + (3 * t) % 60, 1 + t % 4] for t in range(32)], np.int64)
    pt = nmat_to_pianotree_repr(nmat, n_step=32, max_note_count=8)[None]
    pt = np.concatenate([pt, pt], 0)

    with torch.no_grad():
        emb, lengths = tm.emb_x(torch.from_numpy(pt))
        z = torch.randn(2, SIZES["z_size"], generator=torch.Generator().manual_seed(1))
        want_pitch, want_dur = tm(z, False, emb, lengths, 0.0, 0.0)
        want_loss = tm.recon_loss(torch.from_numpy(pt), want_pitch, want_dur)

    emb_j, len_j = jm.emb_x(params, jnp.asarray(pt))
    np.testing.assert_allclose(np.asarray(emb_j), emb.numpy(), atol=1e-5)
    np.testing.assert_array_equal(np.asarray(len_j), lengths.numpy())

    got_pitch, got_dur = jm.apply(
        {"params": params}, jnp.asarray(z.numpy()), False, emb_j, len_j, 0.0, 0.0
    )
    np.testing.assert_allclose(np.asarray(got_pitch), want_pitch.numpy(), atol=1e-4)
    np.testing.assert_allclose(np.asarray(got_dur), want_dur.numpy(), atol=1e-4)

    got_loss = pianotree_recon_loss(jnp.asarray(pt), got_pitch, got_dur)
    for g, w in zip(got_loss, want_loss):
        np.testing.assert_allclose(float(g), float(w), atol=1e-5, rtol=1e-4)
