"""Numerical parity of the GRU conditioning encoders vs the reference torch modules."""

import numpy as np
import pytest

from reference_oracle import add_reference_path, reference_available, torch_state_to_numpy

if not reference_available():
    pytest.skip("torch/reference unavailable", allow_module_level=True)

import torch  # noqa: E402

from reference_oracle import stub_pretty_midi  # noqa: E402

add_reference_path()
stub_pretty_midi()
from dl_modules.chord_enc import RnnEncoder as TorchChordEnc  # noqa: E402
from dl_modules.chord_dec import ChordDecoder as TorchChordDec  # noqa: E402
from dl_modules.txt_enc import TextureEncoder as TorchTxtEnc  # noqa: E402
from dl_modules.pianotree_enc import PianoTreeEncoder as TorchPnoTreeEnc  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from polyffusion_tpu.convert import (  # noqa: E402
    chord_decoder_params_from_torch,
    chord_encoder_params_from_torch,
    pianotree_encoder_params_from_torch,
    texture_encoder_params_from_torch,
)
from polyffusion_tpu.models.encoders import (  # noqa: E402
    ChordDecoder,
    ChordEncoder,
    PianoTreeEncoder,
    TextureEncoder,
    chord_recon_loss,
)
from polyffusion_tpu.utils.reprs import chd_to_onehot, nmat_to_pianotree_repr  # noqa: E402


def test_chord_encoder_parity(rng):
    torch.manual_seed(0)
    tm = TorchChordEnc(36, 128, 64)
    chord = rng.standard_normal((3, 32, 36)).astype(np.float32)
    with torch.no_grad():
        dist = tm(torch.from_numpy(chord))
    params = chord_encoder_params_from_torch(torch_state_to_numpy(tm))
    jm = ChordEncoder(hidden_dim=128, z_dim=64)
    mu, std = jm.apply({"params": params}, jnp.asarray(chord))
    np.testing.assert_allclose(np.asarray(mu), dist.mean.numpy(), atol=2e-5)
    np.testing.assert_allclose(np.asarray(std), dist.stddev.numpy(), atol=2e-5, rtol=1e-5)


def test_chord_decoder_parity_inference(rng):
    # bs=1: the reference's cross-batch feedback pollution bug (chord_dec.py:57-63)
    # is a no-op, so trajectories must match exactly
    torch.manual_seed(1)
    tm = TorchChordDec(36, 64, 128, 32, n_step=8)
    z = rng.standard_normal((1, 32)).astype(np.float32)
    with torch.no_grad():
        r_root, r_chroma, r_bass = tm(torch.from_numpy(z), inference=True, tfr=0.0)

    params = chord_decoder_params_from_torch(torch_state_to_numpy(tm))
    jm = ChordDecoder(input_dim=36, z_input_dim=64, hidden_dim=128, z_dim=32, n_step=8)
    g_root, g_chroma, g_bass = jm.apply(
        {"params": params}, jnp.asarray(z), True, 0.0, None
    )
    np.testing.assert_allclose(np.asarray(g_root), r_root.numpy(), atol=3e-5)
    np.testing.assert_allclose(np.asarray(g_chroma), r_chroma.numpy(), atol=3e-5)
    np.testing.assert_allclose(np.asarray(g_bass), r_bass.numpy(), atol=3e-5)


def test_chord_decoder_recon_loss_parity(rng):
    torch.manual_seed(2)
    tm = TorchChordDec(36, 64, 128, 32, n_step=8)
    chd = np.zeros((1, 8, 14), np.int64)
    chd[:, :, 0] = rng.integers(0, 12, (1, 8))
    chd[:, :, 1:13] = rng.integers(0, 2, (1, 8, 12))
    chd[:, :, 13] = rng.integers(0, 12, (1, 8))
    onehot = np.stack([chd_to_onehot(c) for c in chd])
    z = rng.standard_normal((1, 32)).astype(np.float32)
    with torch.no_grad():
        r_root, r_chroma, r_bass = tm(torch.from_numpy(z), inference=True, tfr=0.0)
        want = tm.recon_loss(
            torch.from_numpy(onehot), r_root, r_chroma, r_bass
        )

    params = chord_decoder_params_from_torch(torch_state_to_numpy(tm))
    jm = ChordDecoder(input_dim=36, z_input_dim=64, hidden_dim=128, z_dim=32, n_step=8)
    g_root, g_chroma, g_bass = jm.apply(
        {"params": params}, jnp.asarray(z), True, 0.0, None
    )
    got = chord_recon_loss(jnp.asarray(onehot), g_root, g_chroma, g_bass)
    for g, w in zip(got, want):
        np.testing.assert_allclose(float(g), float(w), atol=1e-5, rtol=1e-5)


def test_texture_encoder_parity(rng):
    torch.manual_seed(3)
    tm = TorchTxtEnc(64, 128, 32, 10)
    pr = (rng.random((2, 32, 128)) < 0.05).astype(np.float32) * rng.integers(
        1, 8, (2, 32, 128)
    ).astype(np.float32)
    with torch.no_grad():
        dist = tm(torch.from_numpy(pr))
    params = texture_encoder_params_from_torch(torch_state_to_numpy(tm))
    jm = TextureEncoder(emb_size=64, hidden_dim=128, z_dim=32, num_channel=10)
    mu, std = jm.apply({"params": params}, jnp.asarray(pr))
    np.testing.assert_allclose(np.asarray(mu), dist.mean.numpy(), atol=3e-5)
    np.testing.assert_allclose(np.asarray(std), dist.stddev.numpy(), atol=3e-5, rtol=1e-5)


def test_pianotree_encoder_parity(rng):
    torch.manual_seed(4)
    tm = TorchPnoTreeEnc(
        max_simu_note=20,
        note_emb_size=32,
        enc_notes_hid_size=16,
        enc_time_hid_size=24,
        z_size=48,
    )
    nmat = np.array(
        [[t, 40 + (t * 7) % 60, 1 + t % 6] for t in range(0, 32)]
        + [[t, 45 + (t * 5) % 50, 2] for t in range(0, 32, 2)],
        np.int64,
    )
    pt = nmat_to_pianotree_repr(nmat, n_step=32)[None]
    pt = np.concatenate([pt, pt], axis=0)
    with torch.no_grad():
        dist, _, _ = tm(torch.from_numpy(pt))
    params = pianotree_encoder_params_from_torch(torch_state_to_numpy(tm))
    jm = PianoTreeEncoder(
        note_emb_size=32, enc_notes_hid_size=16, enc_time_hid_size=24, z_size=48
    )
    mu, std = jm.apply({"params": params}, jnp.asarray(pt))
    np.testing.assert_allclose(np.asarray(mu), dist.mean.numpy(), atol=3e-5)
    np.testing.assert_allclose(np.asarray(std), dist.stddev.numpy(), atol=3e-5, rtol=1e-5)
