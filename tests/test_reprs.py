"""Unit tests for representation codecs (vs. straightforward loop oracles + round-trips)."""

import numpy as np
import pytest

from polyffusion_tpu.utils import reprs


def random_nmat(rng, n_notes=60, n_step=128):
    onset = rng.integers(0, n_step, n_notes)
    pitch = rng.integers(20, 108, n_notes)
    dur = rng.integers(1, 16, n_notes)
    return np.stack([onset, pitch, dur], axis=1).astype(np.int64)


def loop_prmat2c(nmat, n_step):
    pr = np.zeros((2, n_step, 128), np.float32)
    for o, p, d in nmat:
        if o < n_step:
            pr[0, o, p] = 1.0
            for dd in range(1, d):
                if o + dd < n_step:
                    pr[1, o + dd, p] = 1.0
    return pr


def test_nmat_to_prmat2c_matches_loop_oracle(rng):
    for _ in range(5):
        nmat = random_nmat(rng)
        got = reprs.nmat_to_prmat2c(nmat, 128)
        np.testing.assert_array_equal(got, loop_prmat2c(nmat, 128))


def test_nmat_to_prmat2c_multitrack(rng):
    tracks = [random_nmat(rng, 20), random_nmat(rng, 20), random_nmat(rng, 20)]
    got = reprs.nmat_to_prmat2c(tracks, 128, use_track=[0, 2])
    want = np.maximum(loop_prmat2c(tracks[0], 128), loop_prmat2c(tracks[2], 128))
    np.testing.assert_array_equal(got, want)


def test_nmat_to_prmat2c_empty():
    assert reprs.nmat_to_prmat2c(np.zeros((0, 3)), 32).sum() == 0


def test_prmat_roundtrip(rng):
    nmat = random_nmat(rng)
    pr = reprs.nmat_to_prmat(nmat, 128)
    # every note lands with its duration (last-wins for collisions, same as reference loop)
    want = np.zeros((128, 128), np.int64)
    for o, p, d in nmat:
        if o < 128:
            want[o, p] = d
    np.testing.assert_array_equal(pr, want)


def test_prmat2c_to_nmat_roundtrip(rng):
    # construct collision-free notes fully inside the segment
    onsets = np.arange(0, 120, 4)
    pitches = rng.integers(30, 100, onsets.size)
    durs = rng.integers(1, 4, onsets.size)
    nmat = np.stack([onsets, pitches, durs], 1).astype(np.int64)
    img = reprs.nmat_to_prmat2c(nmat, 128)
    back = reprs.prmat2c_to_nmat(img)
    np.testing.assert_array_equal(
        np.array(sorted(map(tuple, back))), np.array(sorted(map(tuple, nmat)))
    )


def test_prmat2c_to_prmat_durations():
    nmat = np.array([[0, 60, 4], [10, 62, 1], [30, 64, 10]], np.int64)
    img = reprs.nmat_to_prmat2c(nmat, 32)[None]
    pr = reprs.prmat2c_to_prmat(img, 32)
    assert pr.shape == (1, 32, 128)
    assert pr[0, 0, 60] == 4
    assert pr[0, 10, 62] == 1
    assert pr[0, 30, 64] == 2  # truncated at segment end


def test_pianotree_roundtrip(rng):
    # at most a few notes per step so the 20-slot limit is never hit
    nmat = np.array([[t, 40 + (t % 30), 1 + (t % 8)] for t in range(0, 32, 2)], np.int64)
    pt = reprs.nmat_to_pianotree_repr(nmat, n_step=32)
    assert pt.shape == (32, 20, 6)
    assert (pt[:, 0, 0] == reprs.PITCH_SOS).all()
    back = reprs.pnotree_to_nmat(pt)
    capped = nmat.copy()
    capped[:, 2] = np.minimum(capped[:, 2], 32)
    np.testing.assert_array_equal(back, capped)


def test_pianotree_duration_bits():
    pt = reprs.nmat_to_pianotree_repr(np.array([[0, 60, 4]]), n_step=4)
    np.testing.assert_array_equal(pt[0, 1, 1:], [0, 0, 0, 1, 1])  # d=4 -> '00011'
    assert pt[0, 1, 0] == 60
    assert pt[0, 2, 0] == reprs.PITCH_EOS


def test_integrity_metric():
    good = reprs.nmat_to_prmat2c(np.array([[0, 60, 4]]), 32)[None]
    assert reprs.check_prmat2c_integrity(good) == 0.0
    bad = good.copy()
    bad[0, 1, 20, 70] = 1.0  # orphan sustain
    val = reprs.check_prmat2c_integrity(bad)
    assert val == pytest.approx(1 / 2)  # 1 err, 1 valid onset


def test_density_classes():
    img = np.zeros((2, 128, 128), np.float32)
    assert reprs.compute_prmat2c_density(img) == 0
    img[0, :, :2] = 1.0  # 256/16384 ≈ 0.0156
    assert reprs.compute_prmat2c_density(img) == 3


def test_pitch_shift_equivariance(rng):
    nmat = random_nmat(rng)
    img = reprs.nmat_to_prmat2c(nmat, 128)
    shifted_img = reprs.pr_mat_pitch_shift(img, 3)
    nmat_shift = nmat.copy()
    nmat_shift[:, 1] += 3
    np.testing.assert_array_equal(shifted_img, reprs.nmat_to_prmat2c(nmat_shift, 128))


def test_pianotree_pitch_shift():
    pt = reprs.nmat_to_pianotree_repr(np.array([[0, 60, 2]]), n_step=4)
    shifted = reprs.pianotree_pitch_shift(pt, -2)
    assert shifted[0, 1, 0] == 58
    assert shifted[0, 0, 0] == reprs.PITCH_SOS  # specials untouched


def test_chd_onehot_roundtrip(rng):
    chd = np.zeros((32, 14), np.int32)
    chd[:, 0] = rng.integers(0, 12, 32)
    chd[:, 1:13] = rng.integers(0, 2, (32, 12))
    chd[:, 13] = rng.integers(0, 12, 32)
    oh = reprs.chd_to_onehot(chd)
    assert oh.shape == (32, 36)
    back = reprs.onehot_to_chd(oh)
    np.testing.assert_array_equal(back.astype(np.int32), chd)


def test_chd_pitch_shift_wraps():
    chd = np.zeros((1, 14), np.int64)
    chd[0, 0] = 11
    chd[0, 1] = 1
    chd[0, 13] = 11
    out = reprs.chd_pitch_shift(chd, 2)
    assert out[0, 0] == 1 and out[0, 13] == 1
    assert out[0, 3] == 1  # chroma rolled by 2


def test_normalize_denormalize(rng):
    pr = reprs.nmat_to_prmat(random_nmat(rng), 128)
    np.testing.assert_array_equal(
        reprs.denormalize_prmat(reprs.normalize_prmat(pr)), pr
    )
