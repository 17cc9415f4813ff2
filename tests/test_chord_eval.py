"""Exact parity of chord/eval.py against the reference's vendored mir_eval."""

import numpy as np
import pytest

from polyffusion_tpu.chord import eval as ce

from reference_oracle import REFERENCE_ROOT, add_reference_path, reference_available

pytestmark = pytest.mark.skipif(
    not reference_available(), reason="reference tree unavailable"
)


def _oracle():
    add_reference_path()
    from mir_eval import chord as oc

    return oc


# a gamut-spanning label set: triads, sevenths, extended, inversions,
# degree lists, omissions, N and X
LABELS = [
    "N", "X", "C", "C:maj", "A:min", "G:7", "E:maj7", "D:min7", "F#:dim",
    "Bb:aug", "C#:sus4", "Ab:sus2", "B:hdim7", "Db:dim7", "Eb:minmaj7",
    "G:maj6", "C:min6", "A:9", "E:maj9", "F:min9", "D:11", "B:13", "Gb:min11",
    "C:maj13", "D:min13", "C/5", "A:min/b3", "G:7/3", "E:maj7/7", "F:maj(9)",
    "C:maj(*3)", "D:min(*5,b7)", "G:(1,4,5)", "Bb:5", "C:1", "Cb:maj",
    "B#:min", "Fbb:maj7",
]


def _pairs():
    rng = np.random.default_rng(0)
    n = len(LABELS)
    ref = [LABELS[i] for i in rng.integers(0, n, 400)]
    est = [LABELS[i] for i in rng.integers(0, n, 400)]
    # plus the aligned diagonal (every label against itself and a shifted copy)
    ref += LABELS + LABELS
    est += LABELS + LABELS[1:] + LABELS[:1]
    return ref, est


@pytest.mark.parametrize(
    "name",
    ["thirds", "thirds_inv", "triads", "triads_inv", "tetrads", "tetrads_inv",
     "root", "mirex", "majmin", "majmin_inv", "sevenths", "sevenths_inv"],
)
def test_comparison_parity(name):
    oc = _oracle()
    ref, est = _pairs()
    got = getattr(ce, name)(ref, est)
    want = getattr(oc, name)(ref, est)
    np.testing.assert_array_equal(got, want, err_msg=name)


def test_encode_many_parity():
    oc = _oracle()
    r_got, s_got, b_got = ce.encode_many(LABELS)
    r_want, s_want, b_want = oc.encode_many(LABELS)
    np.testing.assert_array_equal(r_got, r_want)
    np.testing.assert_array_equal(s_got, s_want)
    np.testing.assert_array_equal(b_got, b_want)
    # wrapped-extension mode mirrors reduce_extended_chords
    r_got, s_got, b_got = ce.encode_many(LABELS, wrap_extensions=True)
    r_want, s_want, b_want = oc.encode_many(LABELS, True)
    np.testing.assert_array_equal(s_got, s_want)


def test_rotate_parity():
    oc = _oracle()
    roots, bitmaps, _ = ce.encode_many(LABELS)
    np.testing.assert_array_equal(
        ce.rotate_bitmaps_to_roots(bitmaps, roots),
        oc.rotate_bitmaps_to_roots(bitmaps, roots),
    )


def test_weighted_accuracy_parity():
    oc = _oracle()
    ref, est = _pairs()
    comps = ce.triads(ref, est)
    w = np.abs(np.random.default_rng(1).standard_normal(len(comps))) + 0.01
    assert ce.weighted_accuracy(comps, w) == pytest.approx(
        oc.weighted_accuracy(comps, w)
    )


def _intervals(rng, n, jitter):
    bounds = np.cumsum(rng.uniform(0.2, 2.0, n + 1)) + jitter
    return np.stack([bounds[:-1], bounds[1:]], axis=1)


def test_segmentation_parity():
    oc = _oracle()
    rng = np.random.default_rng(2)
    a = _intervals(rng, 20, 0.0)
    b = _intervals(rng, 25, 0.0)
    assert ce.directional_hamming_distance(a, b) == pytest.approx(
        oc.directional_hamming_distance(a, b)
    )
    assert ce.overseg(a, b) == pytest.approx(oc.overseg(a, b))
    assert ce.underseg(a, b) == pytest.approx(oc.underseg(a, b))
    assert ce.seg(a, b) == pytest.approx(oc.seg(a, b))


def test_evaluate_parity():
    oc = _oracle()
    rng = np.random.default_rng(3)
    n_ref, n_est = 30, 26
    ref_iv = _intervals(rng, n_ref, 0.0)
    est_iv = _intervals(rng, n_est, 0.3)  # misaligned span: exercises adjust
    ref_lab = [LABELS[i] for i in rng.integers(0, len(LABELS), n_ref)]
    est_lab = [LABELS[i] for i in rng.integers(0, len(LABELS), n_est)]
    got = ce.evaluate(ref_iv, ref_lab, est_iv, est_lab)
    want = oc.evaluate(ref_iv, ref_lab, est_iv, est_lab)
    assert set(got) == set(want)
    for k in want:
        assert got[k] == pytest.approx(want[k]), k


def test_merge_chord_intervals_parity():
    oc = _oracle()
    rng = np.random.default_rng(4)
    iv = _intervals(rng, 12, 0.0)
    labels = ["C", "C:maj", "A:min", "A:min", "N", "N", "A:9", "A:9", "X",
              "C/5", "C/5", "G:13"]
    np.testing.assert_allclose(
        ce.merge_chord_intervals(iv, labels), oc.merge_chord_intervals(iv, labels)
    )
