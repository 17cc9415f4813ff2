"""Chord codec / template / recognizer / data-prep tests."""

import numpy as np
import pytest

from polyffusion_tpu.chord import encode as E  # noqa: shadowed submodule
import importlib
E = importlib.import_module("polyffusion_tpu.chord.encode")
from polyffusion_tpu.chord.templates import ChordTemplates
from polyffusion_tpu.chord.recognizer import (
    ChordRecognizer,
    chord_matrix_from_chordlab,
    transcribe_midi,
)
from polyffusion_tpu.utils.midi import Instrument, MidiFile, Note, TimeSignature, save_midi

from reference_oracle import REFERENCE_ROOT, reference_available


@pytest.fixture(scope="module")
def templates():
    return ChordTemplates()


def make_chord_midi(tmpdir, progression, beats_per_chord=4, one_beat=0.5):
    """Write a MIDI playing block chords (pitch sets) for `beats_per_chord` each."""
    ins = Instrument(program=0)
    t = 0.0
    for pitches in progression:
        for p in pitches:
            ins.notes.append(Note(t, t + beats_per_chord * one_beat, p, 80))
        t += beats_per_chord * one_beat
    mf = MidiFile(instruments=[ins], time_signatures=[TimeSignature(4, 4, 0.0, 0)])
    path = str(tmpdir / "chords.mid")
    save_midi(mf, path)
    return path


# ---------------------------------------------------------------------------
# label codec
# ---------------------------------------------------------------------------


def test_encode_basics():
    root, bitmap, bass = E.encode("C:maj")
    assert root == 0 and bass == 0
    np.testing.assert_array_equal(bitmap, [1, 0, 0, 0, 1, 0, 0, 1, 0, 0, 0, 0])
    root, bitmap, bass = E.encode("Eb:maj7/3")
    assert root == 3 and bass == 4
    root, bitmap, bass = E.encode("N")
    assert root == -1 and bass == -1 and bitmap.sum() == 0


@pytest.mark.skipif(not reference_available(), reason="reference unavailable")
def test_encode_parity_full_vocabulary(templates):
    import sys

    sys.path.insert(0, REFERENCE_ROOT)
    from mir_eval import chord as ref_chord

    extra = ["C", "G#:min(*b3,*5)/5", "A:(3)/6", "Gbb:7", "F##:min9", "B:sus2/2"]
    for label in templates.chord_list + extra:
        want = ref_chord.encode(label)
        got = E.encode(label)
        assert got[0] == want[0], label
        np.testing.assert_array_equal(got[1], want[1], err_msg=label)
        assert got[2] == want[2], label


# ---------------------------------------------------------------------------
# template bank
# ---------------------------------------------------------------------------


@pytest.mark.skipif(not reference_available(), reason="reference unavailable")
def test_template_bank_parity(templates, rng):
    import sys

    sys.path.insert(0, REFERENCE_ROOT + "/chord_extractor")
    from chord_class import ChordClass

    ref = ChordClass()
    assert templates.chord_list == ref.chord_list
    np.testing.assert_array_equal(templates.chroma_templates, ref.chroma_templates)
    np.testing.assert_array_equal(templates.bass_templates, ref.bass_templates)

    chromas = rng.random((40, 12)) * 3
    basses = rng.random((40, 12))
    want = ref.batch_score(chromas, basses)
    got = templates.batch_score(chromas, basses)
    np.testing.assert_allclose(got, want, atol=1e-9)


def test_template_count(templates):
    from polyffusion_tpu.chord.templates import INVERSIONS, RECOGNIZER_QUALITIES

    n_inv = sum(map(len, INVERSIONS.values()))
    assert len(templates) == 1 + 12 * (len(RECOGNIZER_QUALITIES) + n_inv) == 529


# ---------------------------------------------------------------------------
# recognizer end-to-end (behavioral)
# ---------------------------------------------------------------------------


def test_recognize_simple_progression(tmp_path):
    C, F, G = [60, 64, 67], [53, 57, 60], [55, 59, 62]
    path = make_chord_midi(tmp_path, [C, C, F, F, G, G, C, C])
    rows = transcribe_midi(path, str(tmp_path / "out.lab"))
    assert rows, "no chords recognized"
    # coverage: labels at the right times
    def label_at(t):
        for s, e, lab in rows:
            if s <= t < e:
                return lab
        return None

    assert label_at(0.5) == "C:maj"
    assert label_at(5.0) == "F:maj"
    assert label_at(9.0) == "G:maj"
    assert label_at(13.0) == "C:maj"


def test_chord_matrix_from_chordlab():
    rows = [(0.0, 2.0, "C:maj"), (2.0, 4.0, "A:min/5")]
    mat = chord_matrix_from_chordlab(rows, one_beat=0.5)
    assert mat.shape == (8, 14)
    assert mat[0, 0] == 0  # C root
    assert mat[4, 0] == 9  # A root
    assert mat[4, 13] == (7 + 9) % 12  # absolute bass E


def test_recognizer_inversion_bass(tmp_path):
    # C major with E in the bass for 8 beats -> C:maj/3 preferred
    path = make_chord_midi(tmp_path, [[52, 60, 64, 67]] * 2, beats_per_chord=4)
    rows = transcribe_midi(path)
    assert any(lab == "C:maj/3" for _, _, lab in rows), rows


# ---------------------------------------------------------------------------
# midi -> data dict -> segments
# ---------------------------------------------------------------------------


def test_midi_to_data_roundtrip(tmp_path):
    from polyffusion_tpu.data.midi_to_data import get_data_for_single_midi, song_from_midi

    rng = np.random.default_rng(0)
    ins = Instrument(program=0)
    # 10 bars of random notes on the 16th grid
    for k in range(160):
        t = k * 0.125
        ins.notes.append(Note(t, t + 0.25, int(rng.integers(48, 84)), 80))
    mf = MidiFile(instruments=[ins], time_signatures=[TimeSignature(4, 4, 0.0, 0)])
    path = str(tmp_path / "song.mid")
    save_midi(mf, path)

    data = get_data_for_single_midi(path)
    assert data is not None
    assert data["notes"].shape[1] == 5
    assert data["db_pos"][1] - data["db_pos"][0] == 16  # 4/4 bar = 16 bins
    assert data["db_pos_filter"][:2].all()
    assert data["chord"].shape[1] == 14

    song = song_from_midi(path)
    p2c, pt, chd, pr = song[0]
    assert p2c.shape == (2, 128, 128)
    assert p2c[0].sum() > 0
    assert chd.shape == (32, 14)


def test_prepare_data_cli(tmp_path):
    from polyffusion_tpu.prepare_data import prepare_npz
    from polyffusion_tpu.data import SegmentDataset

    midi_dir = tmp_path / "midis"
    midi_dir.mkdir()
    rng = np.random.default_rng(1)
    for i in range(2):
        ins = Instrument(program=0)
        for k in range(120):
            t = k * 0.25
            ins.notes.append(Note(t, t + 0.5, int(rng.integers(40, 90)), 80))
        mf = MidiFile(instruments=[ins], time_signatures=[TimeSignature(4, 4, 0.0, 0)])
        save_midi(mf, str(midi_dir / f"s{i}.mid"))

    npz_dir = tmp_path / "npz"
    counts = prepare_npz(str(midi_dir), str(npz_dir))
    assert counts["ok"] == 2
    ds = SegmentDataset.from_dir(str(npz_dir))
    assert len(ds) > 0
    p2c, pt, chd, pr = ds[0]
    assert p2c.shape == (2, 128, 128)


def test_recognizer_multitrack_with_drums(tmp_path):
    """Channel reweighting: bass channel forced to weight 1, drums ignored."""
    from polyffusion_tpu.utils.midi import Instrument, MidiFile, Note, TimeSignature, save_midi

    melody = Instrument(program=0)
    bass = Instrument(program=32)
    drums = Instrument(program=0, is_drum=True)
    for beat in range(16):
        t = beat * 0.5
        melody.notes.append(Note(t, t + 0.5, 64 + (beat % 3), 80))  # E area
        bass.notes.append(Note(t, t + 0.5, 36, 90))  # low C
        drums.notes.append(Note(t, t + 0.1, 40, 100))
    for beat in range(16):  # sustained C major triad in the melody channel
        t = beat * 0.5
        for p in (60, 64, 67):
            melody.notes.append(Note(t, t + 0.5, p, 70))
    mf = MidiFile(
        instruments=[melody, bass, drums],
        time_signatures=[TimeSignature(4, 4, 0.0, 0)],
    )
    path = str(tmp_path / "band.mid")
    save_midi(mf, path)
    rows = transcribe_midi(path)
    assert rows
    # C in the bass should pull the root/bass toward C
    labels = [lab for _, _, lab in rows]
    assert any(lab.startswith("C:") for lab in labels), labels
