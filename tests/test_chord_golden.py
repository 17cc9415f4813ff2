"""Golden-file parity of the chord extractor on REAL music.

The reference ships the output of its own extraction pipeline on a real
multi-track pop MIDI: ``chord_extractor/example.out`` is exactly what
``python main.py ./example.mid ./example.out`` produces
(``/root/reference/polyffusion/chord_extractor/example.sh``).  That makes it a
golden oracle for this framework's from-scratch recognizer + zero-dependency
SMF reader that needs none of the reference's dependencies (pretty_midi,
mir_eval) installed.

Parity notes (each was a measured divergence before being fixed):
- the effective frame grid is BEAT-level: the reference's ``process_chord``
  builds a half-beat grid locally but ``ChordRecognition`` reads
  ``entry.beat`` = MidiBeatExtractor output at its default ``div=1``
  (``main.py:58-69``, ``extractors/midi_utilities.py:14``) — the half-beat
  grid is dead code;
- ``get_end_time()`` counts control-change / pitch-bend / meta events, not
  just note-offs (pretty_midi semantics) — a trailing CC fade extends the
  beat grid past the last note;
- channel weights come from pretty_midi-style piano rolls: velocity-summed,
  sustain-pedal running-max extension, pitch-bend shifting
  (``rule_based_channel_reweight.py:35-48``);
- percussive = ``is_drum or program > 112`` (``midi_utilities.py:172-175``);
- one note-off closes ALL open notes of that pitch except same-tick starts
  (pretty_midi pairing; zero-length notes are never emitted).
"""

import os

import numpy as np
import pytest

from polyffusion_tpu.chord.recognizer import read_chordlab, transcribe_midi
from polyffusion_tpu.utils.midi import load_midi

REF_CE = "/root/reference/polyffusion/chord_extractor"
REF_DATA_MID = "/root/reference/polyffusion/data/example.mid"

pytestmark = pytest.mark.skipif(
    not os.path.isfile(os.path.join(REF_CE, "example.out")),
    reason="reference golden files unavailable",
)


def test_golden_exact_parity(tmp_path):
    """Every (start, end, label) row of the reference's shipped extraction is
    reproduced exactly — float boundaries included."""
    ref = read_chordlab(os.path.join(REF_CE, "example.out"))
    est = transcribe_midi(os.path.join(REF_CE, "example.mid"), str(tmp_path / "est.out"))
    assert len(est) == len(ref) == 110
    for (rs, re_, rl), (es, ee, el) in zip(ref, est):
        assert el == rl
        assert abs(es - rs) < 1e-6 and abs(ee - re_) < 1e-6
    # the written chordlab file round-trips to the same rows
    back = read_chordlab(str(tmp_path / "est.out"))
    assert [r[2] for r in back] == [r[2] for r in ref]


def test_event_end_time_extends_beat_grid():
    """example.mid has a CC fade after the last note-off; the beat grid must
    run to the event end (pretty_midi get_end_time), not the last note."""
    m = load_midi(os.path.join(REF_CE, "example.mid"))
    note_end = max(n.end for ins in m.instruments for n in ins.notes)
    assert m.get_end_time() > note_end + 1.0  # ~4.4 s of trailing CCs here
    beats = m.get_beats()
    assert beats[-1] > note_end


def test_instrument_cc_and_bends_parsed():
    m = load_midi(os.path.join(REF_CE, "example.mid"))
    assert any(ins.control_changes for ins in m.instruments)
    assert any(ins.pitch_bends for ins in m.instruments)
    # pitch bend values are signed pretty_midi-convention ints
    bends = [b.pitch for ins in m.instruments for b in ins.pitch_bends]
    assert min(bends) >= -8192 and max(bends) <= 8191


@pytest.mark.skipif(not os.path.isfile(REF_DATA_MID), reason="reference data example unavailable")
def test_from_midi_ingestion_on_real_music():
    """The --from_midi ingestion path (reference inference_sdf.py --from_midi ->
    get_data_for_single_midi, data/midi_to_data.py:219) runs end-to-end on the
    reference's own demo MIDI and yields a well-formed training dict."""
    from polyffusion_tpu.data.midi_to_data import get_data_for_single_midi

    data = get_data_for_single_midi(REF_DATA_MID)
    assert data is not None
    assert data["notes"].shape[1] == 5 and len(data["notes"]) > 0  # onset/pitch/dur/vel/prog
    assert data["chord"].shape[1] == 14 and len(data["chord"]) > 0
    # chord roots/bass in range, chroma bitmaps binary
    assert data["chord"][:, 0].max() < 12 and data["chord"][:, 13].max() < 12
    assert set(np.unique(data["chord"][:, 1:13])) <= {0.0, 1.0}
    assert len(data["db_pos"]) == len(data["db_pos_filter"]) > 0
