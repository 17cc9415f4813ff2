"""Round-trip tests for the dependency-free MIDI codec and representation writers."""

import numpy as np

from polyffusion_tpu.utils import midi as M
from polyffusion_tpu.utils import midi_io, reprs


def test_midi_write_read_roundtrip(tmp_path):
    ins = M.Instrument(program=0)
    notes = [(0.0, 0.5, 60), (0.5, 1.0, 64), (1.0, 2.0, 67), (1.0, 1.125, 72)]
    for s, e, p in notes:
        ins.notes.append(M.Note(s, e, p, 80))
    mf = M.MidiFile(instruments=[ins], time_signatures=[M.TimeSignature(4, 4, 0.0)])
    path = str(tmp_path / "t.mid")
    M.save_midi(mf, path)

    back = M.load_midi(path)
    assert len(back.instruments) == 1
    got = [(n.start, n.end, n.pitch) for n in back.instruments[0].notes]
    for (s, e, p), (gs, ge, gp) in zip(sorted(notes), sorted(got)):
        assert abs(s - gs) < 1e-3 and abs(e - ge) < 1e-3 and p == gp


def test_beats_and_downbeats(tmp_path):
    ins = M.Instrument()
    ins.notes.append(M.Note(0.0, 8.0, 60, 80))
    mf = M.MidiFile(instruments=[ins], time_signatures=[M.TimeSignature(4, 4, 0.0)])
    path = str(tmp_path / "t.mid")
    M.save_midi(mf, path)
    back = M.load_midi(path)
    beats = back.get_beats()
    # 120 bpm -> beat every 0.5 s over 8 s
    assert len(beats) == 16
    np.testing.assert_allclose(beats, np.arange(16) * 0.5, atol=1e-6)
    downbeats = back.get_downbeats()
    np.testing.assert_allclose(downbeats, np.arange(4) * 2.0, atol=1e-6)


def test_tempo_change_mapping(tmp_path):
    # hand-build a file with a mid-track tempo change and verify second mapping
    import struct

    def varlen(v):
        out = [v & 0x7F]
        v >>= 7
        while v:
            out.append((v & 0x7F) | 0x80)
            v >>= 7
        return bytes(reversed(out))

    tpb = 480
    track = bytearray()
    track += varlen(0) + b"\xff\x51\x03" + (500000).to_bytes(3, "big")  # 120bpm
    track += varlen(0) + bytes([0x90, 60, 80])
    track += varlen(tpb) + bytes([0x80, 60, 0])  # 1 beat at 120bpm = 0.5s
    track += varlen(0) + b"\xff\x51\x03" + (250000).to_bytes(3, "big")  # 240bpm
    track += varlen(0) + bytes([0x90, 62, 80])
    track += varlen(tpb) + bytes([0x80, 62, 0])  # 1 beat at 240bpm = 0.25s
    track += varlen(0) + b"\xff\x2f\x00"
    data = b"MThd" + struct.pack(">IHHH", 6, 0, 1, tpb)
    data += b"MTrk" + struct.pack(">I", len(track)) + bytes(track)
    path = str(tmp_path / "tempo.mid")
    with open(path, "wb") as f:
        f.write(data)

    back = M.load_midi(path)
    got = sorted((n.pitch, n.start, n.end) for i in back.instruments for n in i.notes)
    assert got[0] == (60, 0.0, 0.5)
    assert abs(got[1][1] - 0.5) < 1e-9 and abs(got[1][2] - 0.75) < 1e-9


def test_prmat2c_midi_roundtrip(tmp_path):
    nmat = np.array([[0, 60, 4], [8, 64, 2], [16, 67, 8]], np.int64)
    img = reprs.nmat_to_prmat2c(nmat, 128)[None]
    path = str(tmp_path / "roll.mid")
    midi_io.prmat2c_to_midi_file(img, path)
    back = M.load_midi(path)
    nmat_back = midi_io.nmat_from_midi_seconds(back)
    np.testing.assert_array_equal(nmat_back, nmat)


def test_estx_writer(tmp_path):
    nmat = np.array([[0, 60, 4], [2, 72, 2]], np.int64)
    pt = reprs.nmat_to_pianotree_repr(nmat, n_step=32)[None]
    path = str(tmp_path / "pt.mid")
    midi_io.estx_to_midi_file(pt, path, labels=["seg0"])
    back = M.load_midi(path)
    nmat_back = midi_io.nmat_from_midi_seconds(back)
    np.testing.assert_array_equal(nmat_back, nmat)
    assert back.lyrics and back.lyrics[0].text == "seg0"


def test_chd_writer(tmp_path):
    chd = np.zeros((1, 32, 14), np.int64)
    chd[:, :, 1] = 1  # root-position chroma bit 0
    midi_io.chd_to_midi_file(chd, str(tmp_path / "chd.mid"))
    back = M.load_midi(str(tmp_path / "chd.mid"))
    assert len(back.instruments[0].notes) == 32


def test_zero_length_note_dropped_like_pretty_midi(tmp_path):
    """A note-off that closes NOTHING (all open notes of that pitch started on
    the same tick) must DROP those notes, exactly like pretty_midi's pairing
    (`if notes_to_close and notes_to_keep: keep else: del`).  Keeping them open
    made a later note-off emit a phantom long note spanning from the
    zero-length note's tick (review finding, round 4)."""
    import struct

    def varlen(v):
        out = [v & 0x7F]
        v >>= 7
        while v:
            out.append((v & 0x7F) | 0x80)
            v >>= 7
        return bytes(reversed(out))

    tpb = 480
    track = bytearray()
    track += varlen(0) + bytes([0x90, 60, 80])   # on  @ tick 0
    track += varlen(0) + bytes([0x80, 60, 0])    # off @ tick 0 (zero-length)
    track += varlen(100) + bytes([0x90, 60, 90]) # on  @ tick 100
    track += varlen(100) + bytes([0x80, 60, 0])  # off @ tick 200
    track += varlen(0) + b"\xff\x2f\x00"
    data = b"MThd" + struct.pack(">IHHH", 6, 0, 1, tpb)
    data += b"MTrk" + struct.pack(">I", len(track)) + bytes(track)
    path = str(tmp_path / "zerolen.mid")
    with open(path, "wb") as f:
        f.write(data)

    back = M.load_midi(path)
    notes = [n for i in back.instruments for n in i.notes]
    assert [(n.pitch, n.start_tick, n.end_tick) for n in notes] == [(60, 100, 200)]


def test_same_tick_off_on_retrigger_keeps_new_note(tmp_path):
    """When an off closes an older note AND a new note started on the same
    tick, the same-tick note stays open (pretty_midi keeps it)."""
    import struct

    def varlen(v):
        out = [v & 0x7F]
        v >>= 7
        while v:
            out.append((v & 0x7F) | 0x80)
            v >>= 7
        return bytes(reversed(out))

    tpb = 480
    track = bytearray()
    track += varlen(0) + bytes([0x90, 64, 80])    # on  @ 0
    track += varlen(100) + bytes([0x90, 64, 90])  # retrigger on @ 100
    track += varlen(0) + bytes([0x80, 64, 0])     # off @ 100: closes the @0 note
    track += varlen(100) + bytes([0x80, 64, 0])   # off @ 200: closes the @100 note
    track += varlen(0) + b"\xff\x2f\x00"
    data = b"MThd" + struct.pack(">IHHH", 6, 0, 1, tpb)
    data += b"MTrk" + struct.pack(">I", len(track)) + bytes(track)
    path = str(tmp_path / "retrigger.mid")
    with open(path, "wb") as f:
        f.write(data)

    back = M.load_midi(path)
    notes = sorted(
        (n.pitch, n.start_tick, n.end_tick)
        for i in back.instruments
        for n in i.notes
    )
    assert notes == [(64, 0, 100), (64, 100, 200)]
