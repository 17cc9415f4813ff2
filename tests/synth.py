"""Synthetic npz song generation for tests (no real POP909 data in the environment)."""

import numpy as np

from polyffusion_tpu.data.dataset import write_song_npz


def make_song_npz(path: str, n_bars: int = 24, seed: int = 0, n_tracks: int = 3):
    """Write a synthetic multi-track song npz with notes, chords, and downbeats."""
    rng = np.random.default_rng(seed)
    n_beats = n_bars * 4
    n_bins = n_beats * 4
    tracks = []
    for t in range(n_tracks):
        n_notes = rng.integers(40, 80)
        onsets = np.sort(rng.integers(0, n_bins - 8, n_notes))
        pitches = rng.integers(36 + 12 * t, 72 + 12 * t, n_notes)
        durs = rng.integers(1, 8, n_notes)
        vels = rng.integers(60, 100, n_notes)
        tracks.append(np.stack([onsets, pitches, durs, vels, np.zeros(n_notes, np.int64)], 1))
    chord = np.zeros((n_beats, 14), np.int32)
    chord[:, 0] = rng.integers(0, 12, n_beats)
    chord[:, 1:13] = rng.integers(0, 2, (n_beats, 12))
    chord[:, 13] = chord[:, 0]
    db_pos = np.arange(0, n_bins, 16)  # a downbeat every bar
    filt = db_pos + 128 <= n_bins  # only complete 8-bar segments
    write_song_npz(path, tracks, chord, db_pos, filt, n_beats=n_beats)
    return path
