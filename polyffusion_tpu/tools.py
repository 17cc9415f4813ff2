"""Maintenance tools and corpus converters.

    python -m polyffusion_tpu.tools pop909_import --origin <POP09-PIANOROLL-4-bin> --out <npz dir>
    python -m polyffusion_tpu.tools cleanup_checkpoints --result_dir result [--yes]
    python -m polyffusion_tpu.tools remove_from_split --split <pickle> --song <fn>.npz

Counterparts of the reference's ``data/polydis_format_to_mine.py``,
``cleanup_checkpoints.py`` and ``remove_pickle.py``.
"""

from __future__ import annotations

import argparse
import os
import pickle
import shutil

import numpy as np

BIN = 4
BEAT = 4
SEG_LGTH = 32


# ---------------------------------------------------------------------------
# POP909 piano-roll release -> npz (reference data/polydis_format_to_mine.py)
# ---------------------------------------------------------------------------


def _track_note_matrix(mats) -> list:
    """(onset_beat, onset_bin, bin, offset_beat, offset_bin, bin, pitch, vel) rows."""
    notes = []
    for mat in mats:
        assert mat[2] == mat[5] == BIN
        onset = int(mat[0]) * BIN + int(mat[1])
        offset = int(mat[3]) * BIN + int(mat[4])
        dur = offset - onset
        if dur > 0:
            notes.append([onset, int(mat[6]), dur, int(mat[7]), 0])
    notes.sort(key=lambda x: (x[0], x[1], x[2]))
    return notes


def _downbeats_from_beat_table(beats) -> tuple:
    """beat rows: [..., ..., ..., in-bar position, ...]; position 0 = downbeat."""
    db_pos = [i * BIN for i, beat in enumerate(beats) if beat[3] == 0]
    db_filter = []
    for idx, db in enumerate(db_pos):
        ok = (
            idx + (SEG_LGTH / BEAT) <= len(db_pos)
            and db_pos[idx + 1] - db == BEAT * BIN
        )
        db_filter.append(bool(ok))
    return db_pos, db_filter


def _start_table(notes, db_pos) -> dict:
    row = 0
    table = {}
    for db in db_pos:
        while row < len(notes) and notes[row][0] < db:
            row += 1
        table[db] = row
    return table


def pop909_import(origin_dir: str, out_dir: str) -> int:
    os.makedirs(out_dir, exist_ok=True)
    n = 0
    for piece in sorted(os.listdir(origin_dir)):
        if not piece.endswith(".npz"):
            continue
        f = np.load(os.path.join(origin_dir, piece), allow_pickle=True)
        tracks = [_track_note_matrix(f[name]) for name in ("melody", "bridge", "piano")]
        all_notes = [row for t in tracks for row in t]
        all_notes.sort(key=lambda x: (x[0], x[1], x[2]))
        db_pos, db_filter = _downbeats_from_beat_table(f["beat"])
        np.savez(
            os.path.join(out_dir, piece),
            notes=np.array([np.array(t) for t in tracks], dtype=object),
            start_table=np.array(
                [_start_table(t, db_pos) for t in tracks], dtype=object
            ),
            db_pos=np.array(db_pos),
            db_pos_filter=np.array(db_filter),
            chord=f["chord"],
        )
        n += 1
    print(f"imported {n} songs -> {out_dir}")
    return n


# ---------------------------------------------------------------------------
# run-dir pruning (reference cleanup_checkpoints.py)
# ---------------------------------------------------------------------------


def cleanup_checkpoints(result_dir: str, assume_yes: bool = False) -> list:
    """Remove run dirs without any saved checkpoint; interactive unless --yes."""
    removed = []
    for group in sorted(os.listdir(result_dir)):
        gpath = os.path.join(result_dir, group)
        if not os.path.isdir(gpath):
            continue
        for item in sorted(os.listdir(gpath)):
            run = os.path.join(gpath, item)
            ckpt = os.path.join(run, "chkpts")
            has_ckpt = os.path.isdir(ckpt) and any(
                e.isdigit() or e == "last" for e in os.listdir(ckpt)
            )
            if not has_ckpt:
                if assume_yes or input(f"Remove {run} (y/n)? ") == "y":
                    shutil.rmtree(run)
                    removed.append(run)
    print(f"removed {len(removed)} empty run dir(s)")
    return removed


# ---------------------------------------------------------------------------
# split surgery (reference remove_pickle.py)
# ---------------------------------------------------------------------------


def remove_from_split(split_path: str, song_fn: str) -> None:
    with open(split_path, "rb") as f:
        split = pickle.load(f)
    assert song_fn in split[0] or song_fn in split[1], f"{song_fn} not in split"
    (split[0] if song_fn in split[0] else split[1]).remove(song_fn)
    with open(split_path, "wb") as f:
        pickle.dump(split, f)
    print(f"removed {song_fn} from {split_path}")


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    sub = p.add_subparsers(dest="cmd", required=True)
    p1 = sub.add_parser("pop909_import")
    p1.add_argument("--origin", required=True)
    p1.add_argument("--out", required=True)
    p2 = sub.add_parser("cleanup_checkpoints")
    p2.add_argument("--result_dir", default="result")
    p2.add_argument("--yes", action="store_true")
    p3 = sub.add_parser("remove_from_split")
    p3.add_argument("--split", required=True)
    p3.add_argument("--song", required=True)
    args = p.parse_args(argv)
    if args.cmd == "pop909_import":
        pop909_import(args.origin, args.out)
    elif args.cmd == "cleanup_checkpoints":
        cleanup_checkpoints(args.result_dir, args.yes)
    elif args.cmd == "remove_from_split":
        remove_from_split(args.split, args.song)


if __name__ == "__main__":
    main()
