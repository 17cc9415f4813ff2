"""Path registry (counterpart of the reference ``dirs.py``).

Central defaults for data / pretrained-checkpoint locations, overridable via
environment variables.  Unlike the reference, importing this module has no mkdir
side effects; call :func:`ensure_dirs` explicitly.
"""

from __future__ import annotations

import os

ROOT = os.environ.get("POLYFFUSION_ROOT", os.path.abspath(os.path.join(os.path.dirname(__file__), "..")))

DATA_DIR = os.environ.get("POLYFFUSION_DATA_DIR", os.path.join(ROOT, "data"))
POP909_DATA_DIR = os.environ.get(
    "POP909_DATA_DIR", os.path.join(DATA_DIR, "POP909_4_bin_pnt_8bar")
)
MUSICALION_DATA_DIR = os.environ.get(
    "MUSICALION_DATA_DIR", os.path.join(DATA_DIR, "musicalion_solo_piano")
)
TRAIN_SPLIT_DIR = os.environ.get(
    "TRAIN_SPLIT_DIR", os.path.join(DATA_DIR, "train_split_pnt")
)

PRETRAINED_DIR = os.environ.get("PRETRAINED_DIR", os.path.join(ROOT, "pretrained"))
PT_CHD_8BAR_PATH = os.path.join(PRETRAINED_DIR, "chd8bar.pt")
PT_POLYDIS_PATH = os.path.join(PRETRAINED_DIR, "polydis.pt")
PT_PNOTREE_PATH = os.path.join(PRETRAINED_DIR, "pnotree.pt")

RESULT_DIR = os.environ.get("POLYFFUSION_RESULT_DIR", os.path.join(ROOT, "result"))


def ensure_dirs() -> None:
    for d in (DATA_DIR, TRAIN_SPLIT_DIR, RESULT_DIR):
        os.makedirs(d, exist_ok=True)
