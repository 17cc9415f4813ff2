"""Helpers to use the read-only reference PyTorch implementation as a numerical oracle.

We import reference modules (never copy their code) to produce golden outputs for
parity tests.  Everything is guarded: tests skip when torch or the reference tree is
unavailable.
"""

import os
import sys

REFERENCE_ROOT = "/root/reference/polyffusion"


def reference_available() -> bool:
    try:
        import torch  # noqa: F401
    except Exception:
        return False
    return os.path.isdir(REFERENCE_ROOT)


def add_reference_path():
    if REFERENCE_ROOT not in sys.path:
        sys.path.insert(0, REFERENCE_ROOT)


def torch_state_to_numpy(module):
    return {k: v.detach().numpy() for k, v in module.state_dict().items()}
