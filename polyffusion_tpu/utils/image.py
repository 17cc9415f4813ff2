"""Piano-roll image dumps (reference ``utils.py:526-549`` show_image).

Renders (B, 2, n_step, 128) prmat2c tensors as PNG: onset channel red, sustain
green, time left->right, pitch bottom->top, batch concatenated along time.
"""

from __future__ import annotations

import numpy as np


def prmat2c_to_rgb(img: np.ndarray) -> np.ndarray:
    """(B, 2, T, P) -> (P, B*T, 3) float RGB in [0, 1]."""
    img = np.clip(np.asarray(img, dtype=np.float32), 0.0, 1.0)
    if img.ndim == 4:
        img = np.swapaxes(img, 1, 2)  # (B, T, 2, P)
        img = np.concatenate(img, axis=0)  # (B*T, 2, P)
        img = np.swapaxes(img, 0, 1)  # (2, B*T, P)
    h, w = img.shape[1], img.shape[2]
    while img.shape[0] < 3:
        img = np.append(img, np.zeros((1, h, w), np.float32), axis=0)
    rgb = img.transpose(2, 1, 0)  # (P, B*T, 3)
    return np.ascontiguousarray(np.flip(rgb, 0))


def show_image(img, path: str, mask: bool = False) -> None:
    """Save a prmat2c tensor as a PNG (requires matplotlib; no-op otherwise)."""
    rgb = prmat2c_to_rgb(np.asarray(img))
    if mask:
        alpha = rgb[:, :, :1]
        rgb = np.concatenate([rgb, alpha], axis=2)
    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        plt.imsave(path, rgb)
    except Exception as e:  # pragma: no cover
        print(f"show_image skipped ({e})")
