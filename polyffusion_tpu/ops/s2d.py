"""Space-to-depth (1x2 along W) conv reformulation for narrow-channel levels.

Why: TPU vector memory tiles the LAST dim to 128 lanes; the UNet's level-0
tensors have C=64 (``params/sdf*.yaml`` channels=64, reference ``unet.py:30``),
so every level-0 activation is stored half-padded AND every level-0 conv fills
only half the MXU's output lanes (profiled 34% of bf16 peak at the L0 sites vs
84% for the 128/256-lane dots — TODO.md perf log).

The fix is algebraic, not approximate: fold W-parity into channels,
``X'[b,h,j,s*C+c] = x[b,h,2j+s,c]`` — a pure row-major reshape — and rewrite
each conv as an EXACT conv over the folded layout with a structured kernel:

    y = conv3x3(x, W)  <=>  s2d(y) = conv3x3(s2d(x), W')
    W'[kh, bw+1, s*C+c, t*O+o] = W[kh, dw+1, c, o]   where dw = 2*bw + s - t,
                                                      zero if |dw| > 1.

Half of W' is structurally zero (2x the MACs of the original conv), but the
dot runs with 2C-wide contractions and 2O-wide output lanes — full MXU lane
occupancy and half the HBM bytes per activation.  Whether 2x MACs at full
occupancy beats 1x at half occupancy is an empirical per-site question:
``benchmarks/conv_kernel_bench.py`` measures it on-device.

The same index algebra gives entry/exit convs so a whole UNet level can stay
folded with no standalone relayout copies:
  - ``s2d_entry_kernel``: normal input -> s2d output (stride-2, width-(k+1));
  - ``s2d_exit_kernel``: s2d input -> normal stride-2 output (the DownSample).

All transforms are trace-time kernel reshuffles of the SAME parameters the
normal path uses — checkpoints, converters and parity are untouched.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def to_s2d(x: jnp.ndarray) -> jnp.ndarray:
    """(B, H, W, C) -> (B, H, W//2, 2C); a pure row-major reshape."""
    b, h, w, c = x.shape
    assert w % 2 == 0, w
    return x.reshape(b, h, w // 2, 2 * c)


def from_s2d(x: jnp.ndarray) -> jnp.ndarray:
    """(B, H, J, 2C) -> (B, H, 2J, C); inverse of ``to_s2d``."""
    b, h, j, c2 = x.shape
    assert c2 % 2 == 0, c2
    return x.reshape(b, h, 2 * j, c2 // 2)


def fold_channel_vec(v: jnp.ndarray) -> jnp.ndarray:
    """Per-channel vector (..., C) -> its s2d twin (..., 2C) (tile twice:
    s2d channel ``s*C + c`` is original channel ``c``)."""
    return jnp.concatenate([v, v], axis=-1)


def unfold_channel_sums(s: jnp.ndarray) -> jnp.ndarray:
    """Per-s2d-channel sums (..., 2C) -> per-original-channel sums (..., C)
    (both W-parities of a channel contribute to the same statistic)."""
    c = s.shape[-1] // 2
    return s[..., :c] + s[..., c:]


def s2d_kernel(w: jnp.ndarray) -> jnp.ndarray:
    """(kh, kw, Ci, Co) stride-1 SAME kernel -> (kh, kw', 2Ci, 2Co) s2d kernel.

    kw' = kw for 3-wide kernels (block window {-1,0,1}), 1 for 1x1 (block
    diagonal).  Exact: structural zeros where ``dw = 2*bw + s - t`` leaves
    the original tap range.
    """
    kh, kw, ci, co = w.shape
    assert kw in (1, 3), kw
    kw2 = kw if kw == 3 else 1
    lo = -(kw // 2)
    out = jnp.zeros((kh, kw2, 2 * ci, 2 * co), w.dtype)
    for bw in range(kw2):
        for s in range(2):
            for t in range(2):
                dw = 2 * (bw + lo) + s - t
                if not (lo <= dw <= kw // 2):
                    continue
                out = out.at[
                    :, bw, s * ci : (s + 1) * ci, t * co : (t + 1) * co
                ].set(w[:, dw - lo])
    return out


def s2d_entry_kernel(w: jnp.ndarray) -> jnp.ndarray:
    """(kh, 3, Ci, Co) -> (kh, 4, Ci, 2Co): normal-layout input, s2d output.

    Use with ``lax.conv`` window_strides (1, 2) and padding ((kh//2,)*2, (1, 1)):
    output block j covers original cols {2j, 2j+1}, reading cols 2j-1 .. 2j+2.
    """
    kh, kw, ci, co = w.shape
    assert kw == 3, kw
    out = jnp.zeros((kh, 4, ci, 2 * co), w.dtype)
    for e in range(-1, 3):  # input col offset from 2j
        for t in range(2):
            dw = e - t
            if -1 <= dw <= 1:
                out = out.at[:, e + 1, :, t * co : (t + 1) * co].set(w[:, dw + 1])
    return out


def s2d_exit_stride2_kernel(w: jnp.ndarray) -> jnp.ndarray:
    """(kh, 3, Ci, Co) -> (kh, 2, 2Ci, Co): s2d input, stride-(2,2) NORMAL output
    (the DownSample conv).  Use with window_strides (2, 1) over (H, blocks) and
    padding ((kh//2,)*2, (1, 0)): output col j reads original cols 2j-1..2j+1 =
    blocks {j-1 (sub 1), j (subs 0,1)}.
    """
    kh, kw, ci, co = w.shape
    assert kw == 3, kw
    out = jnp.zeros((kh, 2, 2 * ci, co), w.dtype)
    for bw in range(-1, 1):
        for s in range(2):
            dw = 2 * bw + s
            if -1 <= dw <= 1:
                out = out.at[:, bw + 1, s * ci : (s + 1) * ci].set(w[:, dw + 1])
    return out


def upsample2x_s2d(x_s2d: jnp.ndarray) -> jnp.ndarray:
    """2x nearest-neighbor upsample of an s2d tensor, staying in s2d.

    Input (B, H, J, 2C) folded from (B, H, 2J, C); output (B, 2H, 2J, 2C)
    folded from (B, 2H, 4J, C).  W-duplication in s2d is channel surgery:
    output block j' = j//... every original col appears twice, so output block
    k holds original col k at both parities: out[..., k, s*C+c] = x[b, h, k//1?]
    — concretely, output col pair (2m, 2m+1) = (orig col m, orig col m), i.e.
    output block m = [x_m, x_m] where x_m is original col m = s2d channel half
    (m%2) of block m//2.  H-duplication is a plain broadcast.
    """
    b, h, j, c2 = x_s2d.shape
    c = c2 // 2
    lo, hi = x_s2d[..., :c], x_s2d[..., c:]  # original cols 2j / 2j+1
    # output blocks 2j   -> [col 2j,   col 2j]   = [lo_j, lo_j]
    # output blocks 2j+1 -> [col 2j+1, col 2j+1] = [hi_j, hi_j]
    even = jnp.concatenate([lo, lo], axis=-1)
    odd = jnp.concatenate([hi, hi], axis=-1)
    w_up = jnp.stack([even, odd], axis=3).reshape(b, h, 2 * j, c2)
    out = jnp.broadcast_to(w_up[:, :, None], (b, h, 2, 2 * j, c2))
    return out.reshape(b, 2 * h, 2 * j, c2)


def np_reference_s2d_roundtrip(x: np.ndarray) -> np.ndarray:
    """Host-side check helper: to_s2d then from_s2d must be the identity."""
    b, h, w, c = x.shape
    return x.reshape(b, h, w // 2, 2 * c).reshape(b, h, w, c)
