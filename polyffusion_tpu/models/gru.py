"""GRU primitives with torch-compatible semantics, built on ``lax.scan``.

torch's fused GRU packs gates row-wise as [reset | update | new] and applies the
hidden bias inside the reset product: ``n = tanh(W_in x + b_in + r * (W_hn h + b_hn))``.
We keep the same packing (column blocks of ``wi``/``wh``) so pretrained reference
checkpoints map over mechanically (see ``convert.torch_import.gru_params_from_torch``).

Variable-length sequences use masked scans — the final hidden state equals torch's
``pack_padded_sequence`` result (the packed-sequence semantics the reference's
PianoTree encoder relies on, ``dl_modules/pianotree_enc.py:100-103``).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn


def gru_cell_apply(p, x: jnp.ndarray, h: jnp.ndarray) -> jnp.ndarray:
    """One GRU step. p: dict(wi (in,3H), wh (H,3H), bi (3H,), bh (3H,))."""
    gi = x @ p["wi"] + p["bi"]
    gh = h @ p["wh"] + p["bh"]
    i_r, i_z, i_n = jnp.split(gi, 3, axis=-1)
    h_r, h_z, h_n = jnp.split(gh, 3, axis=-1)
    r = jax.nn.sigmoid(i_r + h_r)
    z = jax.nn.sigmoid(i_z + h_z)
    n = jnp.tanh(i_n + r * h_n)
    return (1.0 - z) * n + z * h


def gru_scan(
    p,
    xs: jnp.ndarray,
    h0: jnp.ndarray,
    *,
    reverse: bool = False,
    lengths: Optional[jnp.ndarray] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Run a GRU over (B, T, in). Returns (outputs (B, T, H), final h (B, H)).

    With ``lengths`` (B,), steps at/past a sequence's length leave its hidden state
    unchanged (masked), matching packed-sequence behavior for both directions.
    """
    xs_t = jnp.swapaxes(xs, 0, 1)  # (T, B, in)
    t_idx = jnp.arange(xs.shape[1])
    if reverse:
        xs_t = xs_t[::-1]
        t_idx = t_idx[::-1]

    def body(h, inp):
        x_t, t = inp
        h_new = gru_cell_apply(p, x_t, h)
        if lengths is not None:
            valid = (t < lengths)[:, None]
            h_new = jnp.where(valid, h_new, h)
        return h_new, h_new

    h_final, outs = jax.lax.scan(body, h0, (xs_t, t_idx))
    if reverse:
        outs = outs[::-1]
    return jnp.swapaxes(outs, 0, 1), h_final


def _gru_param_init(rng, in_dim: int, hidden: int):
    """torch nn.GRU default init: U(-1/sqrt(H), 1/sqrt(H)) for all tensors."""
    k = 1.0 / jnp.sqrt(hidden)
    r1, r2, r3, r4 = jax.random.split(rng, 4)
    return {
        "wi": jax.random.uniform(r1, (in_dim, 3 * hidden), minval=-k, maxval=k),
        "wh": jax.random.uniform(r2, (hidden, 3 * hidden), minval=-k, maxval=k),
        "bi": jax.random.uniform(r3, (3 * hidden,), minval=-k, maxval=k),
        "bh": jax.random.uniform(r4, (3 * hidden,), minval=-k, maxval=k),
    }


class GRU(nn.Module):
    """Unidirectional GRU layer (batch-first)."""

    hidden_size: int

    @nn.compact
    def __call__(self, xs, h0=None, lengths=None):
        in_dim = xs.shape[-1]
        p = {
            k: self.param(k, lambda rng, k=k: _gru_param_init(rng, in_dim, self.hidden_size)[k])
            for k in ("wi", "wh", "bi", "bh")
        }
        if h0 is None:
            h0 = jnp.zeros((xs.shape[0], self.hidden_size), xs.dtype)
        return gru_scan(p, xs, h0, lengths=lengths)

    def step(self, params, x, h):
        """Single step for autoregressive decoding (params = this module's subtree)."""
        return gru_cell_apply(params, x, h)


class BiGRU(nn.Module):
    """Bidirectional GRU; returns (outputs (B,T,2H), final (B, 2H) = [fwd | bwd])."""

    hidden_size: int

    @nn.compact
    def __call__(self, xs, lengths=None):
        in_dim = xs.shape[-1]
        fwd = self.param("fwd", lambda rng: _gru_param_init(rng, in_dim, self.hidden_size))
        bwd = self.param("bwd", lambda rng: _gru_param_init(rng, in_dim, self.hidden_size))
        h0 = jnp.zeros((xs.shape[0], self.hidden_size), xs.dtype)
        out_f, h_f = gru_scan(fwd, xs, h0, lengths=lengths)
        out_b, h_b = gru_scan(bwd, xs, h0, reverse=True, lengths=lengths)
        outs = jnp.concatenate([out_f, out_b], axis=-1)
        final = jnp.concatenate([h_f, h_b], axis=-1)
        return outs, final
