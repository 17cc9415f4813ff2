"""PianoTree hierarchical decoder (time-GRU -> notes-GRU -> duration-GRU).

JAX counterpart of the reference ``dl_modules/pianotree_dec.py`` (identical to
``polydis/ptvae.py:PtvaeDecoder``): an autoregressive 3-level GRU decoder emitting
pitch (130-way) and per-bit duration (5 x 2-way) logits.  The whole decode is nested
``lax.scan``s (32 time steps x 19 note slots x 5 duration bits), compiled once.

Reference quirks preserved:
- the duration feedback token is a 5-wide one-hot of the *2-way* argmax
  (``dur_ind_to_dur_token``, pianotree_dec.py:141-145) — only slots 0/1 are ever hot;
- between time steps, the predicted notes are re-embedded by a bidirectional GRU
  masked to the predicted eos lengths (packed-sequence semantics).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from .gru import _gru_param_init, gru_cell_apply, gru_scan


class PianoTreeDecoder(nn.Module):
    max_simu_note: int = 20
    max_pitch: int = 127
    min_pitch: int = 0
    pitch_sos: int = 128
    pitch_eos: int = 129
    pitch_pad: int = 130
    dur_pad: int = 2
    dur_width: int = 5
    num_step: int = 32
    note_emb_size: int = 128
    z_size: int = 512
    dec_emb_hid_size: int = 128
    dec_time_hid_size: int = 1024
    dec_notes_hid_size: int = 512
    dec_z_in_size: int = 256
    dec_dur_hid_size: int = 16

    @property
    def pitch_range(self) -> int:
        return self.max_pitch - self.min_pitch + 3

    @property
    def note_size(self) -> int:
        return self.pitch_range + self.dur_width

    # -- embedding helpers (shared with the encoder in the reference) ------------

    def get_len_index(self, ind_x: jnp.ndarray) -> jnp.ndarray:
        return self.max_simu_note - jnp.sum(
            ind_x[:, :, :, 0] == self.pitch_pad, axis=-1
        )

    def to_multihot(self, ind_x: jnp.ndarray) -> jnp.ndarray:
        pitch_oh = jax.nn.one_hot(ind_x[:, :, :, 0], self.pitch_range + 1)[
            ..., : self.pitch_range
        ]
        dur = ind_x[:, :, :, 1:].astype(pitch_oh.dtype)
        return jnp.concatenate([pitch_oh, dur], axis=-1)

    @nn.compact
    def __call__(
        self,
        z: jnp.ndarray,
        inference: bool,
        x: Optional[jnp.ndarray] = None,
        lengths: Optional[jnp.ndarray] = None,
        teacher_forcing_ratio1: float = 0.0,
        teacher_forcing_ratio2: float = 0.0,
        rng: Optional[jax.Array] = None,
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Decode z (B, z_size) -> (pitch logits (B, 32, 19, 130),
        dur logits (B, 32, 19, 5, 2)).

        Training mode: ``x`` is the *embedded* ground truth
        (B, num_step, max_simu_note, note_emb_size) with per-step ``lengths``.
        """
        bsz = z.shape[0]
        n_note = self.max_simu_note  # 20 (slot 0 = sos)

        # ---- parameters (explicit dicts: these are used inside lax.scan bodies,
        # where flax submodule calls are not allowed) ---------------------------
        def dense(name, in_dim, out_dim):
            p = self.param(
                name,
                lambda r: {
                    "kernel": nn.initializers.lecun_normal()(r, (in_dim, out_dim)),
                    "bias": jnp.zeros((out_dim,)),
                },
            )
            return lambda x: x @ p["kernel"] + p["bias"]

        note_embedding = dense("note_embedding", self.note_size, self.note_emb_size)
        z2dec_hid = dense("z2dec_hid_linear", self.z_size, self.dec_time_hid_size)
        z2dec_in = dense("z2dec_in_linear", self.z_size, self.dec_z_in_size)
        emb_gru_fwd = self.param(
            "dec_notes_emb_gru_fwd",
            lambda r: _gru_param_init(r, self.note_emb_size, self.dec_emb_hid_size),
        )
        emb_gru_bwd = self.param(
            "dec_notes_emb_gru_bwd",
            lambda r: _gru_param_init(r, self.note_emb_size, self.dec_emb_hid_size),
        )
        time_gru = self.param(
            "dec_time_gru",
            lambda r: _gru_param_init(
                r, self.dec_z_in_size + 2 * self.dec_emb_hid_size, self.dec_time_hid_size
            ),
        )
        time_to_notes_hid = dense(
            "dec_time_to_notes_hid", self.dec_time_hid_size, self.dec_notes_hid_size
        )
        notes_gru = self.param(
            "dec_notes_gru",
            lambda r: _gru_param_init(
                r, self.dec_time_hid_size + self.note_emb_size, self.dec_notes_hid_size
            ),
        )
        pitch_out = dense("pitch_out_linear", self.dec_notes_hid_size, self.pitch_range)
        dur_gru = self.param(
            "dec_dur_gru",
            lambda r: _gru_param_init(r, self.dur_width, self.dec_dur_hid_size),
        )
        dur_hid_linear = dense(
            "dur_hid_linear",
            self.pitch_range + self.dec_notes_hid_size,
            self.dec_dur_hid_size,
        )
        dur_out = dense("dur_out_linear", self.dec_dur_hid_size, 2)
        dec_init_input = self.param(
            "dec_init_input",
            lambda r: jax.random.uniform(r, (2 * self.dec_emb_hid_size,)),
        )
        dur_sos = self.param(
            "dur_sos_token", lambda r: jax.random.uniform(r, (self.dur_width,))
        )

        # ---- teacher-forcing coins (shared across batch, like random.random())
        if rng is None:
            rng = jax.random.PRNGKey(0)
        k1, k2 = jax.random.split(rng)
        tf1 = jax.random.uniform(k1, (self.num_step,)) < teacher_forcing_ratio1
        tf2 = jax.random.uniform(k2, (self.num_step, n_note - 1)) < teacher_forcing_ratio2
        if inference:
            tf1 = jnp.zeros_like(tf1)
            tf2 = jnp.zeros_like(tf2)

        def embed_bigru(seq: jnp.ndarray, lens: jnp.ndarray) -> jnp.ndarray:
            """(N, n_note, emb) + lengths -> (N, 2*emb_hid) final states."""
            h0 = jnp.zeros((seq.shape[0], self.dec_emb_hid_size), seq.dtype)
            _, h_f = gru_scan(emb_gru_fwd, seq, h0, lengths=lens)
            _, h_b = gru_scan(emb_gru_bwd, seq, h0, reverse=True, lengths=lens)
            return jnp.concatenate([h_f, h_b], axis=-1)

        def embed_token(pitch_inds, dur_bits):
            """(B,) pitch indices + (B, 5) dur bits -> embedded note token (B, emb)."""
            oh = jax.nn.one_hot(pitch_inds, self.note_size)
            token = oh.at[:, self.pitch_range :].set(dur_bits.astype(oh.dtype))
            return note_embedding(token)

        def decode_note(note_summary):
            """(B, notes_hid) -> pitch logits (B, 130), dur logits (B, 5, 2)."""
            est_pitch = pitch_out(note_summary)
            dur_hid = dur_hid_linear(
                jnp.concatenate([note_summary, est_pitch], axis=-1)
            )
            token = jnp.tile(dur_sos[None], (bsz, 1))

            def dur_step(carry, _):
                tok, hid = carry
                hid = gru_cell_apply(dur_gru, tok, hid)
                est = dur_out(hid)  # (B, 2)
                nxt = jax.nn.one_hot(jnp.argmax(est, -1), self.dur_width, dtype=tok.dtype)
                return (nxt, hid), est

            (_, _), durs = jax.lax.scan(
                dur_step, (token, dur_hid), None, length=self.dur_width
            )
            return est_pitch, jnp.swapaxes(durs, 0, 1)  # (B, 5, 2)

        sos_vec = jnp.zeros(self.note_size).at[self.pitch_sos].set(1.0)
        sos_vec = sos_vec.at[self.pitch_range :].set(2.0)
        sos_emb = note_embedding(sos_vec[None])  # (1, emb)

        def decode_notes(notes_summary, gt_step, tf_step):
            """One time step's note decode.

            notes_summary: (B, time_hid); gt_step: (B, n_note, emb) embedded gt
            (zeros at inference); tf_step: (n_note-1,) bool coins.
            Returns pitch (B, 19, 130), durs (B, 19, 5, 2), predicted embedded
            notes (B, 20, emb), lengths (B,).
            """
            hid0 = time_to_notes_hid(notes_summary)
            token0 = gt_step[:, 0] if not inference else jnp.tile(sos_emb, (bsz, 1))
            pred0 = jnp.zeros((bsz, n_note, self.note_emb_size)).at[:, 0].set(token0)

            def note_step(carry, inp):
                token, hid, lengths, pred = carry
                t, tf_flag = inp
                x_in = jnp.concatenate([notes_summary, token], axis=-1)
                hid = gru_cell_apply(notes_gru, x_in, hid)
                est_pitch, est_durs = decode_note(hid)
                pitch_inds = jnp.argmax(est_pitch, -1)
                dur_inds = jnp.argmax(est_durs, -1)  # (B, 5)
                predicted = embed_token(pitch_inds, dur_inds)
                pred = jax.lax.dynamic_update_slice_in_dim(
                    pred, predicted[:, None], t, axis=1
                )
                is_eos = (pitch_inds == self.pitch_eos) & (lengths == 0)
                lengths = jnp.where(is_eos, t, lengths)
                gt_token = jnp.take_along_axis(
                    gt_step, jnp.full((bsz, 1, 1), t), axis=1
                )[:, 0] if not inference else predicted
                token = jnp.where(tf_flag, gt_token, predicted)
                return (token, hid, lengths, pred), (est_pitch, est_durs)

            carry0 = (token0, hid0, jnp.zeros(bsz, jnp.int32), pred0)
            ts = jnp.arange(1, n_note, dtype=jnp.int32)
            (_, _, lengths, pred), (pitches, durs) = jax.lax.scan(
                note_step, carry0, (ts, tf_step)
            )
            lengths = jnp.where(lengths == 0, n_note - 1, lengths)
            return (
                jnp.swapaxes(pitches, 0, 1),
                jnp.swapaxes(durs, 0, 1),
                pred,
                lengths,
            )

        # ---- outer loop over time steps --------------------------------------
        z_hid0 = z2dec_hid(z)
        z_in = z2dec_in(z)

        if not inference:
            assert x is not None and lengths is not None
            x_flat = x.reshape(-1, n_note, self.note_emb_size)
            x_summarized = embed_bigru(x_flat, lengths.reshape(-1)).reshape(
                bsz, self.num_step, 2 * self.dec_emb_hid_size
            )
        else:
            x_summarized = jnp.zeros((bsz, self.num_step, 2 * self.dec_emb_hid_size))
        gt = (
            x
            if x is not None
            else jnp.zeros((bsz, self.num_step, n_note, self.note_emb_size))
        )

        token0 = jnp.tile(dec_init_input[None], (bsz, 1))

        def time_step(carry, inp):
            token, z_hid = carry
            t, tf_flag = inp
            x_in = jnp.concatenate([token, z_in], axis=-1)
            z_hid = gru_cell_apply(time_gru, x_in, z_hid)
            gt_step = jnp.take_along_axis(
                gt, jnp.full((bsz, 1, 1, 1), t), axis=1
            )[:, 0]
            pitch_out_t, dur_out_t, pred, pred_lens = decode_notes(
                z_hid, gt_step, tf2[t]
            )
            pred_summary = embed_bigru(pred, pred_lens)
            gt_summary = jnp.take_along_axis(
                x_summarized, jnp.full((bsz, 1, 1), t), axis=1
            )[:, 0]
            token = jnp.where(tf_flag, gt_summary, pred_summary)
            return (token, z_hid), (pitch_out_t, dur_out_t)

        ts = jnp.arange(self.num_step, dtype=jnp.int32)
        (_, _), (pitch_outs, dur_outs) = jax.lax.scan(
            time_step, (token0, z_hid0), (ts, tf1)
        )
        pitch_outs = jnp.swapaxes(pitch_outs, 0, 1)  # (B, 32, 19, 130)
        dur_outs = jnp.swapaxes(dur_outs, 0, 1)  # (B, 32, 19, 5, 2)
        return pitch_outs, dur_outs

    # -- embedding entry used by DisentangleVAE.run (reference :369-373) --------

    def emb_x(self, params, x: jnp.ndarray):
        lengths = self.get_len_index(x)
        multihot = self.to_multihot(x)
        embedded = (
            multihot @ params["note_embedding"]["kernel"]
            + params["note_embedding"]["bias"]
        )
        return embedded, lengths


def pianotree_recon_loss(
    x: jnp.ndarray,
    recon_pitch: jnp.ndarray,
    recon_dur: jnp.ndarray,
    weights=(1.0, 0.5),
    pitch_pad: int = 130,
    dur_pad: int = 2,
):
    """CE losses with pad-index masking (reference pianotree_dec.py:341-367)."""

    def masked_ce(logits, labels, ignore):
        logp = jax.nn.log_softmax(logits, axis=-1)
        ll = jnp.take_along_axis(logp, labels[..., None], axis=-1)[..., 0]
        mask = labels != ignore
        return -jnp.sum(ll * mask) / jnp.maximum(jnp.sum(mask), 1)

    gt_pitch = x[:, :, 1:, 0]
    pitch_loss = masked_ce(recon_pitch, gt_pitch, pitch_pad)
    gt_dur = x[:, :, 1:, 1:]
    dur_loss = masked_ce(recon_dur, gt_dur, dur_pad)
    loss = weights[0] * pitch_loss + weights[1] * dur_loss
    return loss, pitch_loss, dur_loss


def output_to_pnotree(recon_pitch, recon_dur):
    """Logits -> (B, 32, 19, 6) index grid (reference utils.py:89-96)."""
    est_pitch = jnp.argmax(recon_pitch, -1)[..., None]
    est_dur = jnp.argmax(recon_dur, -1)
    return jnp.concatenate([est_pitch, est_dur], axis=-1)
