"""Conditioning VAE encoders/decoders (chord, texture, PianoTree) in flax.

JAX counterparts of the reference ``dl_modules`` (frozen pretrained at diffusion
train time, ``models/model_sdf.py:42-57``).  Sequential GRUs run as ``lax.scan``;
teacher forcing in the chord decoder uses per-step JAX bernoulli draws; the
PianoTree encoder's packed-sequence semantics are reproduced with masked scans.

Parameter trees are converter-compatible with the reference torch checkpoints
(see ``convert/torch_import.py``).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from .gru import BiGRU, GRU, gru_cell_apply


class ChordEncoder(nn.Module):
    """bi-GRU VAE encoder over chord one-hots (B, 32, 36) -> N(mu, sigma)
    (reference ``dl_modules/chord_enc.py:5-22``).  Returns (mean, std)."""

    hidden_dim: int = 512
    z_dim: int = 512

    @nn.compact
    def __call__(self, chord: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
        _, final = BiGRU(self.hidden_dim, name="gru")(chord)
        mu = nn.Dense(self.z_dim, name="linear_mu")(final)
        std = jnp.exp(nn.Dense(self.z_dim, name="linear_var")(final))
        return mu, std


class ChordDecoder(nn.Module):
    """Autoregressive GRU chord decoder (reference ``dl_modules/chord_dec.py:7-85``).

    Per step emits root(12) / chroma(12x2) / bass(12) logits; feedback token is the
    one-hot argmax triple; teacher forcing replaces the token with ground truth with
    probability ``tfr`` (one coin per step, like the reference's ``random.random()``).

    NOTE deliberate divergence: the reference's feedback one-hot
    (``chord_dec.py:57-63``, ``t_root[arange(bs), 0, idx]`` with idx shaped (bs, 1))
    broadcast-pollutes every sample with every *other* sample's argmax when bs > 1.
    We build the correct per-sample one-hot; behaviors coincide at bs == 1
    (verified in tests/test_encoder_parity.py).
    """

    input_dim: int = 36
    z_input_dim: int = 512
    hidden_dim: int = 512
    z_dim: int = 512
    n_step: int = 32

    @nn.compact
    def __call__(
        self,
        z_chd: jnp.ndarray,
        inference: bool,
        tfr: float = 0.0,
        gt_chd: Optional[jnp.ndarray] = None,
        rng: Optional[jax.Array] = None,
    ):
        bsz = z_chd.shape[0]
        h = nn.Dense(self.hidden_dim, name="z2dec_hid")(z_chd)
        z_in = nn.Dense(self.z_input_dim, name="z2dec_in")(z_chd)
        init_input = self.param(
            "init_input", lambda rng: jax.random.uniform(rng, (self.input_dim,))
        )
        from .gru import _gru_param_init

        gru_params = self.param(
            "gru",
            lambda rng: _gru_param_init(
                rng, self.input_dim + self.z_input_dim, self.hidden_dim
            ),
        )

        # output heads are applied inside lax.scan -> explicit param dicts
        # (flax submodule init inside scan leaks tracers)
        def dense(name, out_dim):
            p = self.param(
                name,
                lambda r: {
                    "kernel": nn.initializers.lecun_normal()(r, (self.hidden_dim, out_dim)),
                    "bias": jnp.zeros((out_dim,)),
                },
            )
            return lambda x: x @ p["kernel"] + p["bias"]

        root_out = dense("root_out", 12)
        chroma_out = dense("chroma_out", 24)
        bass_out = dense("bass_out", 12)

        if inference or gt_chd is None:
            use_tf = jnp.zeros((self.n_step,), bool)
        else:
            if rng is None:
                rng = jax.random.PRNGKey(0)
            use_tf = jax.random.uniform(rng, (self.n_step,)) < tfr
        gt = (
            gt_chd
            if gt_chd is not None
            else jnp.zeros((bsz, self.n_step, self.input_dim))
        )

        token0 = jnp.tile(init_input[None, :], (bsz, 1))

        def step(carry, inp):
            token, h = carry
            t, tf_flag = inp
            x = jnp.concatenate([token, z_in], axis=-1)
            h = gru_cell_apply(gru_params, x, h)
            r_root = root_out(h)
            r_chroma = chroma_out(h).reshape(bsz, 12, 2)
            r_bass = bass_out(h)

            t_root = jax.nn.one_hot(jnp.argmax(r_root, -1), 12, dtype=token.dtype)
            t_chroma = jnp.argmax(r_chroma, -1).astype(token.dtype)
            t_bass = jax.nn.one_hot(jnp.argmax(r_bass, -1), 12, dtype=token.dtype)
            pred_token = jnp.concatenate([t_root, t_chroma, t_bass], axis=-1)
            gt_token = gt[:, t]
            next_token = jnp.where(tf_flag, gt_token, pred_token)
            return (next_token, h), (r_root, r_chroma, r_bass)

        (_, _), (roots, chromas, basses) = jax.lax.scan(
            step, (token0, h), (jnp.arange(self.n_step), use_tf)
        )
        # (T, B, ...) -> (B, T, ...)
        recon_root = jnp.swapaxes(roots, 0, 1)
        recon_chroma = jnp.swapaxes(chromas, 0, 1)
        recon_bass = jnp.swapaxes(basses, 0, 1)
        return recon_root, recon_chroma, recon_bass


def chord_recon_loss(chord_onehot, recon_root, recon_chroma, recon_bass):
    """CE losses (reference chord_dec.py:71-85). Returns (total, root, chroma, bass)."""

    def ce(logits, labels):
        logp = jax.nn.log_softmax(logits, axis=-1)
        return -jnp.mean(jnp.take_along_axis(logp, labels[..., None], axis=-1))

    root = jnp.argmax(chord_onehot[:, :, 0:12], axis=-1)
    chroma = chord_onehot[:, :, 12:24].astype(jnp.int32)
    bass = jnp.argmax(chord_onehot[:, :, 24:], axis=-1)
    root_loss = ce(recon_root, root)
    chroma_loss = ce(recon_chroma, chroma)
    bass_loss = ce(recon_bass, bass)
    return root_loss + chroma_loss + bass_loss, root_loss, chroma_loss, bass_loss


class TextureEncoder(nn.Module):
    """CNN + bi-GRU texture VAE encoder over prmat (B, 32, 128)
    (reference ``dl_modules/txt_enc.py:5-35``).  Returns (mean, std).

    NOTE the reference reshapes the conv output (B, C=10, 8, 29) directly to
    (B, 8, 290), interleaving channel and time; we reproduce that exact memory
    reindexing for pretrained-weight compatibility.
    """

    emb_size: int = 256
    hidden_dim: int = 1024
    z_dim: int = 256
    num_channel: int = 10

    @nn.compact
    def __call__(self, pr: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
        bsz = pr.shape[0]
        x = pr[:, :, :, None]  # NHWC (B, 32, 128, 1)
        x = nn.Conv(
            self.num_channel,
            (4, 12),
            strides=(4, 1),
            padding="VALID",
            name="cnn",
        )(x)
        x = nn.relu(x)  # (B, 8, 117, C)
        x = nn.max_pool(x, (1, 4), strides=(1, 4))  # (B, 8, 29, C)
        x = jnp.transpose(x, (0, 3, 1, 2))  # (B, C, 8, 29) — torch layout
        x = x.reshape(bsz, 8, -1)  # the reference's channel-mixing view
        x = nn.Dense(1000, name="fc1")(x)
        x = nn.Dense(self.emb_size, name="fc2")(x)
        _, final = BiGRU(self.hidden_dim, name="gru")(x)
        mu = nn.Dense(self.z_dim, name="linear_mu")(final)
        std = jnp.exp(nn.Dense(self.z_dim, name="linear_var")(final))
        return mu, std


class PianoTreeEncoder(nn.Module):
    """Hierarchical note-GRU -> time-GRU VAE encoder over pnotree (B, 32, 20, 6)
    (reference ``dl_modules/pianotree_enc.py:7-121``).  Returns (mean, std)."""

    max_simu_note: int = 20
    max_pitch: int = 127
    min_pitch: int = 0
    pitch_sos: int = 128
    pitch_eos: int = 129
    pitch_pad: int = 130
    dur_width: int = 5
    num_step: int = 32
    note_emb_size: int = 128
    enc_notes_hid_size: int = 256
    enc_time_hid_size: int = 512
    z_size: int = 512

    @property
    def pitch_range(self) -> int:
        return self.max_pitch - self.min_pitch + 3  # incl. sos/eos, not pad

    @nn.compact
    def __call__(self, pnotree: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
        bsz = pnotree.shape[0]
        # lengths: notes per step = max_simu_note - #pad (reference :69-75)
        lengths = self.max_simu_note - jnp.sum(
            pnotree[:, :, :, 0] == self.pitch_pad, axis=-1
        )
        # multi-hot: one-hot pitch over range+1 (pad bucket dropped) + raw dur bits
        pitch_oh = jax.nn.one_hot(pnotree[:, :, :, 0], self.pitch_range + 1)[
            ..., : self.pitch_range
        ]
        dur = pnotree[:, :, :, 1:].astype(pitch_oh.dtype)
        x = jnp.concatenate([pitch_oh, dur], axis=-1)  # (B, 32, 20, 135)

        embedded = nn.Dense(self.note_emb_size, name="note_embedding")(x)
        notes_in = embedded.reshape(
            bsz * self.num_step, self.max_simu_note, self.note_emb_size
        )
        _, notes_final = BiGRU(self.enc_notes_hid_size, name="notes_gru")(
            notes_in, lengths=lengths.reshape(-1)
        )
        time_in = notes_final.reshape(bsz, self.num_step, 2 * self.enc_notes_hid_size)
        _, time_final = BiGRU(self.enc_time_hid_size, name="time_gru")(time_in)
        mu = nn.Dense(self.z_size, name="linear_mu")(time_final)
        std = jnp.exp(nn.Dense(self.z_size, name="linear_std")(time_final))
        return mu, std


# ---------------------------------------------------------------------------
# pretrained loading for the diffusion tasks
# ---------------------------------------------------------------------------


def load_chord_encoder_from_run(run_dir: str):
    """Chord-encoder params from a ``chd_8bar`` run trained by this framework,
    closing the reference's pretrain -> train workflow without a torch detour
    (reference workflow: main.py --model chd_8bar, then sdf_chd8bar with the
    resulting checkpoint as the frozen encoder)."""
    import os

    from ..config import load_params

    cfg = load_params(os.path.join(run_dir, "params.yaml"))
    assert cfg.get("model_name") == "chd_8bar", (
        f"{run_dir} is not a chd_8bar run (model_name={cfg.get('model_name')!r})"
    )
    from ..inference import load_unet_params
    from ..tasks.chd_8bar import Chd8BarTask

    params = load_unet_params(run_dir, Chd8BarTask(cfg))
    return params["chord_enc"]


def load_pnotree_encoder_from_run(run_dir: str):
    """PianoTree-encoder params from a ``pnotree_vae`` run trained by this
    framework — the trainable stand-in for the reference's PolyDis-pretrained
    PianoTree VAE (utils.py:19-45), which it loads but never trains."""
    import os

    from ..config import load_params

    cfg = load_params(os.path.join(run_dir, "params.yaml"))
    assert cfg.get("model_name") == "pnotree_vae", (
        f"{run_dir} is not a pnotree_vae run (model_name={cfg.get('model_name')!r})"
    )
    from ..inference import load_unet_params
    from ..tasks.pnotree_vae import PnoTreeVAETask

    params = load_unet_params(run_dir, PnoTreeVAETask(cfg))
    return params["pnotree_enc"]


def build_frozen_encoders(cfg, pretrained_dir: Optional[str] = None):
    """Construct + load the frozen encoders required by ``cfg`` (cond_type/use_enc).

    Expects reference-format torch checkpoints under ``pretrained_dir``:
    ``chd8bar.pt`` (key-split per utils.py:48-69), ``polydis.pt`` (rhy_encoder.*,
    utils.py:72-86), ``pnotree.pt`` (utils.py:19-45).  Missing files raise with a
    clear message.
    """
    import os

    from ..convert.torch_import import (
        chord_encoder_params_from_torch,
        pianotree_encoder_params_from_torch,
        split_by_prefix,
        texture_encoder_params_from_torch,
        torch_file_to_numpy,
    )

    def need(base, convert_fn):
        """Load converted params.  Accepted forms under ``pretrained_dir``, in
        order: a ``<base>/`` run directory trained by THIS framework (orbax —
        a ``chd_8bar`` run for chd8bar, a ``pnotree_vae`` run for pnotree), a
        pre-converted ``<base>.npz`` (see ``python -m polyffusion_tpu.convert``),
        a torch ``<base>.pt``."""
        if not pretrained_dir:
            raise FileNotFoundError(
                f"this config needs the pretrained '{base}' encoder — pass "
                "--pretrained_dir with converted checkpoints "
                "(`python -m polyffusion_tpu.convert`) or a chd_8bar run dir"
            )
        run_dir = os.path.join(pretrained_dir, base)
        if base == "chd8bar" and os.path.isdir(run_dir):
            return {"chord_enc": load_chord_encoder_from_run(run_dir)}
        if base == "pnotree" and os.path.isdir(run_dir):
            return load_pnotree_encoder_from_run(run_dir)
        npz_path = os.path.join(pretrained_dir, base + ".npz")
        if os.path.exists(npz_path):
            from .. convert.__main__ import load_params_npz

            return load_params_npz(npz_path)
        pt_path = os.path.join(pretrained_dir, base + ".pt")
        if not os.path.exists(pt_path):
            raise FileNotFoundError(
                f"pretrained checkpoint not found: {run_dir}/ (a run dir "
                "trained by this framework: chd_8bar / pnotree_vae), "
                f"{npz_path} or {pt_path} (convert from the reference's "
                "pretrained/ directory with `python -m polyffusion_tpu.convert`)"
            )
        return convert_fn(torch_file_to_numpy(pt_path))

    kwargs = {}
    cond_type = cfg.get("cond_type", "chord")
    if "chord" in cond_type and cfg.get("use_enc", False):
        tree = need(
            "chd8bar",
            lambda sd: {
                "chord_enc": chord_encoder_params_from_torch(
                    split_by_prefix(sd, "chord_enc")
                )
            },
        )
        kwargs["chord_enc"] = ChordEncoder(
            hidden_dim=cfg.get("chd_hidden_dim", 512), z_dim=cfg.get("chd_z_dim", 512)
        )
        kwargs["chord_enc_params"] = tree["chord_enc"] if "chord_enc" in tree else tree
    if "txt" in cond_type and cfg.get("use_enc", False):
        tree = need(
            "polydis",
            lambda sd: {
                "rhy_encoder": texture_encoder_params_from_torch(
                    split_by_prefix(sd, "rhy_encoder")
                )
            },
        )
        kwargs["txt_enc"] = TextureEncoder(
            emb_size=cfg.get("txt_emb_size", 256),
            hidden_dim=cfg.get("txt_hidden_dim", 1024),
            z_dim=cfg.get("txt_z_dim", 256),
            num_channel=cfg.get("txt_num_channel", 10),
        )
        kwargs["txt_enc_params"] = tree.get("rhy_encoder", tree)
    if cond_type == "pnotree":
        tree = need("pnotree", pianotree_encoder_params_from_torch)
        kwargs["pnotree_enc"] = PianoTreeEncoder()
        kwargs["pnotree_enc_params"] = tree
    return kwargs
