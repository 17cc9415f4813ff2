"""PolyDis: the chord/texture disentangled VAE (reference ``polydis/model.py``).

Composes a chord RnnEncoder (1024 hidden, z=256), the CNN-GRU TextureEncoder
(z=256), the PianoTree decoder (z=512 = z_chd | z_rhy) and an 8-step chord decoder.
Used for "aftertouch" re-rendering of generated piano-rolls and for the
swap / posterior-sample / prior-sample / slerp-interpolation utilities.

Pretrained weights convert from the reference checkpoint
(``pretrained/polydis/model_master_final.pt``, DataParallel prefixes stripped —
``polydis/model.py:321-325``).
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .encoders import ChordDecoder, ChordEncoder, TextureEncoder, chord_recon_loss
from .pianotree_dec import PianoTreeDecoder, output_to_pnotree, pianotree_recon_loss


def kl_with_standard_normal(mu: jnp.ndarray, std: jnp.ndarray) -> jnp.ndarray:
    """mean KL(N(mu, std) || N(0, 1)) (reference utils kl_with_normal)."""
    var = std**2
    return jnp.mean(0.5 * (var + mu**2 - 1.0 - jnp.log(var)))


class PolyDis:
    """Functional bundle: modules + one params dict {chd_encoder, rhy_encoder,
    decoder, chd_decoder}."""

    def __init__(self, chd_size: int = 256, txt_size: int = 256, num_channel: int = 10):
        self.chd_encoder = ChordEncoder(hidden_dim=1024, z_dim=chd_size)
        self.rhy_encoder = TextureEncoder(
            emb_size=256, hidden_dim=1024, z_dim=txt_size, num_channel=num_channel
        )
        # init_model() uses PtvaeDecoder(max_simu_note=32, dec_dur_hid_size=64)
        # (reference polydis/model.py:303-319, ptvae.py:238-259)
        self.decoder = PianoTreeDecoder(
            max_simu_note=32, dec_dur_hid_size=64, z_size=chd_size + txt_size
        )
        self.chd_decoder = ChordDecoder(
            input_dim=36, z_input_dim=256, hidden_dim=512, z_dim=chd_size, n_step=8
        )

    # -- init / load -------------------------------------------------------------

    def init_params(self, rng: jax.Array) -> Dict:
        r1, r2, r3, r4 = jax.random.split(rng, 4)
        chord = jnp.zeros((1, 8, 36))
        prmat = jnp.zeros((1, 32, 128))
        z_full = jnp.zeros((1, self.decoder.z_size))
        z_chd = jnp.zeros((1, self.chd_decoder.z_dim))
        return {
            "chd_encoder": self.chd_encoder.init(r1, chord)["params"],
            "rhy_encoder": self.rhy_encoder.init(r2, prmat)["params"],
            "decoder": self.decoder.init(r3, z_full, True)["params"],
            "chd_decoder": self.chd_decoder.init(r4, z_chd, True, 0.0, None)["params"],
        }

    @staticmethod
    def params_from_torch_file(path: str) -> Dict:
        from ..convert.torch_import import (
            chord_decoder_params_from_torch,
            chord_encoder_params_from_torch,
            pianotree_decoder_params_from_torch,
            split_by_prefix,
            strip_dataparallel,
            texture_encoder_params_from_torch,
            torch_file_to_numpy,
        )

        sd = strip_dataparallel(torch_file_to_numpy(path))
        return {
            "chd_encoder": chord_encoder_params_from_torch(
                split_by_prefix(sd, "chd_encoder")
            ),
            "rhy_encoder": texture_encoder_params_from_torch(
                split_by_prefix(sd, "rhy_encoder")
            ),
            "decoder": pianotree_decoder_params_from_torch(
                split_by_prefix(sd, "decoder")
            ),
            "chd_decoder": chord_decoder_params_from_torch(
                split_by_prefix(sd, "chd_decoder")
            ),
        }

    # -- core --------------------------------------------------------------------

    def encode(self, params, pr_mat: jnp.ndarray, c: jnp.ndarray):
        """-> ((mu_chd, std_chd), (mu_rhy, std_rhy))."""
        dist_chd = self.chd_encoder.apply({"params": params["chd_encoder"]}, c)
        dist_rhy = self.rhy_encoder.apply({"params": params["rhy_encoder"]}, pr_mat)
        return dist_chd, dist_rhy

    def decode(self, params, z_chd: jnp.ndarray, z_rhy: jnp.ndarray) -> np.ndarray:
        """-> estimated pnotree grid (B, 32, 19, 6)."""
        z = jnp.concatenate([z_chd, z_rhy], axis=-1)
        pitch, dur = self.decoder.apply(
            {"params": params["decoder"]}, z, True, None, None, 0.0, 0.0
        )
        return np.asarray(output_to_pnotree(pitch, dur))

    def run(
        self,
        params,
        x: jnp.ndarray,
        c: jnp.ndarray,
        pr_mat: jnp.ndarray,
        tfr1: float,
        tfr2: float,
        tfr3: float,
        rng: jax.Array,
    ):
        """Training forward pass (reference model.py:56-77)."""
        k_chd, k_rhy, k_dec, k_cdec = jax.random.split(rng, 4)
        embedded, lengths = self.decoder.emb_x(params["decoder"], x)
        (mu_c, std_c) = self.chd_encoder.apply({"params": params["chd_encoder"]}, c)
        (mu_r, std_r) = self.rhy_encoder.apply({"params": params["rhy_encoder"]}, pr_mat)
        z_chd = mu_c + std_c * jax.random.normal(k_chd, mu_c.shape)
        z_rhy = mu_r + std_r * jax.random.normal(k_rhy, mu_r.shape)
        dec_z = jnp.concatenate([z_chd, z_rhy], axis=-1)
        pitch_outs, dur_outs = self.decoder.apply(
            {"params": params["decoder"]},
            dec_z, False, embedded, lengths, tfr1, tfr2, k_dec,
        )
        recon_root, recon_chroma, recon_bass = self.chd_decoder.apply(
            {"params": params["chd_decoder"]}, z_chd, False, tfr3, c, k_cdec
        )
        return (
            pitch_outs, dur_outs, (mu_c, std_c), (mu_r, std_r),
            recon_root, recon_chroma, recon_bass,
        )

    def loss(
        self,
        params,
        x: jnp.ndarray,
        c: jnp.ndarray,
        pr_mat: jnp.ndarray,
        rng: jax.Array,
        tfr1: float = 0.0,
        tfr2: float = 0.0,
        tfr3: float = 0.0,
        beta: float = 0.1,
        weights=(1.0, 0.5),
    ):
        """Full VAE loss (reference model.py:79-152)."""
        (
            pitch_outs, dur_outs, dist_chd, dist_rhy,
            recon_root, recon_chroma, recon_bass,
        ) = self.run(params, x, c, pr_mat, tfr1, tfr2, tfr3, rng)
        recon, pitch_l, dur_l = pianotree_recon_loss(x, pitch_outs, dur_outs, weights)
        kl_chd = kl_with_standard_normal(*dist_chd)
        kl_rhy = kl_with_standard_normal(*dist_rhy)
        kl = kl_chd + kl_rhy
        chord_l, root_l, chroma_l, bass_l = chord_recon_loss(
            c, recon_root, recon_chroma, recon_bass
        )
        total = recon + beta * kl + chord_l
        return total, {
            "loss": total,
            "recon": recon,
            "pitch": pitch_l,
            "dur": dur_l,
            "kl": kl,
            "kl_chd": kl_chd,
            "kl_rhy": kl_rhy,
            "chord": chord_l,
            "root": root_l,
            "chroma": chroma_l,
            "bass": bass_l,
        }

    # -- inference utilities (reference model.py:173-243) -------------------------

    def inference(
        self,
        params,
        pr_mat,
        c,
        sample: bool = False,
        chd_sample: bool = False,
        rng: Optional[jax.Array] = None,
    ) -> np.ndarray:
        rng = rng if rng is not None else jax.random.PRNGKey(0)
        k1, k2, k3 = jax.random.split(rng, 3)
        (mu_c, std_c), (mu_r, std_r) = self.encode(params, jnp.asarray(pr_mat), jnp.asarray(c))
        z_chd = mu_c + std_c * jax.random.normal(k1, mu_c.shape) if sample else mu_c
        z_rhy = mu_r + std_r * jax.random.normal(k2, mu_r.shape) if sample else mu_r
        if chd_sample:
            z_chd = jax.random.normal(k3, z_chd.shape)
        return self.decode(params, z_chd, z_rhy)

    def swap(self, params, pr_mat1, pr_mat2, c1, c2, fix_rhy: bool, fix_chd: bool):
        pr_mat = pr_mat1 if fix_rhy else pr_mat2
        c = c1 if fix_chd else c2
        return self.inference(params, pr_mat, c, sample=False)

    def posterior_sample(
        self, params, pr_mat, c, scale: Optional[float] = None,
        sample_chd: bool = True, sample_txt: bool = True, rng=None,
    ):
        rng = rng if rng is not None else jax.random.PRNGKey(0)
        k1, k2 = jax.random.split(rng)
        (mu_c, std_c), (mu_r, std_r) = self.encode(params, jnp.asarray(pr_mat), jnp.asarray(c))
        if scale is not None:
            std_c, std_r = std_c * scale, std_r * scale
        z_chd = mu_c + std_c * jax.random.normal(k1, mu_c.shape)
        z_rhy = mu_r + std_r * jax.random.normal(k2, mu_r.shape)
        if not sample_chd:
            z_chd = mu_c
        if not sample_txt:
            z_rhy = mu_r
        return self.decode(params, z_chd, z_rhy)

    def prior_sample(
        self, params, x, c, sample_chd: bool = False, sample_rhy: bool = False,
        scale: float = 1.0, rng=None,
    ):
        rng = rng if rng is not None else jax.random.PRNGKey(0)
        k1, k2 = jax.random.split(rng)
        (mu_c, std_c), (mu_r, std_r) = self.encode(params, jnp.asarray(x), jnp.asarray(c))
        z_chd = (
            jax.random.normal(k1, mu_c.shape) * scale
            if sample_chd
            else mu_c + std_c * jax.random.normal(k1, mu_c.shape)
        )
        z_rhy = (
            jax.random.normal(k2, mu_r.shape) * scale
            if sample_rhy
            else mu_r + std_r * jax.random.normal(k2, mu_r.shape)
        )
        return self.decode(params, z_chd, z_rhy)

    def interp(
        self, params, pr_mat1, c1, pr_mat2, c2,
        interp_chd: bool = False, interp_rhy: bool = False, int_count: int = 10,
    ):
        """Spherical-interpolation morphs (reference model.py:245-301)."""
        (mu_c1, _), (mu_r1, _) = self.encode(params, jnp.asarray(pr_mat1), jnp.asarray(c1))
        (mu_c2, _), (mu_r2, _) = self.encode(params, jnp.asarray(pr_mat2), jnp.asarray(c2))
        z_chds = (
            slerp_interp(np.asarray(mu_c1), np.asarray(mu_c2), int_count)
            if interp_chd
            else np.repeat(np.asarray(mu_c1)[:, None], int_count, axis=1)
        )
        z_rhys = (
            slerp_interp(np.asarray(mu_r1), np.asarray(mu_r2), int_count)
            if interp_rhy
            else np.repeat(np.asarray(mu_r1)[:, None], int_count, axis=1)
        )
        bs = z_chds.shape[0]
        est = self.decode(
            params,
            jnp.asarray(z_chds.reshape(bs * int_count, -1)),
            jnp.asarray(z_rhys.reshape(bs * int_count, -1)),
        )
        return est.reshape(bs, int_count, *est.shape[1:])


def slerp_path(z1: np.ndarray, z2: np.ndarray, count: int = 10) -> np.ndarray:
    """Spherical interpolation with log-length blending (reference :275-301)."""
    shape = z1.shape
    z1, z2 = z1.reshape(-1), z2.reshape(-1)
    n1, n2 = np.linalg.norm(z1), np.linalg.norm(z2)
    p0, p1 = z1 / n1, z2 / n2
    omega = np.arccos(np.clip(np.dot(p0, p1), -1.0, 1.0))
    so = np.sin(omega)
    t = np.linspace(0.0, 1.0, count)
    dirs = (
        np.sin((1.0 - t) * omega)[:, None] / so * p0[None]
        + np.sin(t * omega)[:, None] / so * p1[None]
    )
    length = np.linspace(np.log(n1), np.log(n2), count)
    return (dirs * np.exp(length)[:, None]).reshape([count] + list(shape))


def slerp_interp(z1: np.ndarray, z2: np.ndarray, count: int = 10) -> np.ndarray:
    return np.stack([slerp_path(a, b, count) for a, b in zip(z1, z2)], axis=0)


class PolydisAftertouch:
    """Re-render a generated prmat + chord through PolyDis
    (reference ``polydis_aftertouch.py``)."""

    def __init__(self, model_path: Optional[str] = None, params: Optional[Dict] = None):
        self.model = PolyDis()
        if params is not None:
            self.params = params
        elif model_path is not None:
            self.params = self.model.params_from_torch_file(model_path)
        else:
            self.params = self.model.init_params(jax.random.PRNGKey(0))

    def reconstruct(self, prmat, chd, fn: str, chd_sample: bool = False):
        from ..utils.midi_io import estx_to_midi_file

        est_x = self.model.inference(
            self.params, jnp.asarray(prmat), jnp.asarray(chd), sample=False,
            chd_sample=chd_sample,
        )
        estx_to_midi_file(est_x, fn)
        return est_x
