"""Chord-VAE pretraining task (reference ``models/model_chd_8bar.py``).

Encode the chord one-hots to N(mu, sigma), reparameterized sample, decode
autoregressively with scheduled teacher forcing, CE recon losses on
root/chroma/bass.  (Like the reference, no KL term — pure reconstruction with a
stochastic bottleneck, model_chd_8bar.py:41-48.)
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from ..models.encoders import ChordDecoder, ChordEncoder, chord_recon_loss


class Chd8BarTask:
    name = "chd_8bar"

    #: batch fields the loss reads (data/loader.py DeviceFeeder placeholders)
    used_batch_fields = frozenset({"chord"})

    def __init__(self, cfg):
        self.cfg = cfg
        self.enc = ChordEncoder(
            hidden_dim=cfg.get("chd_hidden_dim", 512), z_dim=cfg.get("chd_z_dim", 512)
        )
        self.dec = ChordDecoder(
            input_dim=cfg.get("chd_input_dim", 36),
            z_input_dim=cfg.get("chd_z_input_dim", 512),
            hidden_dim=cfg.get("chd_hidden_dim", 512),
            z_dim=cfg.get("chd_z_dim", 512),
            n_step=cfg.get("chd_n_step", 32),
        )

    def init_params(self, rng: jax.Array):
        r1, r2 = jax.random.split(rng)
        n_step = self.cfg.get("chd_n_step", 32)
        chord = jnp.zeros((1, n_step, 36))
        enc_params = self.enc.init(r1, chord)["params"]
        z = jnp.zeros((1, self.cfg.get("chd_z_dim", 512)))
        dec_params = self.dec.init(r2, z, False, 0.5, chord, jax.random.PRNGKey(0))[
            "params"
        ]
        return {"chord_enc": enc_params, "chord_dec": dec_params}

    def loss_fn(
        self, params, batch, rng: jax.Array, sched_params: Dict
    ) -> Tuple[jnp.ndarray, Dict]:
        from ..data.loader import decompress_batch

        chord = decompress_batch(batch)[2]  # (B, 32, 36) one-hot
        tfr = sched_params.get("tfr_chd", 0.5)
        k_sample, k_tf = jax.random.split(rng)
        mu, std = self.enc.apply({"params": params["chord_enc"]}, chord)
        z = mu + std * jax.random.normal(k_sample, mu.shape, mu.dtype)
        r_root, r_chroma, r_bass = self.dec.apply(
            {"params": params["chord_dec"]}, z, False, tfr, chord, k_tf
        )
        total, root_l, chroma_l, bass_l = chord_recon_loss(
            chord, r_root, r_chroma, r_bass
        )
        return total, {
            "loss": total,
            "root": root_l,
            "chroma": chroma_l,
            "bass": bass_l,
        }
