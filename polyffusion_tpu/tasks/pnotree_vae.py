"""PianoTree-VAE pretraining task — the upstream dependency of the ``pnotree``
cond_type.

The reference never trains this model: it loads a PianoTree VAE pretrained in
the PolyDis project (``utils.py:19-45`` ``load_pretrained_pnotree_enc_dec``)
and freezes its encoder inside ``model_sdf.py:138-151``.  In an environment
without those weights, a RANDOM-init hierarchical-GRU encoder is measurably
blind — its embeddings collapse (pairwise z distance ~3.5% of the z norm on
the synthetic corpus), so a diffusion model trained against it rightly learns
to ignore the conditioning channel.  This task closes the gap the same way
``chd_8bar`` closes the chord-encoder gap: pretrain the VAE here, then freeze
the encoder for the ``sdf_pnotree`` train
(``build_frozen_encoders`` accepts the run dir).

Loss (reference PolyDis ``model.py:79-152``, restricted to the pnotree branch):
teacher-forced 3-level autoregressive reconstruction CE (pitch + duration,
pad-masked) + beta * KL(N(mu, std) || N(0, 1)).  Each (B, 128, 20, 6) 8-bar
batch trains as 4B independent 2-bar segments — exactly the windows
``SDFTask.encode_pnotree`` later encodes.
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from ..models.encoders import PianoTreeEncoder
from ..models.pianotree_dec import PianoTreeDecoder, pianotree_recon_loss
from ..models.polydis import kl_with_standard_normal


class PnoTreeVAETask:
    name = "pnotree_vae"

    #: batch fields the loss reads (data/loader.py DeviceFeeder placeholders)
    used_batch_fields = frozenset({"pnotree"})

    def __init__(self, cfg):
        self.cfg = cfg
        z = cfg.get("pnt_z_dim", 512)
        self.enc = PianoTreeEncoder(z_size=z)
        self.dec = PianoTreeDecoder(z_size=z)
        self.beta = cfg.get("beta", 0.1)

    def init_params(self, rng: jax.Array):
        r1, r2 = jax.random.split(rng)
        # pad-filled dummy segment: valid pitch indices, zero-length steps
        pt = jnp.full((1, 32, 20, 6), self.enc.pitch_pad, jnp.int32)
        enc_params = self.enc.init(r1, pt)["params"]
        z = jnp.zeros((1, self.dec.z_size))
        dec_params = self.dec.init(r2, z, True)["params"]
        return {"pnotree_enc": enc_params, "pnotree_dec": dec_params}

    def loss_fn(
        self, params, batch, rng: jax.Array, sched_params: Dict
    ) -> Tuple[jnp.ndarray, Dict]:
        from ..data.loader import decompress_batch

        pnotree = decompress_batch(batch)[1]  # (B, 128, 20, 6) int32
        b, t = pnotree.shape[0], pnotree.shape[1]
        x = pnotree.reshape(b * (t // 32), 32, *pnotree.shape[2:])
        tfr1 = sched_params.get("tfr_pnt1", 0.5)
        tfr2 = sched_params.get("tfr_pnt2", 0.5)
        k_sample, k_dec = jax.random.split(rng)
        mu, std = self.enc.apply({"params": params["pnotree_enc"]}, x)
        z = mu + std * jax.random.normal(k_sample, mu.shape, mu.dtype)
        embedded, lengths = self.dec.emb_x(params["pnotree_dec"], x)
        pitch_outs, dur_outs = self.dec.apply(
            {"params": params["pnotree_dec"]},
            z, False, embedded, lengths, tfr1, tfr2, k_dec,
        )
        recon, pitch_l, dur_l = pianotree_recon_loss(x, pitch_outs, dur_outs)
        kl = kl_with_standard_normal(mu, std)
        total = recon + self.beta * kl
        return total, {
            "loss": total,
            "recon": recon,
            "pitch": pitch_l,
            "dur": dur_l,
            "kl": kl,
        }
