"""The Polyffusion-SDF task: conditional piano-roll diffusion with the SD UNet.

JAX counterpart of ``models/model_sdf.py``: encodes the condition per ``cond_type``
({chord, txt, pnotree, chord+txt}; raw "vanilla" features or frozen pretrained VAE
means), applies classifier-free-guidance dropout per ``cond_mode`` ({cond, uncond,
mix, mix2}), optionally concatenates a blurry low-res image as extra input channels,
and returns the eps-MSE diffusion loss.

Differences from the reference are TPU-first, not semantic: batches are transposed
once to NHWC, the cond dropout uses JAX PRNG bernoulli (batch-level, p=0.2 like the
reference's ``random.random() < 0.2``), and the whole loss is one jitted graph.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from ..diffusion.gaussian import diffusion_loss
from ..diffusion.schedule import make_schedule
from ..models.unet import UNetModel, nchw_to_nhwc


def blurry_image(x_nhwc: jnp.ndarray, ratio: float = 0.25) -> jnp.ndarray:
    """Bicubic down + nearest up, clipped to [0, 1] (reference ``utils.py:552-567``)."""
    b, h, w, c = x_nhwc.shape
    small = jax.image.resize(
        x_nhwc, (b, int(h * ratio), int(w * ratio), c), method="bicubic"
    )
    big = jax.image.resize(small, (b, h, w, c), method="nearest")
    return jnp.clip(big, 0.0, 1.0)


class SDFTask:
    name = "sdf"

    def __init__(
        self,
        cfg,
        chord_enc=None,
        chord_enc_params=None,
        txt_enc=None,
        txt_enc_params=None,
        pnotree_enc=None,
        pnotree_enc_params=None,
    ):
        self.cfg = cfg
        self.cond_type = cfg.get("cond_type", "chord")
        self.cond_mode = cfg.get("cond_mode", "cond")
        self.use_enc = bool(cfg.get("use_enc", self.cond_type == "pnotree"))
        self.concat_blurry = bool(cfg.get("concat_blurry", False))
        self.concat_ratio = float(cfg.get("concat_ratio", 0.25))

        dtype = jnp.bfloat16 if cfg.get("bf16", False) else jnp.float32
        self.unet = UNetModel(
            in_channels=cfg.in_channels,
            out_channels=cfg.out_channels,
            channels=cfg.channels,
            n_res_blocks=cfg.n_res_blocks,
            attention_levels=tuple(cfg.attention_levels),
            channel_multipliers=tuple(cfg.channel_multipliers),
            n_heads=cfg.n_heads,
            tf_layers=cfg.tf_layers,
            d_cond=cfg.d_cond,
            dtype=dtype,
        )
        self.schedule = make_schedule(cfg.n_steps, cfg.linear_start, cfg.linear_end)

        # distilled students predict v instead of eps (diffusion/progressive.py;
        # the ``v_prediction: true`` key is written by the distill CLI) — the
        # instance-level adapter shadows the eps method so every sampler keeps
        # its eps contract; ``apply_raw`` stays the unadapted net for the
        # distillation loss itself
        self.v_prediction = bool(cfg.get("v_prediction", False))
        if self.v_prediction:
            from ..diffusion.progressive import make_v_to_eps_apply

            self.apply_eps = make_v_to_eps_apply(self.apply_raw, self.schedule)

        self.chord_enc, self.chord_enc_params = chord_enc, chord_enc_params
        self.txt_enc, self.txt_enc_params = txt_enc, txt_enc_params
        self.pnotree_enc, self.pnotree_enc_params = pnotree_enc, pnotree_enc_params

    # -- conditioning ---------------------------------------------------------

    def encode_chord(self, chord: jnp.ndarray) -> jnp.ndarray:
        """(B, 32, 36) one-hot -> (B, 1, d) (reference model_sdf.py:92-106)."""
        if self.use_enc:
            assert self.chord_enc is not None, "chord encoder required (use_enc)"
            mean, _ = self.chord_enc.apply(
                {"params": self.chord_enc_params}, chord
            )
            return mean[:, None, :]
        b = chord.shape[0]
        return chord.reshape(b, 1, -1)

    def encode_txt(self, prmat: jnp.ndarray) -> jnp.ndarray:
        """(B, 128, 128) -> per-2-bar texture-z concat (B, 1, 4*z) or raw prmat
        (reference model_sdf.py:153-164)."""
        if not self.use_enc or self.txt_enc is None:
            if self.use_enc:
                raise AssertionError("texture encoder required (use_enc)")
            return prmat
        segs = jnp.split(prmat, prmat.shape[1] // 32, axis=1)
        zs = [
            self.txt_enc.apply({"params": self.txt_enc_params}, seg)[0] for seg in segs
        ]
        return jnp.concatenate(zs, axis=-1)[:, None, :]

    def encode_pnotree(self, pnotree: jnp.ndarray) -> jnp.ndarray:
        """(B, 128, 20, 6) -> (B, 1, 4*512) (reference model_sdf.py:138-151)."""
        assert self.pnotree_enc is not None, "pnotree encoder required"
        segs = jnp.split(pnotree, pnotree.shape[1] // 32, axis=1)
        zs = [
            self.pnotree_enc.apply({"params": self.pnotree_enc_params}, seg)[0]
            for seg in segs
        ]
        return jnp.concatenate(zs, axis=-1)[:, None, :]

    def encode_cond(self, batch, rng: Optional[jax.Array]) -> jnp.ndarray:
        """Condition per cond_type + CFG dropout per cond_mode (model_sdf.py:185-231).

        ``rng=None`` disables the stochastic dropout (eval / inference).
        """
        prmat2c, pnotree, chord, prmat = batch

        if self.cond_type == "chord":
            cond = self.encode_chord(chord)
        elif self.cond_type == "txt":
            cond = self.encode_txt(prmat)
        elif self.cond_type == "pnotree":
            cond = self.encode_pnotree(pnotree)
        elif self.cond_type == "chord+txt":
            zchd = self.encode_chord(chord)
            ztxt = self.encode_txt(prmat)
            if self.cond_mode == "mix2" and rng is not None:
                rng, k1, k2 = jax.random.split(rng, 3)
                zchd = jnp.where(
                    jax.random.uniform(k1) < 0.2, -jnp.ones_like(zchd), zchd
                )
                ztxt = jnp.where(
                    jax.random.uniform(k2) < 0.2, -jnp.ones_like(ztxt), ztxt
                )
            cond = jnp.concatenate([zchd, ztxt], axis=-1)
        else:
            raise NotImplementedError(self.cond_type)

        if self.cond_mode == "uncond":
            cond = -jnp.ones_like(cond)
        elif self.cond_mode in ("mix", "mix2") and rng is not None:
            rng, k = jax.random.split(rng)
            cond = jnp.where(jax.random.uniform(k) < 0.2, -jnp.ones_like(cond), cond)
        return cond

    # -- Task interface ---------------------------------------------------------

    @property
    def used_batch_fields(self):
        """Batch fields this task's loss reads — the feeder sends placeholders
        for the rest (data/loader.py DeviceFeeder)."""
        fields = {"prmat2c"}
        if "chord" in self.cond_type:
            fields.add("chord")
        if "txt" in self.cond_type:
            fields.add("prmat")
        if self.cond_type == "pnotree":
            fields.add("pnotree")
        return fields

    def _dummy_cond_shape(self, batch_size: int = 1):
        return (batch_size, 1, self.cfg.d_cond) if self.cond_type != "txt" or self.use_enc else (
            batch_size,
            128,
            self.cfg.d_cond,
        )

    def init_params(self, rng: jax.Array):
        h, w = self.cfg.get("img_h", 128), self.cfg.get("img_w", 128)
        variables = self.unet.init(
            rng,
            jnp.zeros((1, h, w, self.cfg.in_channels)),
            jnp.zeros((1,), jnp.int32),
            jnp.zeros(self._dummy_cond_shape()),
        )
        return variables["params"]

    def apply_eps(self, params, x, t, cond, cfg_fork: bool = False):
        return self.unet.apply({"params": params}, x, t, cond, cfg_fork=cfg_fork)

    # samplers fork CFG inside the UNet (compute shared prefix once)
    apply_eps.supports_cfg_fork = True

    def apply_raw(self, params, x, t, cond, cfg_fork: bool = False):
        """The net's raw output head (eps for normal models, v for distilled
        students) — unlike ``apply_eps``, never wrapped by the v->eps adapter."""
        return self.unet.apply({"params": params}, x, t, cond, cfg_fork=cfg_fork)

    def loss_fn(
        self, params, batch, rng: jax.Array, sched_params: Dict
    ) -> Tuple[jnp.ndarray, Dict]:
        del sched_params
        assert not self.v_prediction, (
            "v-prediction checkpoints come from the distill CLI; direct "
            "eps-objective training of a v model is unsupported"
        )
        from ..data.loader import decompress_batch

        batch = decompress_batch(batch)  # uint8 wire dtypes -> compute dtypes
        cond_rng, loss_rng = jax.random.split(rng)
        cond = self.encode_cond(batch, cond_rng)
        x0 = nchw_to_nhwc(batch[0])
        cond_concat = None
        if self.concat_blurry:
            cond_concat = blurry_image(x0, self.concat_ratio)
        apply = self.apply_eps
        if self.cfg.get("remat", False):
            # rematerialize UNet activations in the backward pass — trades FLOPs
            # for HBM, allowing much larger global batches per chip
            apply = jax.checkpoint(self.apply_eps, static_argnums=())
        loss = diffusion_loss(
            apply, params, self.schedule, x0, cond, loss_rng, cond_concat
        )
        return loss, {"loss": loss}
