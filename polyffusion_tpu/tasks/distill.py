"""The distillation task: train a v-prediction student against a frozen teacher.

Two modes (see ``diffusion/progressive.py`` for the math and the paper refs):

- ``mode="guided"`` (stage A): the student's single pass regresses the teacher's
  classifier-free-guided epsilon at a fixed scale ``w``, at uniformly sampled
  t in [0, T) — folds CFG's double batch into the weights.
- ``mode="halve"`` (stage B): on a fine tau grid, the student learns the x0
  whose one DDIM step equals the teacher's two — per phase the grid halves.

The teacher parameters (and phase tables) are NOT baked into the compiled step:
they enter through the ``frozen`` argument (see ``train/step.py``), so every
halving phase reuses ONE executable — a closed-over teacher would mean one
20-60 min TPU recompile per phase.

Both losses are truncated-SNR-weighted x0-MSE (max(SNR, 1)), the weighting
progressive distillation needs so the high-noise region still trains.
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from ..diffusion.progressive import (
    ddim_jump,
    make_v_to_eps_apply,
    solve_x0_target,
    x0_from_v,
)
from ..diffusion.sampler import make_eps_fn
from ..models.unet import nchw_to_nhwc
from .sdf import SDFTask


def _b(v, ndim=4):
    """(B,) -> (B, 1, 1, 1) broadcast helper."""
    return v.reshape((-1,) + (1,) * (ndim - 1))


class DistillTask:
    """Wraps a base SDFTask (UNet + frozen conditioning encoders + schedule).

    ``teacher_kind``: "eps_guided" — the original CFG teacher (eps-param,
    double-batched at ``guide_scale``); "v" — an already-guided v-param student
    from an earlier stage/phase (single pass).
    """

    name = "distill"
    has_frozen = True  # train/step.py passes ``task.frozen`` as a traced arg

    def __init__(self, base: SDFTask, guide_scale: float, mode: str,
                 teacher_kind: str = "eps_guided"):
        assert mode in ("guided", "halve"), mode
        assert teacher_kind in ("eps_guided", "v"), teacher_kind
        assert not getattr(base, "v_prediction", False), (
            "base task must be the eps-parameterized teacher config"
        )
        if getattr(base, "concat_blurry", False):
            raise NotImplementedError("distillation of concat_blurry models")
        self.base = base
        self.cfg = base.cfg
        self.guide_scale = float(guide_scale)
        self.mode = mode
        self.teacher_kind = teacher_kind
        self.schedule = base.schedule
        # set by the CLI before Trainer construction:
        #   guided: {"teacher": params}
        #   halve:  {"teacher": params, "tables": PhaseTables-as-dict (M_max,),
        #            "m": int32 scalar (true row count)}
        self.frozen = None

    # -- Task interface (Trainer delegates) ------------------------------------

    @property
    def used_batch_fields(self):
        return self.base.used_batch_fields

    def init_params(self, rng: jax.Array):
        return self.base.init_params(rng)

    def _teacher_eps(self, cond):
        """eps(params, x, ts, cond) for the frozen teacher."""
        if self.teacher_kind == "v":
            # already guided: single pass through the v->eps adapter
            return make_v_to_eps_apply(self.base.apply_raw, self.schedule)
        return make_eps_fn(
            self.base.apply_eps, self.guide_scale, -jnp.ones_like(cond)
        )

    def loss_fn(
        self, params, frozen, batch, rng: jax.Array, sched_params: Dict
    ) -> Tuple[jnp.ndarray, Dict]:
        del sched_params
        from ..data.loader import decompress_batch

        batch = decompress_batch(batch)
        cond = self.base.encode_cond(batch, None)  # no CFG dropout: always guided
        x0 = nchw_to_nhwc(batch[0])
        b = x0.shape[0]
        kt, kn = jax.random.split(rng)
        noise = jax.random.normal(kn, x0.shape, x0.dtype)
        teacher = frozen["teacher"]
        teacher_eps = self._teacher_eps(cond)

        if self.mode == "guided":
            t = jax.random.randint(kt, (b,), 0, self.schedule.n_steps)
            a_t = _b(jnp.asarray(self.schedule.sqrt_alpha_bar)[t])
            s_t = _b(jnp.asarray(self.schedule.sqrt_1m_alpha_bar)[t])
            x_t = a_t * x0 + s_t * noise
            eps_g = teacher_eps(teacher, x_t, t, cond).astype(x_t.dtype)
            x0_tgt = (x_t - s_t * eps_g) / a_t
            weight = jnp.maximum(a_t**2 / s_t**2, 1.0)
        else:
            tab, m = frozen["tables"], frozen["m"]
            j = jax.random.randint(kt, (b,), 0, m)
            t = tab["tau"][j]
            a_t, s_t = _b(tab["a_t"][j]), _b(tab["s_t"][j])
            a_m, s_m = _b(tab["a_m"][j]), _b(tab["s_m"][j])
            a_p, s_p = _b(tab["a_p"][j]), _b(tab["s_p"][j])
            x_t = a_t * x0 + s_t * noise
            # teacher: two fine-grid DDIM(eta=0) steps
            e1 = teacher_eps(teacher, x_t, t, cond).astype(x_t.dtype)
            x_mid = ddim_jump(x_t, e1, a_t, s_t, a_m, s_m)
            e2 = teacher_eps(teacher, x_mid, tab["tau_mid"][j], cond).astype(x_t.dtype)
            x_prev = ddim_jump(x_mid, e2, a_m, s_m, a_p, s_p)
            x0_tgt = solve_x0_target(x_t, x_prev, _b(tab["coef_xt"][j]),
                                     _b(tab["denom"][j]))
            weight = _b(tab["weight"][j])

        x0_tgt = jax.lax.stop_gradient(x0_tgt)
        v = self.base.apply_raw(params, x_t, t, cond).astype(x_t.dtype)
        x0_pred = x0_from_v(x_t, v, a_t, s_t)
        loss = jnp.mean(weight * (x0_pred - x0_tgt) ** 2)
        return loss, {"loss": loss}
