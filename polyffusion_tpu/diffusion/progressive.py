"""Progressive distillation math: v-parameterization, halving tau grids, and
the two-step-teacher -> one-step-student targets.

Beyond-reference capability (the torch reference at ``inference_sdf.py:449-463``
always spends 50-1000 UNet evals/sample, 2x that under CFG).  Two stages, after
Salimans & Ho (arXiv:2202.00512) and Meng et al. (arXiv:2210.03142):

- **Stage A — guided distillation**: a student is trained to predict, in ONE
  forward pass, the classifier-free-guided epsilon its teacher computes with a
  double-batched pass at a fixed guidance scale ``w``.  Folds CFG's 2x batch
  into the weights: the student samples at ``uncond_scale=1`` (single pass).
- **Stage B — step halving**: on a tau grid G (even size N), the student grid
  is ``G[1::2]`` (size N/2) and the student learns the x0 prediction whose
  single DDIM(eta=0) step reproduces the teacher's TWO fine-grid steps.
  Repeat: 64 -> 32 -> 16 -> 8 -> 4 UNet evals per sample.

The student predicts **v** = a*eps - s*x0 (a = sqrt(alpha_bar), s =
sqrt(1-alpha_bar)) — the parameterization progressive distillation needs for
stability at few steps — and ``make_v_to_eps_apply`` adapts any v-model back
into the eps contract, so every existing sampler (DDPM/DDIM/DPM-Solver++,
RePaint, autoreg) consumes distilled students unchanged.

Everything here is pure array math over the float32 schedule tables; the
training loss lives in ``tasks/distill.py`` and the CLI in ``distill.py``.
"""

from __future__ import annotations

from typing import List, NamedTuple

import jax.numpy as jnp
import numpy as np

from .schedule import NoiseSchedule

# ---------------------------------------------------------------------------
# v-parameterization (Salimans & Ho, appendix D)
#
# With x_t = a*x0 + s*eps and v := a*eps - s*x0 (a^2 + s^2 = 1):
#   eps = a*v + s*x_t          x0 = a*x_t - s*v
# ---------------------------------------------------------------------------


def eps_from_v(x, v, a, s):
    return a * v + s * x


def x0_from_v(x, v, a, s):
    return a * x - s * v


def v_from_eps_x0(eps, x0, a, s):
    return a * eps - s * x0


def make_v_to_eps_apply(apply_fn, schedule: NoiseSchedule):
    """Wrap a v-prediction net into the eps contract ``(params, x, t, cond) -> eps``.

    ``t`` is the usual per-sample (B,) int32 step vector; a/s are gathered from
    the resident schedule tables.  The returned callable deliberately does NOT
    advertise ``supports_cfg_fork`` — distilled students bake their guidance in
    and are sampled single-pass at scale 1.
    """
    a_tab = jnp.asarray(schedule.sqrt_alpha_bar)
    s_tab = jnp.asarray(schedule.sqrt_1m_alpha_bar)

    def apply_eps(params, x, t, cond, **kwargs):
        v = apply_fn(params, x, t, cond, **kwargs)
        bshape = (-1,) + (1,) * (x.ndim - 1)
        a = a_tab[t].reshape(bshape).astype(x.dtype)
        s = s_tab[t].reshape(bshape).astype(x.dtype)
        return eps_from_v(x, v, a, s)

    return apply_eps


# ---------------------------------------------------------------------------
# halving grids
# ---------------------------------------------------------------------------


def halving_grids(n_steps: int, base: int, end: int = 2) -> List[np.ndarray]:
    """Chain of ascending tau grids [G0 (size base), G1 = G0[1::2], ...] down to
    size ``end``.  ``base`` must be ``end * 2**k``.  Each grid keeps the TOP tau
    (the from-noise starting level), so every phase's student still starts at
    the same noise level; the bottom element's implicit "previous" level is
    alpha_bar[0], matching ``make_ddim_schedule``'s alpha_prev convention.
    """
    if base % end or (base // end) & (base // end - 1):
        raise ValueError(f"base ({base}) must be end ({end}) * a power of 2")
    # evenly spaced over [1, T - T//base + 1] — the uniform-DDIM span without
    # the reference's size quirk (arange(0, T, T//S) overshoots S for S∤T)
    top = n_steps - n_steps // base
    g = np.round(np.linspace(0, top, base)).astype(np.int64) + 1
    assert g[-1] < n_steps and len(np.unique(g)) == base
    grids = [g]
    while len(g) > end:
        g = g[1::2]
        grids.append(g)
    return grids


class PhaseTables(NamedTuple):
    """Per-student-index coefficient tables for one halving phase, all (M,).

    For student index j (ascending grid S = G[1::2], M = N/2):
      tau[j]   = S[j]          (a_t, s_t)   the level the student is called at
      tau_mid[j] = G[2j]       (a_m, s_m)   the teacher's intermediate level
      prev                      (a_p, s_p)   the target level = S[j-1]
                                             (alpha_bar[0] for j = 0)
      coef_xt = s_p / s_t;  denom = a_p - coef_xt * a_t
        so  x0_target = (x_prev - coef_xt * x_t) / denom
      weight  = max(SNR, 1) = max(a_t^2 / s_t^2, 1)   (truncated-SNR loss weight)
    """

    tau: np.ndarray
    a_t: np.ndarray
    s_t: np.ndarray
    tau_mid: np.ndarray
    a_m: np.ndarray
    s_m: np.ndarray
    a_p: np.ndarray
    s_p: np.ndarray
    coef_xt: np.ndarray
    denom: np.ndarray
    weight: np.ndarray

    @property
    def m(self) -> int:
        return int(self.tau.shape[0])


def _a_s(alpha_bar64: np.ndarray, taus: np.ndarray):
    ab = alpha_bar64[taus]
    return np.sqrt(ab), np.sqrt(1.0 - ab)


def phase_tables(schedule: NoiseSchedule, fine_grid: np.ndarray) -> PhaseTables:
    """Coefficient tables for distilling the ``fine_grid`` (size N, even) teacher
    into its ``fine_grid[1::2]`` student.  float64 on host, cast float32."""
    g = np.asarray(fine_grid, np.int64)
    assert g.ndim == 1 and len(g) % 2 == 0 and (np.diff(g) > 0).all()
    ab = schedule.alpha_bar.astype(np.float64)
    student = g[1::2]
    a_t, s_t = _a_s(ab, student)
    a_m, s_m = _a_s(ab, g[0::2])
    prev_ab = np.concatenate([ab[0:1], ab[student[:-1]]])
    a_p, s_p = np.sqrt(prev_ab), np.sqrt(1.0 - prev_ab)
    coef_xt = s_p / s_t
    denom = a_p - coef_xt * a_t
    assert (denom > 1e-5).all(), "degenerate grid: x0-target solve ill-conditioned"
    weight = np.maximum(a_t**2 / s_t**2, 1.0)
    f = lambda v: v.astype(np.float32)  # noqa: E731
    return PhaseTables(
        tau=student.astype(np.int32),
        a_t=f(a_t), s_t=f(s_t),
        tau_mid=g[0::2].astype(np.int32),
        a_m=f(a_m), s_m=f(s_m),
        a_p=f(a_p), s_p=f(s_p),
        coef_xt=f(coef_xt), denom=f(denom), weight=f(weight),
    )


def pad_tables(tbl: PhaseTables, m_max: int):
    """Edge-pad every table to ``m_max`` rows (+ the true row count), so every
    halving phase shares ONE compiled train step: the tables enter the jitted
    step as same-shape arguments and only their values change per phase (a
    closed-over table would bake into the executable -> one 20-60 min TPU
    recompile per phase)."""
    m = tbl.m
    assert m <= m_max
    pad = lambda v: np.concatenate([v, np.repeat(v[-1:], m_max - m, 0)])  # noqa: E731
    return PhaseTables(*(pad(v) for v in tbl)), m


# ---------------------------------------------------------------------------
# targets (pure, unit-testable algebra)
# ---------------------------------------------------------------------------


def ddim_jump(x, eps, a_from, s_from, a_to, s_to):
    """One deterministic DDIM(eta=0) transition in (a, s) coordinates."""
    x0 = (x - s_from * eps) / a_from
    return a_to * x0 + s_to * eps


def solve_x0_target(x_t, x_prev, coef_xt, denom):
    """The x0 prediction whose single student DDIM step from ``x_t`` lands
    exactly on the teacher's two-step result ``x_prev``:

        x' = a_p*x0 + s_p*(x_t - a_t*x0)/s_t  ==  x_prev
        =>  x0 = (x_prev - (s_p/s_t)*x_t) / (a_p - (s_p/s_t)*a_t)
    """
    return (x_prev - coef_xt * x_t) / denom
