"""On-device sampling loops: DDPM ancestral, DDIM, CFG, and RePaint inpainting.

The reference drives every denoising step from a host-side Python loop
(``sampler_sdf.py:194-350``, ``sampler_ddim.py:104-362``).  Here the *entire* loop is
a single ``lax.scan`` compiled once: per-step schedule coefficients are gathered from
resident (T,)-tables, classifier-free guidance is one double-batched UNet call inside
the scanned body, and the RePaint mask-blend + inner resampling loop are fused into
the same step function.  Zero host round-trips during sampling.

Numerical semantics match the reference step equations exactly; parity tests inject
identical per-step noise via the ``noise`` scan inputs.

All image tensors are NHWC.
"""

from __future__ import annotations

from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from .schedule import DDIMSchedule, NoiseSchedule

ApplyFn = Callable[..., jnp.ndarray]  # (params, x, t, cond) -> eps


def make_eps_fn(
    apply_fn: ApplyFn,
    uncond_scale: float = 1.0,
    uncond_cond: Optional[jnp.ndarray] = None,
):
    """Classifier-free-guidance epsilon (reference ``sampler/__init__.py:42-80``).

    ``uncond_scale`` static (Python number): s == 1 -> single cond pass; s == 0 ->
    uncond pass; otherwise ONE double-batched call then ``e_u + s * (e_c - e_u)``.

    ``uncond_scale`` TRACED (jnp scalar / tracer): always the double-batched
    path — algebraically correct for every s (s=0 -> e_u, s=1 -> e_c), so one
    compiled sampler serves ALL guidance scales at the price of the 2x batch.
    ``cond_concat`` (extra input channels) is concatenated before the net.
    """
    static = isinstance(uncond_scale, (int, float))

    def eps(params, x, t, cond, cond_concat=None):
        def run(xx, tt, cc):
            if cond_concat is not None:
                rep = xx.shape[0] // cond_concat.shape[0]
                cat = jnp.concatenate([cond_concat] * rep, axis=0) if rep > 1 else cond_concat
                xx = jnp.concatenate([xx, cat.astype(xx.dtype)], axis=-1)
            return apply_fn(params, xx, tt, cc)

        if uncond_cond is None or (static and uncond_scale == 1.0):
            return run(x, t, cond)
        if static and uncond_scale == 0.0:
            return run(x, t, uncond_cond)
        import os

        c_in = jnp.concatenate([uncond_cond, cond], axis=0)
        if (
            getattr(apply_fn, "supports_cfg_fork", False)
            and os.environ.get("POLYFF_CFG_FORK") == "1"
        ):
            # fork inside the UNet: the cond-independent high-resolution prefix is
            # computed once (numerically identical to the double-batched call).
            # Off by default: measured ~1.5% SLOWER than plain double-batching on
            # v5e (9.22 vs 9.35 samples/s) — the activation duplication at the
            # fork point costs more bandwidth than the skipped prefix saves at
            # this model size; it does lower peak memory, hence the env switch.
            xx = x
            if cond_concat is not None:
                xx = jnp.concatenate([xx, cond_concat.astype(xx.dtype)], axis=-1)
            e = apply_fn(params, xx, t, c_in, cfg_fork=True)
        else:
            x_in = jnp.concatenate([x, x], axis=0)
            t_in = jnp.concatenate([t, t], axis=0)
            e = run(x_in, t_in, c_in)
        e_uncond, e_cond = jnp.split(e, 2, axis=0)
        return e_uncond + uncond_scale * (e_cond - e_uncond)

    return eps


class _Tables(NamedTuple):
    """Device-resident float32 copies of the DDPM sampler tables."""

    sqrt_recip_alpha_bar: jnp.ndarray
    sqrt_recip_m1_alpha_bar: jnp.ndarray
    mean_x0_coef: jnp.ndarray
    mean_xt_coef: jnp.ndarray
    log_var: jnp.ndarray
    sqrt_alpha_bar: jnp.ndarray
    sqrt_1m_alpha_bar: jnp.ndarray
    beta: jnp.ndarray


def _tables(schedule: NoiseSchedule) -> _Tables:
    return _Tables(
        jnp.asarray(schedule.sqrt_recip_alpha_bar),
        jnp.asarray(schedule.sqrt_recip_m1_alpha_bar),
        jnp.asarray(schedule.mean_x0_coef),
        jnp.asarray(schedule.mean_xt_coef),
        jnp.asarray(schedule.log_var),
        jnp.asarray(schedule.sqrt_alpha_bar),
        jnp.asarray(schedule.sqrt_1m_alpha_bar),
        jnp.asarray(schedule.beta),
    )


def _ddpm_step(tbl: _Tables, eps_fn, params, x, cond, step, noise, cond_concat):
    """One ancestral step x_t -> x_{t-1} (SDFSampler.p_sample, sampler_sdf.py:80-171)."""
    bsz = x.shape[0]
    ts = jnp.full((bsz,), step, dtype=jnp.int32)
    e_t = eps_fn(params, x, ts, cond, cond_concat).astype(x.dtype)
    x0 = tbl.sqrt_recip_alpha_bar[step] * x - tbl.sqrt_recip_m1_alpha_bar[step] * e_t
    mean = tbl.mean_x0_coef[step] * x0 + tbl.mean_xt_coef[step] * x
    noise = jnp.where(step == 0, jnp.zeros_like(noise), noise)
    return mean + jnp.exp(0.5 * tbl.log_var[step]) * noise


def ddpm_sample(
    apply_fn: ApplyFn,
    params,
    schedule: NoiseSchedule,
    x_last: jnp.ndarray,
    cond: jnp.ndarray,
    rng: jax.Array,
    *,
    uncond_scale: float = 1.0,
    uncond_cond: Optional[jnp.ndarray] = None,
    temperature: float = 1.0,
    t_start: int = 0,
    repeat_noise: bool = False,
    noise_override: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Full ancestral DDPM sampling T-1-t_start .. 0 (SDFSampler.sample :194-255).

    ``noise_override``: optional (S, ...) per-step noises for deterministic replay.
    """
    tbl = _tables(schedule)
    eps_fn = make_eps_fn(apply_fn, uncond_scale, uncond_cond)
    steps = jnp.asarray(np.arange(schedule.n_steps - 1, -1, -1)[t_start:], jnp.int32)

    # Noise is generated INSIDE the scan body from per-step keys: materializing
    # (T, B, H, W, C) up front is 8+ GB at T=1000/batch 64 — over HBM.  The
    # deterministic-replay path (noise_override, used by the parity tests)
    # still scans over explicit noises.
    nshape = (1, *x_last.shape[1:]) if repeat_noise else x_last.shape
    if noise_override is None:
        per_step = jax.random.split(rng, len(steps))
    else:
        per_step = noise_override * temperature

    def body(x, inp):
        step, nz = inp
        noise = (
            jax.random.normal(nz, nshape, x_last.dtype) * temperature
            if noise_override is None
            else nz
        )
        x = _ddpm_step(tbl, eps_fn, params, x, cond, step, noise, None)
        return x, None

    x, _ = jax.lax.scan(body, x_last, (steps, per_step))
    return x


def ddpm_paint(
    apply_fn: ApplyFn,
    params,
    schedule: NoiseSchedule,
    x: jnp.ndarray,
    cond: jnp.ndarray,
    t_start: int,
    rng: jax.Array,
    *,
    orig: Optional[jnp.ndarray] = None,
    mask: Optional[jnp.ndarray] = None,
    uncond_scale: float = 1.0,
    uncond_cond: Optional[jnp.ndarray] = None,
    cond_concat: Optional[jnp.ndarray] = None,
    repaint_n: int = 1,
    noise_override=None,
) -> jnp.ndarray:
    """RePaint inpainting loop (SDFSampler.paint, sampler_sdf.py:257-350).

    Per step (x repaint_n inner resampling iterations): re-noise ``orig`` to the
    current level via q_sample, ancestral-denoise the unknown region, blend
    ``x = x_known * mask + x_unknown * (1 - mask)``, and (between inner iterations)
    re-noise one step back with ``sqrt(1 - beta) x + beta * noise``.

    With ``orig is None`` this is plain conditional generation from ``x``.
    ``noise_override``: optional (S, repaint_n, 3, ...) noises [q, p, renoise].
    """
    tbl = _tables(schedule)
    eps_fn = make_eps_fn(apply_fn, uncond_scale, uncond_cond)
    steps = jnp.asarray(np.arange(t_start, -1, -1), jnp.int32)
    n_steps = len(steps)

    vanilla = orig is None
    replay = noise_override is not None
    if vanilla:
        per_step = noise_override if replay else jax.random.split(rng, n_steps)

        def body(xc, inp):
            step, nz = inp
            noise = nz if replay else jax.random.normal(nz, x.shape, x.dtype)
            return _ddpm_step(tbl, eps_fn, params, xc, cond, step, noise, cond_concat), None

        x, _ = jax.lax.scan(body, x, (steps, per_step))
        return x

    assert mask is not None
    # per-step (repaint_n, 3, ...) noises generated in-body from keys: the
    # up-front stack is (T, repaint_n, 3, B, H, W, C) — 25 GB at T=1000/batch
    # 64, over HBM.  noise_override (parity replay) keeps the explicit stack.
    per_step = noise_override if replay else jax.random.split(rng, n_steps)

    from ..ops.pallas_sampler import fused_repaint_epilogue, pallas_epilogue_enabled

    use_pallas_epilogue = pallas_epilogue_enabled()

    def body(x_t, inp):
        step, nz = inp
        noise_u = (
            nz if replay else jax.random.normal(nz, (repaint_n, 3, *x.shape), x.dtype)
        )
        x_out = x_t
        for u in range(repaint_n):  # static unroll; repaint_n is small
            if use_pallas_epilogue:
                # single fused VMEM pass for the whole post-eps update
                bsz = x_t.shape[0]
                ts = jnp.full((bsz,), step, dtype=jnp.int32)
                e_t = eps_fn(params, x_t, ts, cond, cond_concat).astype(x_t.dtype)
                zero = jnp.float32(0.0)
                scalars = jnp.stack(
                    [
                        tbl.sqrt_recip_alpha_bar[step],
                        tbl.sqrt_recip_m1_alpha_bar[step],
                        tbl.mean_x0_coef[step],
                        tbl.mean_xt_coef[step],
                        jnp.where(step == 0, zero, jnp.exp(0.5 * tbl.log_var[step])),
                        tbl.sqrt_alpha_bar[step],
                        jnp.where(step > 0, tbl.sqrt_1m_alpha_bar[step], zero),
                    ]
                )
                x_out = fused_repaint_epilogue(
                    x_t, e_t, noise_u[u, 1], orig, noise_u[u, 0], mask, scalars,
                    interpret=jax.default_backend() not in ("tpu", "axon"),
                )
            else:
                q_noise = jnp.where(
                    step > 0, noise_u[u, 0], jnp.zeros_like(noise_u[u, 0])
                )
                x_known = (
                    tbl.sqrt_alpha_bar[step] * orig
                    + tbl.sqrt_1m_alpha_bar[step] * q_noise
                )
                x_unknown = _ddpm_step(
                    tbl, eps_fn, params, x_t, cond, step, noise_u[u, 1], cond_concat
                )
                x_out = x_known * mask + x_unknown * (1.0 - mask)
            if u < repaint_n - 1:
                # one-step re-noising (sampler_sdf.py:337-341); note the reference
                # multiplies noise by beta (not sqrt(beta)) — kept for parity
                renoised = (1.0 - tbl.beta[step - 1]) ** 0.5 * x_out + tbl.beta[
                    step - 1
                ] * noise_u[u, 2]
                x_t = jnp.where(step > 0, renoised, x_out)
        return x_out, None

    x, _ = jax.lax.scan(body, x, (steps, per_step))
    return x


# ---------------------------------------------------------------------------
# DDIM
# ---------------------------------------------------------------------------


def _ddim_tables(dd: DDIMSchedule):
    return (
        jnp.asarray(dd.time_steps),
        jnp.asarray(dd.alpha),
        jnp.asarray(dd.alpha_prev),
        jnp.asarray(dd.sigma),
        jnp.asarray(dd.sqrt_one_minus_alpha),
        jnp.asarray(dd.alpha_sqrt),
    )


def _ddim_step(dd_tbl, eps_fn, params, x, cond, step, index, noise, cond_concat):
    """One DDIM update (DDIMSampler.get_x_prev_and_pred_x0, sampler_ddim.py:220-272)."""
    _, alpha, alpha_prev, sigma, sqrt_1m_alpha, _ = dd_tbl
    bsz = x.shape[0]
    ts = jnp.full((bsz,), step, dtype=jnp.int32)
    e_t = eps_fn(params, x, ts, cond, cond_concat).astype(x.dtype)
    pred_x0 = (x - sqrt_1m_alpha[index] * e_t) / (alpha[index] ** 0.5)
    dir_xt = jnp.sqrt(1.0 - alpha_prev[index] - sigma[index] ** 2) * e_t
    noise = jnp.where(sigma[index] == 0.0, jnp.zeros_like(noise), noise)
    return (alpha_prev[index] ** 0.5) * pred_x0 + dir_xt + sigma[index] * noise


def ddim_sample(
    apply_fn: ApplyFn,
    params,
    dd: DDIMSchedule,
    x_last: jnp.ndarray,
    cond: jnp.ndarray,
    rng: jax.Array,
    *,
    uncond_scale: float = 1.0,
    uncond_cond: Optional[jnp.ndarray] = None,
    temperature: float = 1.0,
    t_start: int = 0,
    noise_override=None,
) -> jnp.ndarray:
    """DDIM sampling over the reversed tau grid (DDIMSampler.sample :104-166)."""
    dd_tbl = _ddim_tables(dd)
    eps_fn = make_eps_fn(apply_fn, uncond_scale, uncond_cond)
    n = dd.n_steps
    steps = jnp.asarray(dd.time_steps[::-1][t_start:].copy())
    indices = jnp.asarray(np.arange(n - 1 - t_start, -1, -1), jnp.int32)

    replay = noise_override is not None
    per_step = (
        noise_override * temperature if replay else jax.random.split(rng, len(steps))
    )

    def body(x, inp):
        step, index, nz = inp
        noise = (
            nz
            if replay
            else jax.random.normal(nz, x_last.shape, x_last.dtype) * temperature
        )
        return _ddim_step(dd_tbl, eps_fn, params, x, cond, step, index, noise, None), None

    x, _ = jax.lax.scan(body, x_last, (steps, indices, per_step))
    return x


def ddim_q_sample(
    dd: DDIMSchedule, x0: jnp.ndarray, index, noise: jnp.ndarray
) -> jnp.ndarray:
    """q_sample at DDIM index (DDIMSampler.q_sample, sampler_ddim.py:274-299)."""
    return (
        jnp.asarray(dd.alpha_sqrt)[index] * x0
        + jnp.asarray(dd.sqrt_one_minus_alpha)[index] * noise
    )


def dpmpp_paint(
    apply_fn: ApplyFn,
    params,
    dd: DDIMSchedule,
    x: jnp.ndarray,
    cond: jnp.ndarray,
    t_start: int,
    rng: Optional[jax.Array] = None,
    *,
    orig: Optional[jnp.ndarray] = None,
    mask: Optional[jnp.ndarray] = None,
    orig_noise: Optional[jnp.ndarray] = None,
    uncond_scale: float = 1.0,
    uncond_cond: Optional[jnp.ndarray] = None,
    cond_concat: Optional[jnp.ndarray] = None,
    order: int = 2,
) -> jnp.ndarray:
    """DPM-Solver++ multistep ODE sampling (beyond-reference; Lu et al.,
    arXiv:2211.01095, Algorithm 2 "2M") over the same discrete tau grid and
    schedule tables as the DDIM sampler.

    Data-prediction parameterization: with ``a = sqrt(alpha_bar)``,
    ``s = sqrt(1 - alpha_bar)``, ``lambda = log(a/s)``, ``h_i = lambda_prev - lambda``,
    one transition is::

        x <- (s_prev / s) * x - a_prev * expm1(-h_i) * D

    where ``D`` is the first-order ``x0`` prediction (``order=1`` — algebraically
    IDENTICAL to the DDIM eta=0 update, pinned by tests/test_dpmpp.py) or the
    second-order multistep combination
    ``(1 + 1/(2r)) x0_i - 1/(2r) x0_{i-1}`` with ``r = h_{i-1}/h_i`` (``order=2``),
    which reuses the previous step's prediction at zero extra UNet cost.  The
    practical payoff on the serving path: DDIM-50-grade sample quality at
    10-20 NFEs (measured in PARITY.md).

    Deterministic (probability-flow ODE): ``rng`` is only used to draw
    ``orig_noise`` for the inpainting blend when one isn't supplied.  Masked
    inpainting follows the DDIM paint convention (``sampler_ddim.py:301-362``):
    after each transition the known region is re-noised to the current tau
    level with the FIXED ``orig_noise``; the multistep x0 history tracks the
    blended trajectory.  With ``orig is None`` this is plain generation.
    """
    if order not in (1, 2):
        raise ValueError(f"dpmpp order must be 1 or 2, got {order}")
    eps_fn = make_eps_fn(apply_fn, uncond_scale, uncond_cond)

    # per-index coefficient tables, lambda-space in float64 on host
    a2 = dd.alpha.astype(np.float64)
    ap2 = dd.alpha_prev.astype(np.float64)
    a_t, s_t = np.sqrt(a2), np.sqrt(1.0 - a2)
    a_p, s_p = np.sqrt(ap2), np.sqrt(1.0 - ap2)
    h_t = (np.log(a_p / s_p) - np.log(a_t / s_t)).astype(np.float32)
    a_t, s_t = a_t.astype(np.float32), s_t.astype(np.float32)
    a_p, s_p = a_p.astype(np.float32), s_p.astype(np.float32)
    tab = tuple(jnp.asarray(v) for v in (a_t, s_t, a_p, s_p, h_t))

    steps = jnp.asarray(dd.time_steps[: t_start + 1][::-1].copy())
    n = len(dd.time_steps[: t_start + 1])
    indices = jnp.asarray(np.arange(n - 1, -1, -1), jnp.int32)
    ks = jnp.arange(n, dtype=jnp.int32)

    masked = orig is not None
    if masked:
        assert mask is not None
        if orig_noise is None:
            orig_noise = jax.random.normal(rng, orig.shape, orig.dtype)
        alpha_sqrt = jnp.asarray(dd.alpha_sqrt)
        sqrt_1m = jnp.asarray(dd.sqrt_one_minus_alpha)

    def body(carry, inp):
        xc, x0_prev, h_prev = carry
        step, index, k = inp
        ta, ts_, tap, tsp, th = tab
        bsz = xc.shape[0]
        tvec = jnp.full((bsz,), step, dtype=jnp.int32)
        e_t = eps_fn(params, xc, tvec, cond, cond_concat).astype(xc.dtype)
        x0 = (xc - ts_[index] * e_t) / ta[index]
        hh = th[index]
        if order == 2:
            # first transition has no history: fall back to the 1st-order D
            r = jnp.where(k == 0, jnp.float32(1.0), h_prev / hh)
            c = 0.5 / r
            d = jnp.where(k == 0, x0, (1.0 + c) * x0 - c * x0_prev)
        else:
            d = x0
        xn = (tsp[index] / ts_[index]) * xc - tap[index] * jnp.expm1(-hh) * d
        if masked:
            orig_t = alpha_sqrt[index] * orig + sqrt_1m[index] * orig_noise
            xn = orig_t * mask + xn * (1.0 - mask)
        return (xn, x0, hh), None

    carry0 = (x, jnp.zeros_like(x), jnp.float32(0.0))
    (x, _, _), _ = jax.lax.scan(body, carry0, (steps, indices, ks))
    return x


def dpmpp_sample(
    apply_fn: ApplyFn,
    params,
    dd: DDIMSchedule,
    x_last: jnp.ndarray,
    cond: jnp.ndarray,
    rng: Optional[jax.Array] = None,
    *,
    uncond_scale: float = 1.0,
    uncond_cond: Optional[jnp.ndarray] = None,
    t_start: int = 0,
    order: int = 2,
) -> jnp.ndarray:
    """Plain DPM-Solver++ generation over the full (reversed) tau grid; ``t_start``
    skips leading transitions exactly like ``ddim_sample``."""
    return dpmpp_paint(
        apply_fn,
        params,
        dd,
        x_last,
        cond,
        dd.n_steps - 1 - t_start,
        rng,
        uncond_scale=uncond_scale,
        uncond_cond=uncond_cond,
        order=order,
    )


def ddim_paint(
    apply_fn: ApplyFn,
    params,
    dd: DDIMSchedule,
    x: jnp.ndarray,
    cond: jnp.ndarray,
    t_start: int,
    rng: jax.Array,
    *,
    orig: Optional[jnp.ndarray] = None,
    mask: Optional[jnp.ndarray] = None,
    orig_noise: Optional[jnp.ndarray] = None,
    uncond_scale: float = 1.0,
    uncond_cond: Optional[jnp.ndarray] = None,
    cond_concat: Optional[jnp.ndarray] = None,
    noise_override=None,
) -> jnp.ndarray:
    """Mask-blend DDIM inpainting (DDIMSampler.paint, sampler_ddim.py:301-362).

    Iterates tau_{t_start} .. tau_1; after each DDIM update, the known region is
    replaced with ``q_sample(orig, index)`` using the fixed ``orig_noise``.
    """
    dd_tbl = _ddim_tables(dd)
    eps_fn = make_eps_fn(apply_fn, uncond_scale, uncond_cond)
    steps = jnp.asarray(dd.time_steps[: t_start + 1][::-1].copy())
    n = len(dd.time_steps[: t_start + 1])
    indices = jnp.asarray(np.arange(n - 1, -1, -1), jnp.int32)

    masked = orig is not None
    keys = jax.random.split(rng, 2)
    if masked and orig_noise is None:
        orig_noise = jax.random.normal(keys[0], orig.shape, orig.dtype)
    replay = noise_override is not None
    per_step = noise_override if replay else jax.random.split(keys[1], n)

    def body(xc, inp):
        step, index, nz = inp
        noise = nz if replay else jax.random.normal(nz, x.shape, x.dtype)
        xc = _ddim_step(dd_tbl, eps_fn, params, xc, cond, step, index, noise, cond_concat)
        if masked:
            orig_t = ddim_q_sample(dd, orig, index, orig_noise)
            xc = orig_t * mask + xc * (1.0 - mask)
        return xc, None

    x, _ = jax.lax.scan(body, x, (steps, indices, per_step))
    return x
