"""Generation / inpainting inference pipeline + CLI.

Counterpart of the reference driver (``inference_sdf.py``): whole-song conditioning
from the val split or an arbitrary MIDI, plain generation, RePaint inpainting with
mask builders ({remaining, below, above, bars}), arbitrary-length autoregressive
generation with 4-bar overlap, DDPM or DDIM sampling with classifier-free guidance.

TPU-first mechanics: each 8-bar paint is one jitted ``lax.scan`` over all denoising
steps; the autoregressive outer loop stays in Python (O(length) iterations over a
single compiled shape).  Masks and stitching are host NumPy.
"""

from __future__ import annotations

import argparse
import os
import pickle
from datetime import datetime
from typing import Optional

import numpy as np

from .config import Params, load_params
from .data.dataset import SongNpz
from .diffusion import make_ddim_schedule
from .diffusion import sampler as S
from .tasks.sdf import SDFTask
from .utils.midi_io import prmat2c_to_midi_file


# ---------------------------------------------------------------------------
# mask builders (reference inference_sdf.py:132-193), vectorized host NumPy
# ---------------------------------------------------------------------------


def _forward_fill(vals: np.ndarray, empty_marker: int) -> np.ndarray:
    """Replace ``empty_marker`` entries with the previous valid value; leading
    entries take the first valid value (reference :145-151, :167-173)."""
    valid = vals != empty_marker
    if not valid.any():
        return vals.copy()
    # index of the most recent valid entry at each position (cummax of indices)
    idx = np.maximum.accumulate(np.where(valid, np.arange(len(vals)), -1))
    idx = np.where(idx < 0, np.argmax(valid), idx)  # leading run -> first valid
    return vals[idx]


def get_mask(orig: np.ndarray, inpaint_type: str, bar_list=None) -> np.ndarray:
    """Inpainting masks over (B, 2, 128, 128); mask==1 marks the *kept* region."""
    b, _, n_step, n_pitch = orig.shape
    if inpaint_type == "remaining":
        return orig.copy()

    if inpaint_type in ("below", "above"):
        onset = orig[:, 0].reshape(b * n_step, n_pitch)
        if inpaint_type == "below":
            pitch = onset.argmax(axis=1)  # lowest sounding pitch (first 1)
            pitch = _forward_fill(pitch, 0)
            cols = np.arange(n_pitch)[None, :]
            mask2d = (cols >= pitch[:, None]).astype(np.float32)
        else:
            pitch = n_pitch - 1 - onset[:, ::-1].argmax(axis=1)  # highest pitch
            pitch = _forward_fill(pitch, n_pitch - 1)
            cols = np.arange(n_pitch)[None, :]
            mask2d = (cols <= pitch[:, None]).astype(np.float32)
        mask = mask2d.reshape(b, 1, n_step, n_pitch)
        return np.broadcast_to(mask, orig.shape).copy()

    if inpaint_type == "bars":
        assert bar_list is not None, "bars inpainting needs --bar_list"
        mask = np.ones_like(orig)
        for bar in bar_list:
            mask[:, :, bar * 16 : bar * 16 + 16, :] = 0
        return mask

    raise NotImplementedError(inpaint_type)


def get_autoreg_data(data: np.ndarray, axis: int, seg_axis: int = 0) -> np.ndarray:
    """The 4-bar-overlap "mid" segments: (second half | next segment's first half)
    (reference inference_sdf.py:121-129).  ``seg_axis`` is the 8-bar-segment
    axis (0 for per-piece arrays, 1 for piece-major (P, B, ...) stacks)."""
    half1, half2 = np.split(data, 2, axis=axis)
    half1 = np.roll(half1, -1, axis=seg_axis)
    return np.concatenate([half2, half1], axis=axis)


# ---------------------------------------------------------------------------
# checkpoint loading
# ---------------------------------------------------------------------------


def load_unet_params(
    chkpt_path: str, task, torch_converter=None, prefixes=None, use_ema: bool = False
):
    """Load UNet weights from an orbax run dir, a torch legacy ``.pt``, or a
    lightning ``.ckpt`` (reference inference_sdf.py:702-734).

    ``use_ema``: prefer the EMA parameter branch when the run was trained with
    the ``ema_decay`` config key (orbax run dirs only).
    """
    if os.path.isdir(chkpt_path):
        import jax
        import orbax.checkpoint as ocp

        from .train import create_state, make_optimizer

        ckpt_dir = (
            os.path.join(chkpt_path, "chkpts")
            if os.path.isdir(os.path.join(chkpt_path, "chkpts"))
            else chkpt_path
        )
        mgr = ocp.CheckpointManager(ckpt_dir)
        step = mgr.latest_step()
        assert step is not None, f"no checkpoints under {ckpt_dir}"
        from .parallel.mesh import init_on_cpu

        optimizer = make_optimizer(1e-4)
        # the template must mirror the run's state structure (ema branch or not)
        template = create_state(
            init_on_cpu(task.init_params, jax.random.PRNGKey(0)),
            optimizer,
            ema_decay=task.cfg.get("ema_decay", None),
        )
        restored = mgr.restore(
            step, args=ocp.args.StandardRestore({"state": template})
        )
        state = restored["state"]
        if use_ema:
            assert state.ema is not None, (
                "--use_ema: this run has no EMA branch (train with ema_decay)"
            )
            return state.ema
        return state.params

    if use_ema:
        raise ValueError(
            "--use_ema needs an orbax run directory (torch checkpoints carry no EMA branch)"
        )
    from .convert.torch_import import torch_file_to_numpy, unet_params_from_torch

    torch_converter = torch_converter or unet_params_from_torch
    prefixes = prefixes or ("model.ldm.eps_model.", "ldm.eps_model.", "eps_model.")
    sd = torch_file_to_numpy(chkpt_path)
    # strip task prefixes: legacy learner "ldm.eps_model.", lightning "model.ldm.eps_model."
    for prefix in prefixes:
        hit = {k[len(prefix):]: v for k, v in sd.items() if k.startswith(prefix)}
        if hit:
            return torch_converter(hit)
    return torch_converter(sd)


# ---------------------------------------------------------------------------
# inference session
# ---------------------------------------------------------------------------


class InferenceSession:
    """Bundles a task + params + sampler choice into generate/inpaint calls."""

    def __init__(
        self,
        task: SDFTask,
        params,
        *,
        use_ddim: bool = False,
        ddim_steps: Optional[int] = None,
        ddim_eta: float = 0.0,
        ddim_discretize: str = "uniform",
        sampler: Optional[str] = None,
        dpm_order: int = 2,
        repaint_n: int = 1,
        seed: int = 0,
        mesh=None,
        bf16_params: bool = False,
        traced_cfg_scale: bool = False,
        fsdp_params: bool = False,
    ):
        """``mesh``: optional dp mesh — batch-shards sampling across devices
        (params replicated); batch must divide the mesh size.

        ``fsdp_params``: with ``mesh``, place the weights ZeRO-3-sharded over
        dp instead of replicated (parallel/fsdp.py) — GSPMD all-gathers each
        layer at its use site.  For models whose weights don't fit one chip's
        HBM at sampling time.

        ``bf16_params``: cast non-norm parameters to bfloat16 once at load —
        halves per-eval weight traffic on the bandwidth-bound sampling path
        (see utils/precision.py).  Off by default to keep fp32 trajectory
        parity with the torch reference.

        ``traced_cfg_scale``: pass the CFG scale into the compiled sampler as
        a TRACED scalar — ONE executable serves every guidance scale (vs one
        20-60 min TPU compile per scale), at the cost of running the
        double-batched CFG path even for s in {0, 1}.  The scale sweep of
        ``expr --type chd_acc`` and multi-scale serving want this on."""
        import jax

        self.task = task
        self.mesh = mesh
        if bf16_params:
            from .utils.precision import cast_sampling_params

            params = cast_sampling_params(params)
        if mesh is not None:
            if fsdp_params:
                from .parallel.fsdp import infer_fsdp_sharding

                params = jax.device_put(params, infer_fsdp_sharding(params, mesh))
            else:
                from .parallel.mesh import replicated

                params = jax.device_put(params, replicated(mesh))
        else:
            # orbax restores onto the CPU backend (the template is built there
            # to keep init off the slow remote-dispatch path); committed CPU
            # arrays would make every jitted sampler compile FOR CPU — place
            # explicitly on the default accelerator
            params = jax.device_put(params, jax.devices()[0])
        self.params = params
        self.cfg = task.cfg
        # sampler kind: "ddpm" (ancestral), "ddim", or "dpmpp" (DPM-Solver++
        # multistep ODE on the DDIM tau grid — DDIM-grade quality at 10-20
        # steps; see diffusion/sampler.py:dpmpp_paint).  ``use_ddim`` is kept
        # as the legacy boolean spelling.
        if sampler is None:
            sampler = "ddim" if use_ddim else "ddpm"
        if sampler not in ("ddpm", "ddim", "dpmpp"):
            raise ValueError(f"unknown sampler {sampler!r}")
        self.sampler_kind = sampler
        self.dpm_order = dpm_order
        self.use_ddim = sampler in ("ddim", "dpmpp")  # tau-grid samplers
        self.repaint_n = repaint_n
        self.schedule = task.schedule
        # progressively-distilled students (distill.py) carry their exact tau
        # grid and baked-in guidance scale in the run config; stage-B students
        # must be sampled on THAT grid (stage-A-only students work on any grid)
        grid = task.cfg.get("distill_grid")
        self.distilled_scale = (
            task.cfg.get("distilled_scale") if task.cfg.get("v_prediction") else None
        )
        self._scale_warned = False
        if grid is not None and not self.use_ddim:
            print(
                "[inference] WARNING: distilled (stage-B) checkpoint sampled with "
                f"the {self.schedule.n_steps}-step ancestral DDPM sampler — the "
                f"student was trained only on its {len(grid)}-step grid; use the "
                "ddim/dpmpp sampler"
            )
        # ddim_steps=None: the distilled checkpoint's own grid if it has one,
        # else 50 — resolved HERE so every caller (inference/serve/expr CLIs)
        # inherits the pin, and an explicit ddim_steps always wins
        if ddim_steps is None:
            ddim_steps = 50 if grid is None else len(grid)
            if grid is not None and self.use_ddim:
                print(
                    f"[inference] distilled checkpoint: using its "
                    f"{ddim_steps}-step grid"
                )
        on_grid = self.use_ddim and grid is not None and ddim_steps == len(grid)
        self.ddim = (
            make_ddim_schedule(
                self.schedule, ddim_steps, ddim_discretize, ddim_eta,
                time_steps=np.asarray(grid) if on_grid else None,
            )
            if self.use_ddim
            else None
        )
        if self.use_ddim and grid is not None and not on_grid:
            print(
                f"[inference] note: distilled grid has {len(grid)} steps; sampling "
                f"on a uniform {ddim_steps}-step grid instead (valid for stage-A "
                f"students, off-distribution for stage-B ones)"
            )
        self.ddim_label = (
            f"dpmpp{dpm_order}m_{ddim_steps}_{ddim_discretize}"
            if sampler == "dpmpp"
            else f"ddim{ddim_steps}_eta{ddim_eta}_"
            + ("distilled" if on_grid else ddim_discretize)
        )
        self.rng = jax.random.PRNGKey(seed)
        self.traced_cfg = traced_cfg_scale
        self._paint_cache = {}

    def _next_rng(self):
        import jax

        self.rng, sub = jax.random.split(self.rng)
        return sub

    @property
    def t_idx(self) -> int:
        return (self.ddim.n_steps if self.use_ddim else self.schedule.n_steps) - 1

    def _q_sample_start(self, orig_nhwc, noise):
        from .diffusion.gaussian import q_sample_step
        from .diffusion.sampler import ddim_q_sample

        if self.use_ddim:
            return ddim_q_sample(self.ddim, orig_nhwc, self.t_idx, noise)
        return q_sample_step(self.schedule, orig_nhwc, self.t_idx, noise)

    def _paint_fn(self, uncond_scale: float):
        """Jitted full-loop paint for a given CFG scale (compiled once per shape;
        with ``traced_cfg_scale`` the scale is a runtime argument and ONE
        executable covers every scale)."""
        import jax

        key = (
            "traced" if self.traced_cfg else uncond_scale,
            self.sampler_kind,
            self.repaint_n,
        )
        if key not in self._paint_cache:
            traced = self.traced_cfg
            concat_blurry = getattr(self.task, "concat_blurry", False)
            concat_ratio = getattr(self.task, "concat_ratio", 0.25)

            def cond_concat_of(orig):
                if not concat_blurry:
                    return None
                from .tasks.sdf import blurry_image

                return blurry_image(orig, concat_ratio)

            if self.sampler_kind == "dpmpp":

                def paint(params, x, cond, rng, orig, mask, orig_noise, uncond_cond,
                          scale):
                    return S.dpmpp_paint(
                        self.task.apply_eps,
                        params,
                        self.ddim,
                        x,
                        cond,
                        self.t_idx,
                        rng,
                        orig=orig,
                        mask=mask,
                        orig_noise=orig_noise,
                        uncond_scale=scale if traced else uncond_scale,
                        uncond_cond=uncond_cond,
                        cond_concat=cond_concat_of(orig),
                        order=self.dpm_order,
                    )

            elif self.use_ddim:

                def paint(params, x, cond, rng, orig, mask, orig_noise, uncond_cond,
                          scale):
                    return S.ddim_paint(
                        self.task.apply_eps,
                        params,
                        self.ddim,
                        x,
                        cond,
                        self.t_idx,
                        rng,
                        orig=orig,
                        mask=mask,
                        orig_noise=orig_noise,
                        uncond_scale=scale if traced else uncond_scale,
                        uncond_cond=uncond_cond,
                        cond_concat=cond_concat_of(orig),
                    )

            else:

                def paint(params, x, cond, rng, orig, mask, orig_noise, uncond_cond,
                          scale):
                    del orig_noise
                    return S.ddpm_paint(
                        self.task.apply_eps,
                        params,
                        self.schedule,
                        x,
                        cond,
                        self.t_idx,
                        rng,
                        orig=orig,
                        mask=mask,
                        uncond_scale=scale if traced else uncond_scale,
                        uncond_cond=uncond_cond,
                        cond_concat=cond_concat_of(orig),
                        repaint_n=self.repaint_n,
                    )

            self._paint_cache[key] = jax.jit(paint)
        return self._paint_cache[key]

    # -- prediction ------------------------------------------------------------

    def predict(
        self,
        cond: np.ndarray,
        cond_mid: Optional[np.ndarray] = None,
        uncond_scale: float = 1.0,
        autoreg: bool = False,
        orig: Optional[np.ndarray] = None,
        mask: Optional[np.ndarray] = None,
        noise: Optional[np.ndarray] = None,
    ) -> np.ndarray:
        """Generate/inpaint (B, 2, 128, 128) images (reference Experiments.predict).

        Plain path: start from q_sample(orig=0) noise and paint with zero mask.
        Autoreg path: 2B-1 sliding 8-bar windows, forcing each window's first 4
        bars to the previous window's last 4 bars (mask=1 there).  Piece-batched
        autoreg: pass ``cond`` with a leading pieces axis — (P, B, 1, d_cond) —
        and P independent pieces ride the SAME 2B-1 sequential windows at batch
        P instead of idling the chip at batch 1 (the reference generates
        ``--num_generate`` pieces serially, inference_sdf.py:305-350); returns
        (P, 2B, C, half, W).

        ``noise``: optional explicit starting noise (NHWC, matching the cond
        batch layout) — reproducibility hook; drawn from the session rng when
        omitted.
        """
        import jax.numpy as jnp

        if (
            self.distilled_scale is not None
            and uncond_scale != 1.0
            and not self._scale_warned
        ):
            self._scale_warned = True
            print(
                f"[inference] note: this student bakes in CFG scale "
                f"{self.distilled_scale}; sample it at --uncond_scale 1 "
                f"(got {uncond_scale}: that guidance applies ON TOP)"
            )
        if autoreg:
            assert cond_mid is not None, "autoreg needs the mid-window conditions"
            if cond.ndim == 4:  # (P, B, 1, d): piece-batched
                return self._predict_autoreg(
                    cond, cond_mid, uncond_scale, orig, mask, noise
                )
            out = self._predict_autoreg(
                cond[None],
                cond_mid[None],
                uncond_scale,
                None if orig is None else orig[None],
                None if mask is None else mask[None],
                None if noise is None else noise[None],
            )
            return out[0]

        b = cond.shape[0]
        h, w = self.cfg.img_h, self.cfg.img_w
        shape = (b, h, w, self.cfg.out_channels)  # NHWC
        uncond_cond = -np.ones((b, 1, self.cfg.d_cond), np.float32)

        if orig is None or mask is None:
            orig = np.zeros((b, self.cfg.out_channels, h, w), np.float32)
            mask = np.zeros_like(orig)

        orig_nhwc = np.transpose(orig, (0, 2, 3, 1))
        mask_nhwc = np.transpose(mask, (0, 2, 3, 1))
        import jax

        if noise is None:
            noise = np.asarray(jax.random.normal(self._next_rng(), shape, jnp.float32))
        paint = self._paint_fn(uncond_scale)

        from .parallel.mesh import batch_sharding

        def put(a):
            a = jnp.asarray(a)
            if self.mesh is not None and a.ndim >= 1:
                return jax.device_put(a, batch_sharding(self.mesh))
            return a

        scale_arg = jnp.float32(uncond_scale)
        xt = self._q_sample_start(put(orig_nhwc), put(noise))
        gen = paint(
            self.params,
            xt,
            put(cond),
            self._next_rng(),
            put(orig_nhwc),
            put(mask_nhwc),
            put(noise),
            put(uncond_cond),
            scale_arg,
        )
        return np.transpose(np.asarray(gen), (0, 3, 1, 2))

    def _predict_autoreg(
        self,
        conds: np.ndarray,
        cond_mids: np.ndarray,
        uncond_scale: float,
        origs: Optional[np.ndarray] = None,
        masks: Optional[np.ndarray] = None,
        noise: Optional[np.ndarray] = None,
    ) -> np.ndarray:
        """Piece-batched sliding-window generation.

        ``conds``: (P, B, 1, d_cond); ``cond_mids``: (P, B-1, 1, d_cond);
        ``origs``/``masks``: optional (P, B, C, H, W); ``noise``: optional
        (P, B, H, W, C).  The windows within a piece are inherently sequential
        (each forces its first half to the previous window's output), but
        ACROSS pieces the work is embarrassingly parallel — each of the 2B-1
        paints runs at batch P on one executable.  Returns (P, 2B, C, H/2, W),
        each piece stitched from its 4-bar half-windows.
        """
        import jax
        import jax.numpy as jnp

        P, B = conds.shape[:2]
        h, w = self.cfg.img_h, self.cfg.img_w
        c_out = self.cfg.out_channels
        half = h // 2

        if origs is None or masks is None:
            origs = np.zeros((P, B, c_out, h, w), np.float32)
            masks = np.zeros_like(origs)
        orig_nhwc = np.transpose(origs, (0, 1, 3, 4, 2))  # (P, B, H, W, C)
        mask_nhwc = np.transpose(masks, (0, 1, 3, 4, 2))

        if noise is None:
            if P == 1:
                # preserve the single-piece seed stream exactly (pre-round-4
                # autoreg draws; PARITY.md seed-stream notes)
                noise = np.asarray(
                    jax.random.normal(self._next_rng(), (B, h, w, c_out), jnp.float32)
                )[None]
            else:
                # one dispatch + one device->host pull for ALL pieces (a per-p
                # loop costs 2P round trips on the remote-attached chip); the
                # vmapped fold_in/normal draws the same per-piece streams
                key = self._next_rng()
                keys = jax.vmap(lambda p: jax.random.fold_in(key, p))(jnp.arange(P))
                noise = np.asarray(
                    jax.vmap(
                        lambda k: jax.random.normal(k, (B, h, w, c_out), jnp.float32)
                    )(keys)
                )

        # mid-window views: time axis 2, segment axis 1 (piece-major)
        orig_mid = get_autoreg_data(orig_nhwc, axis=2, seg_axis=1)
        mask_mid = get_autoreg_data(mask_nhwc, axis=2, seg_axis=1)
        noise_mid = get_autoreg_data(noise, axis=2, seg_axis=1)

        # Device-resident loop: push the (P, B, ...) stacks ONCE, slice and
        # force-update on device, pull the stitched result ONCE at the end.
        # The remote-attached chip makes per-window host round trips the
        # dominant cost (CLAUDE.md: 100-1000x a local chip); with everything
        # jnp the 2B-1 sequential paints dispatch asynchronously and nothing
        # blocks until the final gather.
        orig_d, mask_d, noise_d = map(jnp.asarray, (orig_nhwc, mask_nhwc, noise))
        orig_mid_d, mask_mid_d, noise_mid_d = map(
            jnp.asarray, (orig_mid, mask_mid, noise_mid)
        )
        conds_d, cond_mids_d = jnp.asarray(conds), jnp.asarray(cond_mids)

        uncond_seg = jnp.asarray(-np.ones((P, 1, self.cfg.d_cond), np.float32))
        scale_arg = jnp.float32(uncond_scale)
        paint = self._paint_fn(uncond_scale)

        gen = []  # list of (P, half, W, C) device arrays
        prev_half = None
        for idx in range(B * 2 - 1):
            if idx % 2 == 1:
                c, o, m, nz = (
                    cond_mids_d[:, idx // 2],
                    orig_mid_d[:, idx // 2],
                    mask_mid_d[:, idx // 2],
                    noise_mid_d[:, idx // 2],
                )
            else:
                c, o, m, nz = (
                    conds_d[:, idx // 2],
                    orig_d[:, idx // 2],
                    mask_d[:, idx // 2],
                    noise_d[:, idx // 2],
                )
            if idx != 0:
                o = o.at[:, 0:half].set(prev_half)
                m = m.at[:, 0:half].set(1.0)
            xt = self._q_sample_start(o, nz)
            x0 = paint(
                self.params, xt, c, self._next_rng(), o, m, nz, uncond_seg, scale_arg
            )
            if idx == 0:
                gen.append(x0[:, 0:half])
            prev_half = x0[:, half:]
            gen.append(prev_half)

        stacked = np.asarray(jnp.stack(gen, axis=1))  # (P, 2B, half, W, C)
        return np.transpose(stacked, (0, 1, 4, 2, 3))

    # -- user-facing ops ----------------------------------------------------------

    def generate(
        self,
        cond,
        cond_mid=None,
        uncond_scale: float = 1.0,
        autoreg: bool = False,
        output_dir: Optional[str] = None,
        model_label: str = "sdf",
        no_output: bool = False,
    ):
        gen = self.predict(cond, cond_mid, uncond_scale, autoreg)
        if not no_output and output_dir:
            stamp = (
                f"{model_label}[scale={uncond_scale}"
                f"{',autoreg' if autoreg else ''}"
                f"{',' + self.ddim_label if self.use_ddim else ''}]"
                f"_{datetime.now().strftime('%y-%m-%d_%H%M%S')}"
            )
            os.makedirs(output_dir, exist_ok=True)
            if gen.ndim == 5:  # piece-batched autoreg: one MIDI per piece
                for p in range(gen.shape[0]):
                    prmat2c_to_midi_file(
                        gen[p], os.path.join(output_dir, f"{stamp}_{p}.mid")
                    )
            else:
                prmat2c_to_midi_file(gen, os.path.join(output_dir, f"{stamp}.mid"))
        return gen

    def inpaint(
        self,
        orig: np.ndarray,
        inpaint_type: str,
        cond,
        cond_mid=None,
        autoreg: bool = False,
        uncond_scale: float = 1.0,
        bar_list=None,
        output_dir: Optional[str] = None,
        model_label: str = "sdf",
        no_output: bool = False,
    ):
        mask = get_mask(orig, inpaint_type, bar_list)
        gen = self.predict(cond, cond_mid, uncond_scale, autoreg, orig, mask)
        if not no_output and output_dir:
            stamp = (
                f"{model_label}_inp{self.repaint_n}_{inpaint_type}"
                f"[scale={uncond_scale}"
                f"{',autoreg' if autoreg else ''}"
                f"{',' + self.ddim_label if self.use_ddim else ''}]"
                f"_{datetime.now().strftime('%y-%m-%d_%H%M%S')}"
            )
            os.makedirs(output_dir, exist_ok=True)
            prmat2c_to_midi_file(
                gen, os.path.join(output_dir, f"{stamp}.mid"), inp_mask=mask
            )
        return gen, mask


# ---------------------------------------------------------------------------
# condition preparation from data sources
# ---------------------------------------------------------------------------


def song_conditions(task: SDFTask, song_data, length: int = 0, autoreg: bool = False):
    """Whole-song (prmat2c, pnotree, chord, prmat) -> (cond, cond_mid, prmat2c)."""
    import jax.numpy as jnp

    prmat2c, pnotree, chord, prmat = song_data
    if length and length > 0:
        prmat2c, pnotree, chord, prmat = (
            prmat2c[:length],
            pnotree[:length],
            chord[:length],
            prmat[:length],
        )
    batch = (
        jnp.asarray(prmat2c),
        jnp.asarray(pnotree),
        jnp.asarray(chord),
        jnp.asarray(prmat),
    )
    cond = np.asarray(task.encode_cond(batch, rng=None))
    cond_mid = None
    if autoreg:
        chord_mid = get_autoreg_data(np.asarray(chord), axis=1)
        pnotree_mid = get_autoreg_data(np.asarray(pnotree), axis=1)
        prmat_mid = get_autoreg_data(np.asarray(prmat), axis=1)
        prmat2c_mid = get_autoreg_data(np.asarray(prmat2c), axis=2)
        batch_mid = (
            jnp.asarray(prmat2c_mid),
            jnp.asarray(pnotree_mid),
            jnp.asarray(chord_mid),
            jnp.asarray(prmat_mid),
        )
        cond_mid = np.asarray(task.encode_cond(batch_mid, rng=None))
    return cond, cond_mid, np.asarray(prmat2c)


def build_task_for_inference(params_cfg: Params, pretrained_dir: Optional[str] = None) -> SDFTask:
    """Construct an SDFTask with frozen encoders when the config requires them."""
    kwargs = {}
    if params_cfg.get("use_enc", False):
        from .models.encoders import build_frozen_encoders

        kwargs = build_frozen_encoders(params_cfg, pretrained_dir)
    return SDFTask(params_cfg, **kwargs)


# ---------------------------------------------------------------------------
# CLI
# ---------------------------------------------------------------------------


def _main_ddpm(cfg, args):
    """Unconditional generation with the plain DDPM model family
    (reference ``inference.py``)."""
    import jax
    import jax.numpy as jnp

    from .diffusion import sampler as S
    from .tasks.ddpm import DDPMTask
    from .convert.torch_import import ddpm_unet_params_from_torch

    task = DDPMTask(cfg)
    params = load_unet_params(
        args.chkpt_path,
        task,
        torch_converter=ddpm_unet_params_from_torch,
        prefixes=("model.ddpm.eps_model.", "ddpm.eps_model.", "eps_model."),
        use_ema=getattr(args, "use_ema", False),
    )
    rng = jax.random.PRNGKey(args.seed)
    b = max(args.length, 1)
    h = cfg.get("image_size_h", 128)
    w = cfg.get("image_size_w", 128)
    c = cfg.get("image_channels", 2)
    os.makedirs(args.output_dir, exist_ok=True)
    for i in range(args.num_generate):
        rng, k1, k2 = jax.random.split(rng, 3)
        x_last = jax.random.normal(k1, (b, h, w, c))
        cond = jnp.zeros((b, 1, 1))
        if args.ddim:
            dd = make_ddim_schedule(
                task.schedule, args.ddim_steps or 50, args.ddim_discretize,
                args.ddim_eta,
            )
            gen = S.ddim_sample(task.apply_eps, params, dd, x_last, cond, k2)
        else:
            gen = S.ddpm_sample(task.apply_eps, params, task.schedule, x_last, cond, k2)
        out = np.transpose(np.asarray(gen), (0, 3, 1, 2))
        stamp = datetime.now().strftime("%y-%m-%d_%H%M%S")
        prmat2c_to_midi_file(out, os.path.join(args.output_dir, f"ddpm_{stamp}_{i}.mid"))
    print(f"wrote {args.num_generate} output(s) to {args.output_dir}")


def main(argv=None):
    # NOTE: the fused GN+SiLU+conv Pallas kernel (POLYFF_FUSED_GN_CONV=1) is
    # opt-in — measured ~2x SLOWER than XLA's conv path on the headline
    # sampling benchmark (6.69 vs 13.7 samples/s, TODO.md round-2 log).
    p = argparse.ArgumentParser(description="polyffusion_tpu generation / inpainting")
    p.add_argument("--model", default=None, help="params preset name (default: from ckpt dir)")
    p.add_argument("--chkpt_path", required=True, help="run dir (orbax) or torch .pt/.ckpt")
    p.add_argument("--uncond_scale", type=float, default=1.0)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--length", type=int, default=0, help="number of 8-bar segments (0 = whole song)")
    p.add_argument("--num_generate", type=int, default=1)
    p.add_argument("--autoreg", action="store_true")
    p.add_argument("--ddim", action="store_true")
    p.add_argument("--ddim_steps", type=int, default=None,
                   help="tau grid size (default: 50, or a distilled "
                   "checkpoint's own grid)")
    p.add_argument("--ddim_eta", type=float, default=0.0)
    p.add_argument("--ddim_discretize", default="uniform", choices=["uniform", "quad"])
    p.add_argument(
        "--dpmpp",
        action="store_true",
        help="DPM-Solver++ multistep ODE sampler (beyond-reference): DDIM-grade "
        "quality at 10-20 steps — combine with --ddim_steps N for the grid size",
    )
    p.add_argument("--dpm_order", type=int, default=2, choices=[1, 2])
    p.add_argument("--repaint_n", type=int, default=1)
    p.add_argument("--inpaint_type", default=None, choices=[None, "remaining", "below", "above", "bars"])
    p.add_argument("--bar_list", default=None, help="comma-separated bars for --inpaint_type bars")
    p.add_argument("--data_dir", default=None, help="npz dir for conditioning/inpainting source")
    p.add_argument("--song_fn", default=None, help="song npz filename (non-interactive)")
    p.add_argument("--split_file", default=None, help="pickled (train, val) split; choose from val")
    p.add_argument("--song_index", type=int, default=0, help="index into the val split")
    p.add_argument("--from_midi", default=None, help="condition from an arbitrary MIDI file")
    p.add_argument(
        "--from_midi2",
        default=None,
        help="texture source MIDI for chord+txt models (reference --from_midi2)",
    )
    p.add_argument(
        "--inpaint_from_midi",
        default=None,
        help="MIDI supplying the song to be inpainted (default: the conditioning song)",
    )
    p.add_argument(
        "--inpaint_song_fn",
        default=None,
        help="npz song (in --data_dir) to be inpainted",
    )
    p.add_argument("--pretrained_dir", default=None, help="dir with pretrained encoder checkpoints")
    p.add_argument("--output_dir", default="exp")
    p.add_argument(
        "--polydis_recon",
        action="store_true",
        help="re-render outputs through the pretrained PolyDis VAE (aftertouch)",
    )
    p.add_argument("--polydis_path", default=None, help="PolyDis torch checkpoint")
    p.add_argument(
        "--polydis_chd_resample",
        action="store_true",
        help="resample the chord latent from the prior in aftertouch re-rendering",
    )
    p.add_argument(
        "--split_inpaint",
        action="store_true",
        help="only split the source prmat2c by the inpainting mask into a two-track "
        "MIDI and exit (reference inference_sdf.py:645-651)",
    )
    p.add_argument(
        "--use_ema",
        action="store_true",
        help="sample from the EMA parameter branch (runs trained with ema_decay)",
    )
    p.add_argument(
        "--bf16_params",
        action="store_true",
        help="cast UNet weights to bfloat16 for sampling (faster on TPU; tiny "
        "numerical deviation from the fp32 reference trajectories)",
    )
    p.add_argument(
        "--dump_images",
        action="store_true",
        help="save piano-roll PNGs of outputs + a q-noise sequence of the source "
        "(reference show_image / show_q_imgs)",
    )
    args = p.parse_args(argv)

    from .config import enable_compile_cache

    enable_compile_cache()

    # resolve params: run dir's params.yaml, or preset name
    if args.model is None and os.path.isdir(args.chkpt_path):
        cfg = load_params(os.path.join(args.chkpt_path, "params.yaml"))
    else:
        cfg = load_params(args.model or "sdf_chd8bar")

    if cfg.get("model_name") == "ddpm":
        return _main_ddpm(cfg, args)

    task = build_task_for_inference(cfg, args.pretrained_dir)
    params = load_unet_params(args.chkpt_path, task, use_ema=args.use_ema)
    session = InferenceSession(
        task,
        params,
        use_ddim=args.ddim,
        ddim_steps=args.ddim_steps,
        ddim_eta=args.ddim_eta,
        ddim_discretize=args.ddim_discretize,
        sampler="dpmpp" if args.dpmpp else None,
        dpm_order=args.dpm_order,
        repaint_n=args.repaint_n,
        seed=args.seed,
        bf16_params=args.bf16_params,
    )

    # conditioning source
    if args.from_midi:
        from .data.midi_to_data import song_from_midi

        song = song_from_midi(args.from_midi)
        song_data = song.get_whole_song_data()
    else:
        assert args.data_dir, "--data_dir (or --from_midi) is required"
        song_fn = args.song_fn
        if song_fn is None and args.split_file:
            with open(args.split_file, "rb") as f:
                split = pickle.load(f)
            song_fn = split[1][args.song_index]
        assert song_fn, "--song_fn or --split_file required"
        song_data = SongNpz(song_fn, args.data_dir).get_whole_song_data()

    # chord+txt: optionally take the texture (prmat) from a second MIDI
    if args.from_midi2 and task.cond_type == "chord+txt":
        from .data.midi_to_data import song_from_midi

        song2 = song_from_midi(args.from_midi2).get_whole_song_data()
        n = min(song_data[0].shape[0], song2[0].shape[0])
        song_data = (song_data[0][:n], song_data[1][:n], song_data[2][:n], song2[3][:n])

    cond, cond_mid, prmat2c = song_conditions(task, song_data, args.length, args.autoreg)

    # inpainting source may come from a different song/MIDI (reference
    # --inpaint_from_midi, inference_sdf.py:569-591)
    if args.inpaint_from_midi or args.inpaint_song_fn:
        if args.inpaint_from_midi:
            from .data.midi_to_data import song_from_midi

            inp_song = song_from_midi(args.inpaint_from_midi)
        else:
            inp_song = SongNpz(args.inpaint_song_fn, args.data_dir)
        prmat2c_inp = inp_song.get_whole_song_data()[0]
        n = min(len(cond), prmat2c_inp.shape[0])
        cond, prmat2c = cond[:n], prmat2c_inp[:n]
        if cond_mid is not None:
            cond_mid = cond_mid[: max(n - 1, 0)]

    label = cfg.get("model_name", "sdf")

    if args.split_inpaint:
        assert args.inpaint_type, "--split_inpaint requires --inpaint_type"
        bar_list = (
            [int(x) for x in args.bar_list.split(",")] if args.bar_list else None
        )
        mask = get_mask(prmat2c, args.inpaint_type, bar_list)
        os.makedirs(args.output_dir, exist_ok=True)
        out = os.path.join(args.output_dir, f"{label}_split_{args.inpaint_type}.mid")
        prmat2c_to_midi_file(prmat2c, out, inp_mask=mask)
        print(f"split written to {out}")
        return

    if args.dump_images:
        # q-noise visualization sequence (reference Experiments.show_q_imgs,
        # inference_sdf.py:392-400): dump x0 and q_sample(x0, t) at intervals
        import jax

        from .diffusion.gaussian import q_sample_step
        from .utils.image import show_image

        img_dir = os.path.join(args.output_dir, "img")
        os.makedirs(img_dir, exist_ok=True)
        src = np.transpose(prmat2c[:1], (0, 2, 3, 1))
        show_image(prmat2c[:1], os.path.join(img_dir, "q0.png"))
        key = jax.random.PRNGKey(args.seed)
        for step in range(0, session.schedule.n_steps, max(session.schedule.n_steps // 10, 1)):
            key, sub = jax.random.split(key)
            noised = q_sample_step(
                session.schedule, src, step,
                np.asarray(jax.random.normal(sub, src.shape)),
            )
            show_image(
                np.transpose(np.asarray(noised), (0, 3, 1, 2)),
                os.path.join(img_dir, f"q{step + 1}.png"),
            )

    aftertouch = None
    if args.polydis_recon:
        from .models.polydis import PolydisAftertouch

        aftertouch = PolydisAftertouch(model_path=args.polydis_path)

    # piece-batched long-form: N independent pieces ride the same 2B-1 windows
    # at batch N in ONE pass (the reference's --num_generate loop is serial,
    # inference_sdf.py:305-350); aftertouch/inpaint paths keep the loop
    if args.autoreg and args.num_generate > 1 and not args.inpaint_type and aftertouch is None:
        conds = np.broadcast_to(
            cond[None], (args.num_generate,) + cond.shape
        ).copy()
        cond_mids = np.broadcast_to(
            cond_mid[None], (args.num_generate,) + cond_mid.shape
        ).copy()
        session.generate(
            conds,
            cond_mids,
            uncond_scale=args.uncond_scale,
            autoreg=True,
            output_dir=args.output_dir,
            model_label=label,
        )
        print(f"wrote {args.num_generate} output(s) to {args.output_dir} (piece-batched)")
        return

    for i in range(args.num_generate):
        if args.inpaint_type:
            bar_list = (
                [int(x) for x in args.bar_list.split(",")] if args.bar_list else None
            )
            session.inpaint(
                prmat2c,
                args.inpaint_type,
                cond,
                cond_mid,
                autoreg=args.autoreg,
                uncond_scale=args.uncond_scale,
                bar_list=bar_list,
                output_dir=args.output_dir,
                model_label=label,
            )
        else:
            gen = session.generate(
                cond,
                cond_mid,
                uncond_scale=args.uncond_scale,
                autoreg=args.autoreg,
                output_dir=args.output_dir,
                model_label=label,
            )
            if aftertouch is not None:
                from .utils.reprs import prmat2c_to_prmat

                prmat = prmat2c_to_prmat(gen)
                chd = np.asarray(song_data[2])[: prmat.shape[0]]
                # PolyDis operates on 2-bar (32-step) windows with 8-beat chords
                chd8 = chd.reshape(-1, 4, 8, 36)[: prmat.shape[0] // 4].reshape(-1, 8, 36)
                n = min(prmat.shape[0], chd8.shape[0])
                aftertouch.reconstruct(
                    prmat[:n].astype(np.float32),
                    chd8[:n].astype(np.float32),
                    os.path.join(args.output_dir, f"polydis_recon_{i}.mid"),
                    chd_sample=args.polydis_chd_resample,
                )
    print(f"wrote {args.num_generate} output(s) to {args.output_dir}")


if __name__ == "__main__":
    main()
