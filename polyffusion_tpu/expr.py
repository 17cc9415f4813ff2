"""Batch evaluation harness over the validation split (reference ``expr.py``).

Experiment types:
    uncond     unconditional prompt generation + prmat2c integrity check
    inp_below  accompaniment arrangement: inpaint below the melody (melody track only)
    inp_bars   inpaint bars 2-5 of each 8-bar segment, emit the inpainted middle
    chd        chord-conditioned generation (saves the conditioning chords too)
    txt        texture-conditioned generation (saves the conditioning originals)

    python -m polyffusion_tpu.expr --chkpt_path <run dir> --data_dir <npz dir> \
        --type uncond --batch_num 10 --output_dir exp
"""

from __future__ import annotations

import argparse
import os

import numpy as np

from .config import load_params
from .data import BatchLoader, SegmentDataset
from .inference import InferenceSession, build_task_for_inference, load_unet_params
from .utils.midi_io import prmat2c_to_midi_file
from .utils.reprs import check_prmat2c_integrity


def _batches(data_dir, batch_size, num, use_track=(0, 1, 2), split_file=None):
    if split_file:
        _, val_ds = SegmentDataset.train_val_from_split(data_dir, split_file, use_track)
    else:
        _, val_ds = SegmentDataset.train_val_from_dir(data_dir, 0.9, use_track)
    dl = BatchLoader(val_ds, batch_size, augment=False, shuffle=False, drop_last=True)
    for i, batch in enumerate(dl):
        if i >= num:
            return
        yield batch


def prompt_generation(session, task, args, check_integrity=True):
    gen = []
    for batch in _batches(args.data_dir, args.batch_size, args.batch_num, split_file=args.split_file):
        x0 = session.predict(
            np.zeros((batch.prmat2c.shape[0], 1, task.cfg.d_cond), np.float32),
            uncond_scale=0.0,
        )
        gen.append(x0)
    gen = np.concatenate(gen)
    if check_integrity:
        err = check_prmat2c_integrity(gen)
        print(f"integrity error rate: {err:.4f}")
    prmat2c_to_midi_file(gen, os.path.join(args.output_dir, "uncond.mid"))
    return gen


def acc_arrangement(session, task, args):
    """Inpaint accompaniment below the melody (melody track only, reference :34-49)."""
    gen = []
    for batch in _batches(
        args.data_dir, args.batch_size, args.batch_num, use_track=(0,), split_file=args.split_file
    ):
        cond = np.zeros((batch.prmat2c.shape[0], 1, task.cfg.d_cond), np.float32)
        x0, _ = session.inpaint(
            batch.prmat2c, "below", cond, uncond_scale=0.0, no_output=True
        )
        gen.append(x0)
    gen = np.concatenate(gen)
    prmat2c_to_midi_file(gen, os.path.join(args.output_dir, "acc_arr.mid"))
    return gen


def inpaint_bars(session, task, args):
    gen = []
    for batch in _batches(args.data_dir, args.batch_size, args.batch_num, split_file=args.split_file):
        cond = np.zeros((batch.prmat2c.shape[0], 1, task.cfg.d_cond), np.float32)
        x0, _ = session.inpaint(
            batch.prmat2c, "bars", cond, uncond_scale=0.0,
            bar_list=[2, 3, 4, 5], no_output=True,
        )
        gen.append(x0[:, :, 32:96, :])  # only the inpainted middle bars
    gen = np.concatenate(gen)
    prmat2c_to_midi_file(gen, os.path.join(args.output_dir, "inp_bars.mid"))
    return gen


def chd_conditioning(session, task, args):
    import jax.numpy as jnp

    gen, chds = [], []
    for batch in _batches(args.data_dir, args.batch_size, args.batch_num, split_file=args.split_file):
        cond = np.asarray(task.encode_chord(jnp.asarray(batch.chord)))
        x0 = session.predict(cond, uncond_scale=args.uncond_scale)
        gen.append(x0)
        chds.append(batch.chord)
    gen = np.concatenate(gen)
    np.save(os.path.join(args.output_dir, f"chd[{args.uncond_scale}].npy"), np.stack(chds))
    prmat2c_to_midi_file(
        gen, os.path.join(args.output_dir, f"chd_cond[{args.uncond_scale}].mid")
    )
    return gen


def txt_conditioning(session, task, args):
    import jax.numpy as jnp

    gen, orig = [], []
    for batch in _batches(args.data_dir, args.batch_size, args.batch_num, split_file=args.split_file):
        cond = np.asarray(task.encode_txt(jnp.asarray(batch.prmat)))
        x0 = session.predict(cond, uncond_scale=args.uncond_scale)
        gen.append(x0)
        orig.append(batch.prmat2c)
    gen, orig = np.concatenate(gen), np.concatenate(orig)
    prmat2c_to_midi_file(
        gen, os.path.join(args.output_dir, f"txt_cond[{args.uncond_scale}].mid")
    )
    prmat2c_to_midi_file(
        orig, os.path.join(args.output_dir, f"txt_orig[{args.uncond_scale}].mid")
    )
    return gen


EXPERIMENTS = {
    "uncond": prompt_generation,
    "inp_below": acc_arrangement,
    "inp_bars": inpaint_bars,
    "chd": chd_conditioning,
    "txt": txt_conditioning,
}


def main(argv=None):
    p = argparse.ArgumentParser(description="batch evaluation harness")
    p.add_argument("--chkpt_path", required=True)
    p.add_argument("--model", default=None)
    p.add_argument("--data_dir", required=True)
    p.add_argument("--split_file", default=None)
    p.add_argument("--type", required=True, choices=sorted(EXPERIMENTS))
    p.add_argument("--batch_num", type=int, default=10)
    p.add_argument("--batch_size", type=int, default=16)
    p.add_argument("--output_dir", default="exp")
    p.add_argument("--uncond_scale", type=float, default=1.0)
    p.add_argument("--ddim", action="store_true")
    p.add_argument("--ddim_steps", type=int, default=50)
    p.add_argument("--repaint_n", type=int, default=1)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--pretrained_dir", default=None)
    args = p.parse_args(argv)

    if args.model is None and os.path.isdir(args.chkpt_path):
        cfg = load_params(os.path.join(args.chkpt_path, "params.yaml"))
    else:
        cfg = load_params(args.model or "sdf_chd8bar")
    task = build_task_for_inference(cfg, args.pretrained_dir)
    params = load_unet_params(args.chkpt_path, task)
    session = InferenceSession(
        task, params, use_ddim=args.ddim, ddim_steps=args.ddim_steps,
        repaint_n=args.repaint_n, seed=args.seed,
    )
    os.makedirs(args.output_dir, exist_ok=True)
    EXPERIMENTS[args.type](session, task, args)
    print(f"experiment {args.type} done -> {args.output_dir}")


if __name__ == "__main__":
    main()
