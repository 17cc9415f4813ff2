"""Training CLI (reference ``main.py``): ``python -m polyffusion_tpu.main --model
sdf_chd8bar --output_dir result/x --data_dir <npz dir>``.

Model presets come from ``polyffusion_tpu/params/*.yaml``; the run directory gets a
``params.yaml`` copy, orbax checkpoints under ``chkpts/``, and ``metrics.jsonl``.
Training runs data-parallel over all visible devices.
"""

from __future__ import annotations

import argparse
import os
from datetime import datetime


def build_task(cfg, pretrained_dir=None):
    model_name = cfg["model_name"]
    if model_name.startswith("sdf"):
        from .inference import build_task_for_inference

        return build_task_for_inference(cfg, pretrained_dir)
    if model_name == "ddpm":
        from .tasks.ddpm import DDPMTask

        return DDPMTask(cfg)
    if model_name == "chd_8bar":
        from .tasks.chd_8bar import Chd8BarTask

        return Chd8BarTask(cfg)
    if model_name == "pnotree_vae":
        from .tasks.pnotree_vae import PnoTreeVAETask

        return PnoTreeVAETask(cfg)
    if model_name == "autoencoder":
        from .tasks.autoencoder import AutoencoderTask

        return AutoencoderTask(cfg)
    raise NotImplementedError(model_name)


def main(argv=None):
    p = argparse.ArgumentParser(description="polyffusion_tpu training")
    p.add_argument("--model", required=True, help="params preset name (see params/)")
    p.add_argument("--output_dir", required=True)
    p.add_argument("--data_dir", required=True, help="directory of song .npz files")
    p.add_argument("--split_file", default=None, help="pickled (train, val) split")
    p.add_argument("--pop909_use_track", default="0,1,2", help="tracks for prmat2c")
    p.add_argument("--pretrained_dir", default=None, help="frozen encoder checkpoints")
    p.add_argument("--max_steps", type=int, default=None)
    p.add_argument("--batch_size", type=int, default=None, help="override preset batch size")
    p.add_argument("--log_every", type=int, default=100)
    p.add_argument("--save_every", type=int, default=1,
                   help="checkpoint every N epochs (final epoch always saves)")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--resume", action="store_true", help="resume from output_dir/chkpts")
    p.add_argument("--fsdp", action="store_true",
                   help="ZeRO-3 state sharding over dp (parallel/fsdp.py)")
    p.add_argument("--fresh", action="store_true", help="force a new timestamped subdir")
    p.add_argument(
        "--set",
        action="append",
        default=[],
        metavar="KEY=VALUE",
        help="override any preset key (YAML-parsed value; repeatable), e.g. "
        "--set channels=32 --set 'channel_multipliers=[1,2]' — the run dir's "
        "params.yaml records the overridden config",
    )
    p.add_argument(
        "--profile_steps",
        default=None,
        help="START,STOP step window to capture a jax.profiler trace",
    )
    args = p.parse_args(argv)

    from .config import enable_compile_cache, load_params
    from .data import SegmentDataset, make_loaders
    from .parallel import make_mesh
    from .train import ParameterScheduler, TeacherForcingScheduler, Trainer

    enable_compile_cache()
    cfg = load_params(args.model)
    for kv in args.set:
        import yaml

        key, _, val = kv.partition("=")
        assert _, f"--set expects KEY=VALUE, got {kv!r}"
        cfg[key.strip()] = yaml.safe_load(val)
    if args.batch_size:
        cfg["batch_size"] = args.batch_size
    if args.fsdp:
        cfg["fsdp"] = True

    output_dir = args.output_dir
    has_ckpt = os.path.isdir(os.path.join(output_dir, "chkpts"))
    if args.fresh or (has_ckpt and not args.resume):
        # reference prompts interactively on an existing run (train/__init__.py:29-41);
        # we default to a new timestamped dir unless --resume, for CI-friendliness
        output_dir = os.path.join(
            args.output_dir, datetime.now().strftime("%y%m%d_%H%M%S")
        )

    use_track = [int(t) for t in args.pop909_use_track.split(",")]
    if args.split_file:
        train_ds, val_ds = SegmentDataset.train_val_from_split(
            args.data_dir, args.split_file, use_track
        )
    else:
        train_ds, val_ds = SegmentDataset.train_val_from_dir(
            args.data_dir, 0.9, use_track
        )

    import jax

    # dp size must divide the global batch; drop to the largest divisor if needed
    n_dev = len(jax.devices())
    while cfg["batch_size"] % n_dev:
        n_dev -= 1
    mesh = make_mesh(jax.devices()[:n_dev])

    param_scheduler = None
    tfr_keys = [k for k in ("tfr_chd", "tfr_pnt1", "tfr_pnt2") if k in cfg]
    if tfr_keys:
        param_scheduler = ParameterScheduler(**{
            k: TeacherForcingScheduler(*cfg[k]) for k in tfr_keys
        })

    task = build_task(cfg, args.pretrained_dir)
    train_dl, val_dl = make_loaders(
        train_ds, val_ds, cfg["batch_size"], mesh, seed=args.seed,
        used_fields=getattr(task, "used_batch_fields", None),
    )
    profile_steps = (
        tuple(int(x) for x in args.profile_steps.split(","))
        if args.profile_steps
        else None
    )
    trainer = Trainer(
        task,
        cfg,
        output_dir,
        mesh=mesh,
        param_scheduler=param_scheduler,
        max_steps=args.max_steps,
        log_every=args.log_every,
        save_every=args.save_every,
        profile_steps=profile_steps,
    )
    print(
        f"[train] model={args.model} devices={len(mesh.devices.flat)} "
        f"batch={cfg['batch_size']} out={output_dir}"
    )
    trainer.fit(train_dl, val_dl, seed=args.seed, resume=args.resume)


if __name__ == "__main__":
    main()
