"""Capture a device profile of the flagship TRAIN step and print top ops + MXU%.

Usage (TPU, in background — compile is cached from bench/training runs):

    python benchmarks/profile_train.py [--batch 16] [--steps 20]
           [--outdir /tmp/polyff_profile_train]

Mirrors benchmarks/profile_sample.py (the round-2 sampling methodology —
on-device xplane op times, immune to relay congestion) for the training path:
one donated jitted train step (train/step.py) run ``--steps`` times under
``jax.profiler.trace``, plus an XLA cost-analysis FLOP count of the SAME
compiled executable so the printed MXU utilization is exact for the measured
program (reference workload anchor: the reference trains this config with
per-step timing only, ``train/learner.py`` progress meters).
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from profile_sample import parse  # same xplane aggregation

# single definitions (repo-root bench.py) so this profiler's MXU% and bench's
# `mfu` can never disagree
from bench import PEAK_BF16_TFLOPS, executable_flops


def capture(outdir: str, batch: int, steps: int) -> float:
    import jax

    jax.config.update(
        "jax_compilation_cache_dir", os.environ.get("JAX_CACHE_DIR", "/tmp/jax_tpu_cache")
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    import numpy as np

    from polyffusion_tpu.config import load_params
    from polyffusion_tpu.data.loader import Batch
    from polyffusion_tpu.models.encoders import ChordEncoder
    from polyffusion_tpu.parallel import make_mesh, replicated, shard_batch
    from polyffusion_tpu.parallel.mesh import init_on_cpu
    from polyffusion_tpu.tasks import SDFTask
    from polyffusion_tpu.train import create_state, make_optimizer, make_train_step

    cfg = load_params("sdf_chd8bar")
    cfg["bf16"] = True
    chord_enc = ChordEncoder(hidden_dim=cfg.chd_hidden_dim, z_dim=cfg.chd_z_dim)
    enc_params = init_on_cpu(
        lambda r: chord_enc.init(r, jnp.zeros((1, 32, 36)))["params"],
        jax.random.PRNGKey(1),
    )
    task = SDFTask(cfg, chord_enc=chord_enc, chord_enc_params=enc_params)
    mesh = make_mesh()
    optimizer = make_optimizer(cfg.learning_rate, cfg.max_grad_norm)
    train_step = make_train_step(task, optimizer, mesh)
    rng = jax.random.PRNGKey(0)
    params = init_on_cpu(task.init_params, rng)
    state = jax.device_put(create_state(params, optimizer), replicated(mesh))
    batch = Batch(
        prmat2c=np.random.default_rng(0).random((batch, 2, 128, 128)).astype(np.float32),
        pnotree=np.zeros((batch, 128, 20, 6), np.int64),
        chord=np.zeros((batch, 32, 36), np.float32),
        prmat=np.zeros((batch, 128, 128), np.float32),
    )
    batch = shard_batch(batch, mesh)

    state, metrics = train_step(state, tuple(batch), rng, ())  # compile + warm
    jax.block_until_ready(metrics)

    # exact FLOPs of the measured executable (donated args: re-lower, cached)
    flops = None
    try:
        flops = executable_flops(train_step.lower(state, tuple(batch), rng, ()))
    except Exception as e:  # pragma: no cover - cost analysis is best-effort
        print(f"cost_analysis unavailable: {e}", file=sys.stderr)

    with jax.profiler.trace(outdir):
        for _ in range(steps):
            state, metrics = train_step(state, tuple(batch), rng, ())
        jax.block_until_ready(metrics)
    print(f"trace written under {outdir} ({steps} steps)")
    return flops


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--steps", type=int, default=20)
    ap.add_argument("--outdir", default="/tmp/polyff_profile_train")
    ap.add_argument("--parse_only", action="store_true")
    ap.add_argument("--top", type=int, default=40)
    args = ap.parse_args()
    flops = None
    if not args.parse_only:
        flops = capture(args.outdir, args.batch, args.steps)
    total = parse(args.outdir, args.top)
    if flops and total:
        per_step = total / args.steps
        mxu = flops / per_step / (PEAK_BF16_TFLOPS * 1e12)
        print(
            f"\ntrain step: {per_step*1e3:.2f} ms on-device, "
            f"{flops/1e12:.3f} TFLOP/step -> {100*mxu:.1f}% of bf16 peak"
        )


if __name__ == "__main__":
    main()
