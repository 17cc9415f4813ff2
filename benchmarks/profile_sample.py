"""Capture a device profile of the headline sampling workload and print top ops.

Usage (TPU, in background — first compile can take tens of minutes cold):

    python benchmarks/profile_sample.py [--batch 64] [--outdir /tmp/polyff_profile]

Captures one jitted DDIM-50+CFG sampling call under ``jax.profiler.trace`` and
then parses the newest ``*.xplane.pb`` in the trace directory, aggregating
self-time by HLO-op category and by individual op name.  This is the recipe the
round-1 optimization passes used (CLAUDE.md perf notes).
"""

import argparse
import glob
import os
import sys
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def capture(outdir: str, batch: int) -> None:
    import jax

    jax.config.update(
        "jax_compilation_cache_dir", os.environ.get("JAX_CACHE_DIR", "/tmp/jax_tpu_cache")
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from polyffusion_tpu.config import load_params
    from polyffusion_tpu.diffusion import make_ddim_schedule, make_schedule
    from polyffusion_tpu.diffusion.sampler import ddim_sample
    from polyffusion_tpu.parallel.mesh import init_on_cpu
    from polyffusion_tpu.tasks import SDFTask

    cfg = load_params("sdf_chd8bar")
    cfg["bf16"] = True
    task = SDFTask(cfg)
    rng = jax.random.PRNGKey(0)
    params = init_on_cpu(task.init_params, rng)
    if os.environ.get("POLYFF_BF16_PARAMS", "1") == "1":  # mirror bench.py
        from polyffusion_tpu.utils.precision import cast_sampling_params

        params = cast_sampling_params(params)
    params = jax.device_put(params, jax.devices()[0])
    schedule = make_schedule(cfg.n_steps, cfg.linear_start, cfg.linear_end)
    dd = make_ddim_schedule(schedule, 50, "uniform", 0.0)
    cond = jnp.zeros((batch, 1, cfg.d_cond), jnp.float32)
    uncond = -jnp.ones_like(cond)
    x_last = jax.random.normal(rng, (batch, 128, 128, 2), jnp.float32)

    @jax.jit
    def sample(x_last, cond, uncond, key):
        return ddim_sample(
            task.apply_eps, params, dd, x_last, cond, key,
            uncond_scale=5.0, uncond_cond=uncond,
        )

    sample(x_last, cond, uncond, rng).block_until_ready()  # compile + warm
    with jax.profiler.trace(outdir):
        sample(x_last, cond, uncond, jax.random.fold_in(rng, 1)).block_until_ready()
    print(f"trace written under {outdir}")


def parse(outdir: str, top: int = 40) -> None:
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    paths = sorted(
        glob.glob(os.path.join(outdir, "**", "*.xplane.pb"), recursive=True),
        key=os.path.getmtime,
    )
    if not paths:
        print("no xplane.pb found", file=sys.stderr)
        return None
    xspace = xplane_pb2.XSpace()
    with open(paths[-1], "rb") as f:
        xspace.ParseFromString(f.read())

    by_name = defaultdict(float)
    by_cat = defaultdict(float)
    total = 0.0
    for plane in xspace.planes:
        if "TPU" not in plane.name and "tpu" not in plane.name:
            continue
        ev_meta = plane.event_metadata
        for line in plane.lines:
            # XLA op lines carry per-op events; take the deepest line ("XLA Ops")
            if "XLA Ops" not in line.name and "Steps" in line.name:
                continue
            if line.name not in ("XLA Ops",):
                continue
            for ev in line.events:
                name = ev_meta[ev.metadata_id].name
                dur = ev.duration_ps / 1e12
                by_name[name] += dur
                total += dur
                cat = name.split(".")[0].split("_")[0]
                by_cat[cat] += dur

    print(f"\ntotal XLA-op time: {total*1e3:.1f} ms   (plane file: {paths[-1]})")
    print("\n-- by category --")
    for cat, t in sorted(by_cat.items(), key=lambda kv: -kv[1])[:20]:
        print(f"{t*1e3:9.2f} ms  {100*t/total:5.1f}%  {cat}")
    print(f"\n-- top {top} ops --")
    for name, t in sorted(by_name.items(), key=lambda kv: -kv[1])[:top]:
        print(f"{t*1e3:9.2f} ms  {100*t/total:5.1f}%  {name[:110]}")
    return total


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--outdir", default="/tmp/polyff_profile")
    ap.add_argument("--parse_only", action="store_true")
    ap.add_argument("--top", type=int, default=40)
    args = ap.parse_args()
    if not args.parse_only:
        capture(args.outdir, args.batch)
    parse(args.outdir, args.top)
