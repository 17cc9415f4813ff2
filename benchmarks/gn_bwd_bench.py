"""Per-site GroupNorm-BACKWARD shootout on the real chip, profiled on-device.

Compares, for representative UNet GN sites at the train batch (16), the device
time of the full GN gradient (dx + dgamma + dbeta):

  xla_vjp   jax.vjp through the model's one-pass GN forward — what the train
            step pays today (XLA emits several passes over the activation)
  pallas    ops/gn_bwd.py single-pass kernel (x, dy read once; all reductions
            and the dx epilogue in VMEM)

Method identical to conv_kernel_bench.py: each variant inside a
``lax.scan`` (>1 s device work; single calls are meaningless through the
relay), timings from the xplane trace.  Reported rate is effective GB/s over
the MINIMUM traffic (x + dy + dx), so the HBM roofline (~819 GB/s on v5e) is
the visible ceiling.

Fairness note: ``x`` is fed as a per-iteration scanned input (a stack of
distinct arrays), NOT a closed-over constant — with constant x, XLA hoists
every x-only pass (notably x_hat) out of the loop and the "xla_vjp" rate
reads above the HBM roofline (1.7 TB/s was measured), which the opaque Pallas
call can never match.  The decisive number is still the full train-step A/B
(benchmarks/profile_train.py), where x is fresh every step for both.

    python benchmarks/gn_bwd_bench.py [--site gn0a] [--iters 30]
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SITES = {
    # name: (batch, H, W, C, groups) — batch 16 = train batch
    "gn0a": (16, 128, 128, 64, 32),   # level-0 resblock GN (dominant site)
    "gn0b": (16, 128, 128, 128, 32),  # level-0 at 128 channels
    "gn1": (16, 64, 64, 128, 32),     # level-1
    "gn2": (16, 32, 32, 256, 32),     # level-2 / attention pre-GN
}


def build_variants(site, names):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from polyffusion_tpu.ops.gn_bwd import _gn_primal, gn_bwd_pallas

    b, h, w, c, g = SITES[site]
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((b, h, w, c)), jnp.bfloat16)
    scale = jnp.asarray(rng.standard_normal(c) * 0.5 + 1.0, jnp.float32)
    bias = jnp.asarray(rng.standard_normal(c) * 0.1, jnp.float32)
    dy0 = jnp.asarray(rng.standard_normal((b, h, w, c)), jnp.bfloat16)
    eps = 1e-5
    min_bytes = 3 * b * h * w * c * x.dtype.itemsize  # x + dy + dx

    _, mean_c, inv_c = _gn_primal(x, scale, bias, g, eps)

    out = {}

    def feedback(dx, carry):
        # carry = dx: a scalar-broadcast feedback (carry*0.5 + mean*1e-3) keeps
        # the carry AFFINE in dy0 with scalar coefficients, so XLA hoists the
        # base reductions out of the loop; dx as the next dy is a full-rank
        # linear map that changes with x_i — nothing hoists
        return dx.astype(carry.dtype)

    # distinct x per scan iteration (see module docstring: constant x lets XLA
    # hoist all x-only passes and invalidates the comparison); stats stay
    # those of x — harmless for timing
    def xs_stack(iters):
        deltas = jnp.asarray(
            rng.standard_normal((iters, 1, 1, 1, c)) * 1e-3, jnp.bfloat16
        )
        return x[None] + deltas  # (iters, B, H, W, C), unique buffers

    if "xla_vjp" in names:
        # backward-only with precomputed stats (_gna_bwd) — the same residuals
        # autodiff of the real step hands XLA; a jax.vjp here would also re-run
        # the forward, overcharging XLA by one pass over x.  The override pins
        # the XLA fallback: with POLYFF_PALLAS_GN_BWD=1 in the environment
        # (the natural state while evaluating the kernel) _gna_bwd would
        # otherwise reroute to the Pallas kernel and the A/B measures pallas
        # twice.
        from polyffusion_tpu.ops.gn_bwd import _gna_bwd, pallas_gn_bwd_override

        def body(carry, x_i):
            with pallas_gn_bwd_override(False):
                dx, dg, db = _gna_bwd(g, eps, (x_i, scale, mean_c, inv_c), carry)
            return feedback(dx + 0 * jnp.mean(dg + db).astype(dx.dtype), carry), ()

        out["xla_vjp"] = (dy0, body, min_bytes)

    if "pallas" in names:

        def body_p(carry, x_i):
            dx, dgb, dbb = gn_bwd_pallas(x_i, carry, mean_c, inv_c, scale, g)
            return feedback(dx + 0 * jnp.mean(dgb + dbb).astype(dx.dtype), carry), ()

        out["pallas"] = (dy0, body_p, min_bytes)

    out["_xs_stack"] = xs_stack
    return out


def run(site, iters, outdir, names):
    import jax

    jax.config.update("jax_compilation_cache_dir", os.environ.get(
        "JAX_CACHE_DIR", "/tmp/jax_tpu_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    variants = build_variants(site, names)
    xs = variants.pop("_xs_stack")(iters)  # (iters, B, H, W, C) streamed x
    compiled, inputs = {}, {}
    for name, (x0, body, _) in variants.items():
        compiled[name] = jax.jit(
            lambda x0, xs, body=body: jax.lax.scan(body, x0, xs)[0]
        )
        inputs[name] = x0
        compiled[name](x0, xs).block_until_ready()

    with jax.profiler.trace(outdir):
        for name in variants:
            compiled[name](inputs[name], xs).block_until_ready()

    report(outdir, site, iters, {n: v[2] for n, v in variants.items()})


def report(outdir, site, iters, bytes_by_name):
    from xplane_while import extract_while_durations

    whiles = extract_while_durations(outdir, bytes_by_name)
    print(f"\n== site {site} (iters {iters}) ==")
    rows = {}
    for (wname, dur), label in zip(whiles, bytes_by_name):
        gbs = bytes_by_name[label] * iters / dur / 1e9
        rows[label] = {"us_per_site": round(dur * 1e6 / iters, 1),
                       "eff_GBps": round(gbs, 1)}
        print(f"{label:9s} {dur*1e3:8.1f} ms total  {dur*1e6/iters:8.1f} us/site  "
              f"{gbs:7.1f} GB/s eff  ({wname.split(' = ')[0]})")
    print(json.dumps({"site": site, "gn_bwd": rows}))


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--site", default="gn0a", choices=list(SITES))
    ap.add_argument("--iters", type=int, default=30)
    ap.add_argument("--outdir", default="/tmp/gn_bwd_prof")
    ap.add_argument("--variants", default="xla_vjp,pallas")
    args = ap.parse_args()
    run(args.site, args.iters, args.outdir,
        [v.strip() for v in args.variants.split(",") if v.strip()])
