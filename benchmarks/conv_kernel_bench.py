"""Per-site conv-kernel shootout on the real chip, profiled on-device.

Compares, for representative UNet conv sites, the device time of:
  xla_bf16   GN-affine+SiLU+conv through XLA, normal NHWC layout (the default)
  s2d_bf16   the SAME arithmetic in the space-to-depth folded layout
             (ops/s2d.py): 2x the MACs (structured-zero kernel) but full
             128-lane occupancy and half the activation bytes
  dot_equiv  a pure dot of the conv's im2col shape (M, 9*Ci) @ (9*Ci, Co) —
             the demonstrated-achievable MXU rate for the shape class (no
             im2col materialization cost; this is the CEILING, not a kernel)
  dot_s2d    the s2d conv's dot shape (M/2, 18*Ci) @ (18*Ci, 2*Co)
  fused_bf16 the Pallas fused GN+SiLU+conv kernel (opt-in, --fused)
  fused_int8 its quantize-in-VMEM int8 variant (opt-in, --fused)

Each variant runs inside a 100-iteration ``lax.scan`` so the workload is >1 s
of device time (single-call timings are meaningless through the TPU relay);
results come from the xplane trace (on-device op durations, immune to relay
congestion).  Small programs: compiles are minutes, not tens of minutes.

    python benchmarks/conv_kernel_bench.py [--site l0enc] [--iters 100]
           [--variants xla_bf16,s2d_bf16,dot_equiv] [--fused]

The per-site ceiling table in TODO.md is produced by running every site with
the default variants.
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SITES = {
    # name: (batch, H, W, C_in, C_out)  — batch 128 = CFG-doubled bench batch
    "l0enc": (128, 128, 128, 64, 64),    # encoder L0 conv
    "l0dec": (128, 128, 128, 128, 64),   # decoder L0 in_conv (virtual concat)
    "l1": (128, 64, 64, 128, 128),       # L1 conv
    "l2": (128, 32, 32, 256, 256),       # L2 conv
    "l3": (128, 16, 16, 256, 256),       # L3 conv
    "in": (128, 128, 128, 2, 64),        # input head conv
}

DEFAULT_VARIANTS = "xla_bf16,s2d_bf16,s2d_entry_bf16,dot_equiv,dot_s2d"


def build_variants(site, names):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from polyffusion_tpu.ops.s2d import fold_channel_vec, s2d_kernel, to_s2d

    b, h, w, cin, cout = SITES[site]
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((b, h, w, cin)), jnp.bfloat16)
    a = jnp.asarray(rng.standard_normal((b, cin)), jnp.float32) * 0.5
    off = jnp.asarray(rng.standard_normal((b, cin)), jnp.float32) * 0.1
    wk = jnp.asarray(
        rng.standard_normal((3, 3, cin, cout)) * (9 * cin) ** -0.5, jnp.bfloat16
    )
    bias = jnp.asarray(rng.standard_normal((cout,)), jnp.float32) * 0.1
    conv_flops_per_iter = 2 * b * h * w * 9 * cin * cout

    out = {}

    def conv_like_scan(step_fn, x0):
        """step: y=f(carry); feed back via a channel-mean broadcast.

        The old channel-TILING feedback (concat y x9 to refill the contraction
        width) dominated the dot variants' measured time — a 9x-output-size
        relayout per iteration — making the "ceiling" dots look slower than
        the convs they were meant to bound.  A keepdims mean + broadcast-add
        keeps the data dependence (no DCE) at ~one carry-write of traffic,
        identical across variants."""

        def body(carry, _):
            y = step_fn(carry)
            r = jnp.mean(y).astype(carry.dtype)  # scalar: shape-agnostic
            return carry * 0.5 + r * 1e-3, ()

        return x0, body

    if "xla_bf16" in names:
        def xla_bf16(t):
            y = t.astype(jnp.float32) * a[:, None, None, :] + off[:, None, None, :]
            y = (y * jax.nn.sigmoid(y)).astype(t.dtype)
            o = jax.lax.conv_general_dilated(
                y, wk, (1, 1), ((1, 1), (1, 1)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
            return o + bias.astype(o.dtype)

        out["xla_bf16"] = (*conv_like_scan(xla_bf16, x), conv_flops_per_iter)

    if "s2d_bf16" in names:
        x2 = to_s2d(x)
        a2, off2 = fold_channel_vec(a), fold_channel_vec(off)
        wk2 = s2d_kernel(wk)
        bias2 = fold_channel_vec(bias)

        def s2d_bf16(t):
            y = t.astype(jnp.float32) * a2[:, None, None, :] + off2[:, None, None, :]
            y = (y * jax.nn.sigmoid(y)).astype(t.dtype)
            o = jax.lax.conv_general_dilated(
                y, wk2, (1, 1), ((1, 1), (1, 1)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
            return o + bias2.astype(o.dtype)

        out["s2d_bf16"] = (*conv_like_scan(s2d_bf16, x2), conv_flops_per_iter)

    if "s2d_entry_bf16" in names:
        # normal-layout input -> FOLDED output (ops/s2d.py s2d_entry_kernel):
        # only 4/3x MACs (vs the fully-folded conv's 2x) at full 2*Co output
        # lanes — the candidate for a hybrid in_conv
        from polyffusion_tpu.ops.s2d import s2d_entry_kernel

        wk_e = s2d_entry_kernel(wk)

        def s2d_entry(t):
            y = t.astype(jnp.float32) * a[:, None, None, :] + off[:, None, None, :]
            y = (y * jax.nn.sigmoid(y)).astype(t.dtype)
            o = jax.lax.conv_general_dilated(
                y, wk_e, (1, 2), ((1, 1), (1, 1)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
            return o

        out["s2d_entry_bf16"] = (*conv_like_scan(s2d_entry, x), conv_flops_per_iter)

    if "dot_equiv" in names:
        # same M*K*N as the conv, M scaled down 8x to fit HBM comfortably;
        # eff-TFLOP/s is rate-normalized so the ceiling is comparable
        m = b * h * w // 8
        k, n = 9 * cin, cout
        lhs = jnp.asarray(rng.standard_normal((m, k)), jnp.bfloat16)
        rhs = jnp.asarray(rng.standard_normal((k, n)) * k**-0.5, jnp.bfloat16)

        def dot_equiv(t, rhs=rhs):  # bind now: dot_s2d below reuses the names
            return jax.lax.dot_general(
                t, rhs, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.bfloat16,
            )

        out["dot_equiv"] = (*conv_like_scan(dot_equiv, lhs), 2 * m * k * n)

    if "dot_s2d" in names:
        m = b * h * (w // 2) // 8
        k, n = 9 * 2 * cin, 2 * cout
        lhs = jnp.asarray(rng.standard_normal((m, k)), jnp.bfloat16)
        rhs = jnp.asarray(rng.standard_normal((k, n)) * k**-0.5, jnp.bfloat16)

        def dot_s2d(t, rhs=rhs):
            return jax.lax.dot_general(
                t, rhs, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.bfloat16,
            )

        out["dot_s2d"] = (*conv_like_scan(dot_s2d, lhs), 2 * m * k * n)

    if "fused_bf16" in names or "fused_int8" in names:
        from polyffusion_tpu.ops.fused_gn_conv import (
            gn_silu_conv3x3,
            gn_silu_conv3x3_q,
            quantize_conv_kernel,
        )

        wq, wscale = quantize_conv_kernel(wk)
        if "fused_bf16" in names:
            out["fused_bf16"] = (
                *conv_like_scan(
                    lambda t: gn_silu_conv3x3(t, a, off, wk, bias, interpret=False),
                    x,
                ),
                conv_flops_per_iter,
            )
        if "fused_int8" in names:
            out["fused_int8"] = (
                *conv_like_scan(
                    lambda t: gn_silu_conv3x3_q(t, a, off, wq, wscale, bias,
                                                interpret=False),
                    x,
                ),
                conv_flops_per_iter,
            )
    return out


def run(site, iters, outdir, names):
    import jax

    jax.config.update("jax_compilation_cache_dir", os.environ.get(
        "JAX_CACHE_DIR", "/tmp/jax_tpu_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    variants = build_variants(site, names)
    compiled = {}
    inputs = {}
    for name, (x0, body, _) in variants.items():
        compiled[name] = jax.jit(
            lambda x0, body=body: jax.lax.scan(body, x0, None, length=iters)[0]
        )
        inputs[name] = x0
        compiled[name](x0).block_until_ready()  # compile + warm

    with jax.profiler.trace(outdir):
        for name in variants:
            compiled[name](inputs[name]).block_until_ready()

    report(outdir, site, iters, {n: v[2] for n, v in variants.items()})


def report(outdir, site, iters, flops_by_name):
    from xplane_while import extract_while_durations

    whiles = extract_while_durations(outdir, flops_by_name)
    print(f"\n== site {site} (iters {iters}) ==")
    rows = {}
    for (wname, dur), label in zip(whiles, flops_by_name):
        flops = flops_by_name[label] * iters
        tf = flops / dur / 1e12
        rows[label] = round(tf, 1)
        print(f"{label:11s} {dur*1e3:8.1f} ms total  {dur*1e6/iters:8.1f} us/site  "
              f"{tf:6.1f} TFLOP/s eff  ({wname.split(' = ')[0]})")
    print(json.dumps({"site": site, "eff_tflops": rows}))


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--site", default="l0enc", choices=list(SITES))
    ap.add_argument("--iters", type=int, default=100)
    ap.add_argument("--outdir", default="/tmp/conv_kernel_prof")
    ap.add_argument("--variants", default=DEFAULT_VARIANTS)
    ap.add_argument("--fused", action="store_true",
                    help="also run the Pallas fused kernels")
    args = ap.parse_args()
    names = [v.strip() for v in args.variants.split(",") if v.strip()]
    if args.fused:
        names += ["fused_bf16", "fused_int8"]
    run(args.site, args.iters, args.outdir, names)
