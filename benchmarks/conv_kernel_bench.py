"""Per-site conv-kernel shootout on the real chip, profiled on-device.

Compares, for representative UNet conv sites, the device time of:
  xla_bf16   GN-affine+SiLU+conv through XLA (the shipped default path)
  fused_bf16 the Pallas fused GN+SiLU+conv kernel (POLYFF_FUSED_GN_CONV)
  fused_int8 its quantize-in-VMEM int8 variant (POLYFF_INT8_CONV)

Each variant runs inside a 100-iteration ``lax.scan`` so the workload is >1 s
of device time (single-call timings are meaningless through the TPU relay);
results come from the xplane trace (on-device op durations, immune to relay
congestion).  Small programs: compiles are minutes, not tens of minutes.

    python benchmarks/conv_kernel_bench.py [--site l0dec] [--iters 100]
"""

import argparse
import glob
import os
import sys
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SITES = {
    # name: (batch, H, W, C_in, C_out)  — batch 128 = CFG-doubled bench batch
    "l0dec": (128, 128, 128, 128, 64),   # decoder L0 in_conv (virtual concat)
    "l0enc": (128, 128, 128, 64, 64),    # encoder L0 conv
    "l1": (128, 64, 64, 128, 128),       # L1 conv
    "l2": (128, 32, 32, 256, 256),       # L2 conv
}


def run(site, iters, outdir):
    import jax
    import jax.numpy as jnp
    import numpy as np

    jax.config.update("jax_compilation_cache_dir", os.environ.get(
        "JAX_CACHE_DIR", "/tmp/jax_tpu_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from polyffusion_tpu.ops.fused_gn_conv import (
        gn_silu_conv3x3,
        gn_silu_conv3x3_q,
        quantize_conv_kernel,
    )

    b, h, w, cin, cout = SITES[site]
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((b, h, w, cin)), jnp.bfloat16)
    a = jnp.asarray(rng.standard_normal((b, cin)), jnp.float32) * 0.5
    off = jnp.asarray(rng.standard_normal((b, cin)), jnp.float32) * 0.1
    wk = jnp.asarray(
        rng.standard_normal((3, 3, cin, cout)) * (9 * cin) ** -0.5, jnp.bfloat16
    )
    bias = jnp.asarray(rng.standard_normal((cout,)), jnp.float32) * 0.1
    wq, wscale = quantize_conv_kernel(wk)

    def xla_bf16(x):
        y = x.astype(jnp.float32) * a[:, None, None, :] + off[:, None, None, :]
        y = (y * jax.nn.sigmoid(y)).astype(x.dtype)
        out = jax.lax.conv_general_dilated(
            y, wk, (1, 1), ((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        return out + bias.astype(out.dtype)

    def fused_bf16(x):
        return gn_silu_conv3x3(x, a, off, wk, bias, interpret=False)

    def fused_int8(x):
        return gn_silu_conv3x3_q(x, a, off, wq, wscale, bias, interpret=False)

    variants = {"xla_bf16": xla_bf16, "fused_bf16": fused_bf16, "fused_int8": fused_int8}
    compiled = {}
    for name, fn in variants.items():
        # keep iterating on the output so the scan can't be collapsed; pad the
        # channel mismatch by re-slicing/tiling back to cin
        def body(carry, _, fn=fn):
            out = fn(carry)
            if cout != cin:
                reps = cin // cout
                out = jnp.concatenate([out] * reps, axis=-1)
            return (out * 1e-3 + carry * 0.5).astype(carry.dtype), ()

        compiled[name] = jax.jit(
            lambda x0, body=body: jax.lax.scan(body, x0, None, length=iters)[0]
        )
        compiled[name](x).block_until_ready()  # compile + warm

    with jax.profiler.trace(outdir):
        for name in variants:
            compiled[name](x).block_until_ready()

    flops = 2 * b * h * w * 9 * cin * cout * iters
    report(outdir, site, iters, flops)


def report(outdir, site, iters, flops):
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    paths = sorted(
        glob.glob(os.path.join(outdir, "**", "*.xplane.pb"), recursive=True),
        key=os.path.getmtime,
    )
    if not paths:
        raise SystemExit(f"no .xplane.pb trace found under {outdir}")
    xspace = xplane_pb2.XSpace()
    with open(paths[-1], "rb") as f:
        xspace.ParseFromString(f.read())
    # the three scans appear as three %while ops in execution order
    whiles = []
    for plane in xspace.planes:
        if "TPU" not in plane.name and "tpu" not in plane.name:
            continue
        ev_meta = plane.event_metadata
        for line in plane.lines:
            if line.name != "XLA Ops":
                continue
            for ev in line.events:
                name = ev_meta[ev.metadata_id].name
                if name.startswith("%while"):
                    whiles.append((ev.offset_ps, name, ev.duration_ps / 1e12))
    whiles.sort()
    names = ["xla_bf16", "fused_bf16", "fused_int8"]
    if len(whiles) != len(names):
        raise SystemExit(
            f"expected {len(names)} %while ops (one per variant) in the trace, "
            f"found {len(whiles)} — positional attribution would be wrong: "
            + "; ".join(w[1].split(" = ")[0] for w in whiles)
        )
    print(f"\n== site {site} (iters {iters}) ==")
    for (off_, wname, dur), label in zip(whiles, names):
        tf = flops / dur / 1e12
        print(f"{label:11s} {dur*1e3:8.1f} ms total  {dur*1e6/iters:8.1f} us/site  "
              f"{tf:6.1f} TFLOP/s eff  ({wname.split(' = ')[0]})")


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--site", default="l0dec", choices=list(SITES))
    ap.add_argument("--iters", type=int, default=100)
    ap.add_argument("--outdir", default="/tmp/conv_kernel_prof")
    args = ap.parse_args()
    run(args.site, args.iters, args.outdir)
