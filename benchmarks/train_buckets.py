"""Per-bucket ceiling table for the flagship TRAIN step (VERDICT r3 item 4).

Post-processes a ``profile_train.py`` xplane trace: every XLA-op event name
carries the full HLO signature (output + operand shapes), so ops can be
bucketed into conv-fwd/bwd-input, conv-filter-grad, GroupNorm fwd/bwd,
attention, optimizer and layout groups WITHOUT re-running the device — and
each bucket's achieved rate (eff-TFLOP/s for MXU buckets from the conv
arithmetic implied by the shapes in the op name; GB/s for bandwidth buckets
from the summed operand+output bytes) can be compared against its
demonstrated ceiling:

- conv buckets: the per-site XLA-bf16 conv rates measured on-device by
  ``conv_kernel_bench.py`` (TODO.md table: 21-177 eff-TFLOP/s by site — the
  narrow-channel sites are lane-structure-limited, see BASELINE.md
  "The defended ceiling");
- GN buckets: the HBM roofline demonstrated by ``gn_bwd_bench.py``
  (838-1070 effective GB/s for XLA's analytic GN gradient);
- attention: the flash-style Pallas fwd+bwd kernel times pinned in round 3
  (~0.55 ms per seq-1024 backward site).

Usage:  python benchmarks/train_buckets.py --outdir /tmp/r4/profile_train \
            [--steps 20]
(The trace dir is the ``--outdir`` previously passed to profile_train.py;
``--steps`` is how many train steps the trace window contains.)
"""

import argparse
import glob
import os
import re
import sys
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

_DTYPE_BYTES = {"bf16": 2, "f16": 2, "f32": 4, "s32": 4, "u32": 4, "s8": 1, "u8": 1, "pred": 1}
_SHAPE_RE = re.compile(r"(bf16|f16|f32|s32|u32|s8|u8|pred)\[([0-9,]*)\]")


def _shapes(text):
    """All (dtype, dims tuple) shapes mentioned in an HLO signature fragment."""
    out = []
    for m in _SHAPE_RE.finditer(text):
        dims = tuple(int(d) for d in m.group(2).split(",") if d)
        out.append((m.group(1), dims))
    return out


def _bytes(shapes):
    total = 0
    for dt, dims in shapes:
        n = 1
        for d in dims:
            n *= d
        total += n * _DTYPE_BYTES.get(dt, 4)
    return total


def _conv_flops(out_shape, kernel_shape):
    """2 * N*H*W * kh*kw * Ci * Co from an output activation + kernel shape."""
    n, h, w, _ = out_shape
    kh, kw, ci, co = kernel_shape
    return 2 * n * h * w * kh * kw * ci * co


_OPCODE_RE = re.compile(r"(?:\}|\)|\])\s+([a-z][a-z0-9\-_]*)\(")

# demonstrated per-site XLA-bf16 conv rates (eff-TFLOP/s, on-device shootout,
# benchmarks/conv_kernel_bench.py / TODO.md per-site ceiling table), keyed by
# the narrower channel side of the kernel — the lane-structure determinant
_SITE_RATES = [(2, 20.9), (64, 75.0), (128, 114.7), (256, 177.0)]


def _site_rate(kernels):
    """Demonstrated-achievable rate for a conv op, from its kernel shape."""
    if not kernels:
        return None
    k = max(kernels, key=lambda s: s[2] * s[3])
    ch = min(k[2], k[3])
    best = _SITE_RATES[0][1]
    for c, r in _SITE_RATES:
        if ch >= c:
            best = r
    return best


def classify(name):
    """-> (bucket, flops_or_None, bytes) for one full HLO op signature.

    Signatures look like ``%name = <outputs> opcode(<operands>)`` where
    outputs are a single shaped value or a tuple; operands each repeat their
    shape.  (Very long signatures may be truncated by the profiler, making
    the byte sums lower bounds; kernel operands appear early in practice.)
    """
    _, _, rhs = name.partition(" = ")
    m = _OPCODE_RE.search(rhs)
    if m:
        out_shapes = _shapes(rhs[: m.start() + 1])
        arg_shapes = _shapes(rhs[m.end():])
    else:
        out_shapes = _shapes(rhs)
        arg_shapes = []
    all_bytes = _bytes(out_shapes) + _bytes(arg_shapes)

    base = name.lstrip("%").split(" ")[0]
    kernels = [s for _, s in arg_shapes if len(s) == 4 and s[0] in (1, 3) and s[1] in (1, 3)]
    acts_out = [s for _, s in out_shapes if len(s) == 4 and s[0] not in (1, 3)]
    kernel_out = [s for _, s in out_shapes if len(s) == 4 and s[0] in (1, 3) and s[1] in (1, 3)]

    if "fused_self_attention" in base or "fused_attention" in base:
        return "attention (Pallas fwd+bwd)", None, all_bytes, None
    acts_in = [s for _, s in arg_shapes if len(s) == 4 and s[0] not in (1, 3)]
    if kernel_out and not acts_out:
        # produces a [kh,kw,Ci,Co] tensor: conv filter-gradient (+ loss-scalar
        # epilogues).  True contraction spatial extent is the SMALLER of the
        # two activation operands (the fwd output side, for strided convs).
        fl = None
        if acts_in:
            k = max(kernel_out, key=lambda s: s[2] * s[3])
            a = min(acts_in, key=lambda s: s[1] * s[2])
            fl = _conv_flops(a, k)
        return "conv filter-grad", fl, all_bytes, _site_rate(kernel_out)
    if base.startswith("convolution") or (kernels and acts_out):
        # conv fwd or bwd-input (XLA lowers both as convolutions), possibly
        # fused with GN/SiLU/add epilogues.  Spatial extent = smallest
        # activation in the signature (the fwd-output side of strided convs);
        # a fusion holding several kernels (e.g. conv + fused 1x1 skip)
        # contributes each kernel's arithmetic.
        fl = None
        acts = acts_out + acts_in
        if kernels and acts:
            a = min(acts, key=lambda s: s[1] * s[2])
            fl = sum(_conv_flops(a, k) for k in kernels)
        return "conv fwd/bwd-input (+GN/SiLU epilogues)", fl, all_bytes, _site_rate(kernels)
    has_stats = any(dt == "f32" and len(s) == 2 and s[0] == 16 for dt, s in arg_shapes)
    stat_out = any(len(s) == 2 and s[0] == 16 for _, s in out_shapes)
    if base.startswith("multiply_reduce_fusion") or (has_stats and acts_out):
        return "GN backward (stats + dx)", None, all_bytes, None
    if base.startswith("convert_reduce_fusion") or (
        base.startswith("fusion")
        and stat_out
        and any(len(s) == 4 for _, s in arg_shapes)
    ):
        return "GN forward stats / norm epilogues", None, all_bytes, None
    if base.startswith("dot") or (
        base.startswith("fusion")
        and any(len(s) == 3 and s[0] != 16 for _, s in out_shapes)
        and any(len(s) == 3 and s[0] == 16 and s[1] >= 256 for _, s in arg_shapes)
    ):
        # token-major 3-D matmuls: attention projections / GeGLU FF and their
        # weight-grads (the fwd GeGLU dots measured 84% MXU in round 2)
        return "dense (attn proj / GeGLU FF) + grads", None, all_bytes, None
    if any(x in base for x in ("copy", "slice", "broadcast", "reshape", "bitcast", "pad")):
        return "layout / copies", None, all_bytes, None
    if base.startswith(("multiply", "add", "subtract", "divide", "rsqrt", "power")):
        # parameter-shaped elementwise: Adam update / EMA / grad-clip
        big4 = any(len(s) == 4 and s[0] not in (1, 3) for _, s in out_shapes + arg_shapes)
        if not big4:
            return "optimizer / param elementwise", None, all_bytes, None
        return "activation elementwise", None, all_bytes, None
    return "other", None, all_bytes, None


def parse_events(outdir):
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    paths = sorted(
        glob.glob(os.path.join(outdir, "**", "*.xplane.pb"), recursive=True),
        key=os.path.getmtime,
    )
    if not paths:
        raise SystemExit(f"no xplane.pb under {outdir}")
    xspace = xplane_pb2.XSpace()
    with open(paths[-1], "rb") as f:
        xspace.ParseFromString(f.read())
    by_name = defaultdict(float)
    for plane in xspace.planes:
        if "TPU" not in plane.name and "tpu" not in plane.name:
            continue
        ev_meta = plane.event_metadata
        for line in plane.lines:
            if line.name != "XLA Ops":
                continue
            for ev in line.events:
                by_name[ev_meta[ev.metadata_id].name] += ev.duration_ps / 1e12
    return by_name


CEILINGS = {
    # bandwidth buckets -> (value GB/s, provenance).  Byte sums are from the
    # op signatures so these are *traffic-visible-at-the-fusion-boundary*
    # rates — a fused epilogue that keeps data in VMEM shows as >roofline.
    "GN backward (stats + dx)": (900.0, "gn_bwd_bench.py: XLA analytic GN-grad 838-1070 eff GB/s"),
    "GN forward stats / norm epilogues": (900.0, "HBM roofline (same family)"),
    "optimizer / param elementwise": (900.0, "HBM roofline"),
    "layout / copies": (900.0, "HBM roofline"),
    "activation elementwise": (900.0, "HBM roofline"),
}
ATTENTION_CEIL_MS = 5 * (0.55 + 0.35)  # 5 seq-1024 sites x (bwd 0.55 + fwd 0.35) ms, round-3 shootout


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--outdir", default="/tmp/polyff_profile_train")
    ap.add_argument("--steps", type=int, default=20)
    args = ap.parse_args()

    by_name = parse_events(args.outdir)
    # per bucket: [window time, per-step flops, per-step bytes, Σ fl/rate]
    buckets = defaultdict(lambda: [0.0, 0.0, 0.0, 0.0])
    for name, t in by_name.items():
        bucket, fl, by, rate = classify(name)
        rec = buckets[bucket]
        rec[0] += t
        if fl:
            rec[1] += fl
            if rate:
                rec[3] += fl / rate
        rec[2] += by

    total = sum(v[0] for v in buckets.values())
    print(f"total XLA-op time {total*1e3:.1f} ms over {args.steps} steps "
          f"-> {total*1e3/args.steps:.2f} ms/step\n")
    print(f"{'bucket':<42} {'ms/step':>8} {'share':>6}  achieved vs demonstrated ceiling")
    print("-" * 115)
    for bucket, (t, fl, by, denom) in sorted(buckets.items(), key=lambda kv: -kv[1][0]):
        t_step = t / args.steps  # each op executes once per step
        ms_step = t_step * 1e3
        share = 100 * t / total
        note = ""
        if fl:  # MXU bucket: compare achieved eff rate vs harmonic per-site ceiling
            rate = fl / t_step / 1e12
            ceil = fl / denom if denom else float("nan")  # harmonic (FLOP-weighted) mean rate
            note = (f"{rate:6.1f} eff-TF/s vs {ceil:5.1f} site-weighted ceiling "
                    f"({100*rate/ceil:.0f}%) [conv_kernel_bench per-site table] "
                    f"({fl/1e12:.2f} TFLOP/step attributed)")
        elif bucket == "attention (Pallas fwd+bwd)":
            note = (f"{ms_step:.2f} ms vs ~{ATTENTION_CEIL_MS:.1f} ms "
                    f"[5 seq-1024 sites x (bwd 0.55 + fwd 0.35) ms, round-3 shootout]")
        elif bucket in CEILINGS:
            cval, prov = CEILINGS[bucket]
            rate = by / t_step / 1e9
            note = f"{rate:6.0f} GB/s vs ~{cval:.0f} ({100*rate/cval:.0f}%) [{prov}]"
        print(f"{bucket:<42} {ms_step:8.2f} {share:5.1f}%  {note}")

    print(
        "\nnotes: conv FLOP attribution is approximate (multi-kernel fusions sum"
        " their kernels; strided convs use the smaller activation's spatial"
        " extent) — the attributed TFLOP/step totals are printed so the sum can"
        " be sanity-checked against XLA cost analysis (4.32 TFLOP/step, which"
        " excludes the Pallas attention custom-calls).  GB/s figures count the"
        " tensors visible at fusion boundaries, so VMEM-resident fusions (e.g."
        " layout/copies) can legitimately exceed the HBM roofline."
    )


if __name__ == "__main__":
    main()
