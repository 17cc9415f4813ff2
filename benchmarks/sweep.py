"""A/B sweep of sampling-perf variants on the real TPU chip.

Runs ``bench.py`` in a fresh subprocess per variant (env flags change the traced
graph, so each variant is its own compile; the persistent cache makes repeats
fast).  Results append to ``/tmp/polyff_sweep.jsonl`` and print at the end.

Run in the background: each cold TPU compile can take 20-60 minutes.
"""

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

VARIANTS = [
    # name, env overrides (on top of current env).  POLYFF_FUSED_GN_CONV is
    # OFF by default everywhere (measured 2x slower than XLA's conv path);
    # variants pin it explicitly anyway so each row is self-describing.
    ("r1_baseline", {"POLYFF_BF16_PARAMS": "0", "POLYFF_FUSED_ATTN": "0",
                     "POLYFF_MATERIALIZE_CONCAT": "1", "POLYFF_LEGACY_UPSAMPLE": "1",
                     "POLYFF_FUSED_GN_CONV": "0"}),
    ("bf16_params", {"POLYFF_BF16_PARAMS": "1", "POLYFF_FUSED_ATTN": "0",
                     "POLYFF_MATERIALIZE_CONCAT": "1", "POLYFF_FUSED_GN_CONV": "0"}),
    ("virtual_concat", {"POLYFF_BF16_PARAMS": "1", "POLYFF_FUSED_ATTN": "0",
                        "POLYFF_FUSED_GN_CONV": "0"}),
    ("fused_attn", {"POLYFF_BF16_PARAMS": "1", "POLYFF_FUSED_ATTN": "1",
                    "POLYFF_MATERIALIZE_CONCAT": "1", "POLYFF_FUSED_GN_CONV": "0"}),
    ("r2_combined", {"POLYFF_BF16_PARAMS": "1", "POLYFF_FUSED_ATTN": "1",
                     "POLYFF_FUSED_GN_CONV": "0"}),
    # round-2 kernel additions on top of r2_combined
    ("fused_gn_conv", {"POLYFF_BF16_PARAMS": "1", "POLYFF_FUSED_ATTN": "1",
                       "POLYFF_FUSED_GN_CONV": "1"}),
    ("int8_conv", {"POLYFF_BF16_PARAMS": "1", "POLYFF_FUSED_ATTN": "1",
                   "POLYFF_INT8_CONV": "1"}),
    # CFG fork re-test: lost 1.5% when bandwidth-bound (round 1); now that the
    # path is compute-bound the ~7% FLOP saving may win
    ("cfg_fork", {"POLYFF_BF16_PARAMS": "1", "POLYFF_FUSED_ATTN": "1",
                  "POLYFF_CFG_FORK": "1"}),
    ("int8_fork", {"POLYFF_BF16_PARAMS": "1", "POLYFF_FUSED_ATTN": "1",
                   "POLYFF_INT8_CONV": "1", "POLYFF_CFG_FORK": "1"}),
    # int8 through XLA's native s8 conv (ops/quant.py) — no Pallas involved
    ("int8_xla", {"POLYFF_BF16_PARAMS": "1", "POLYFF_FUSED_ATTN": "1",
                  "POLYFF_FUSED_GN_CONV": "0", "POLYFF_INT8_XLA": "1"}),
    ("int8_xla_fork", {"POLYFF_BF16_PARAMS": "1", "POLYFF_FUSED_ATTN": "1",
                       "POLYFF_FUSED_GN_CONV": "0", "POLYFF_INT8_XLA": "1",
                       "POLYFF_CFG_FORK": "1"}),
]


def main():
    out_path = os.environ.get("SWEEP_OUT", "/tmp/polyff_sweep.jsonl")
    only = sys.argv[1:] or None
    results = []
    for name, envov in VARIANTS:
        if only and name not in only:
            continue
        env = dict(os.environ)
        env.update(envov)
        env.setdefault("BENCH_ITERS", "5")
        t0 = time.time()
        proc = subprocess.run(
            [sys.executable, os.path.join(REPO, "bench.py")],
            env=env, capture_output=True, text=True, timeout=7200,
        )
        line = proc.stdout.strip().splitlines()[-1] if proc.stdout.strip() else ""
        try:
            rec = json.loads(line)
        except Exception:
            rec = {"error": proc.stderr[-2000:]}
        rec["variant"] = name
        rec["wall_min"] = round((time.time() - t0) / 60, 1)
        results.append(rec)
        with open(out_path, "a") as f:
            f.write(json.dumps(rec) + "\n")
        print(json.dumps(rec), flush=True)
    print("\n== sweep summary ==")
    for r in results:
        print(f"{r['variant']:16s} {r.get('value', 'ERR')} {r.get('unit','')} "
              f"spread={r.get('spread','-')} ({r['wall_min']} min)")


if __name__ == "__main__":
    main()
