#!/bin/bash
# Re-measure every secondary bench config live on the TPU and rewrite
# BENCH_SECONDARY.json (the provenance-marked captures that bench.py merges
# into the headline JSON line).  Each workload runs through the same
# probe-gated protocol; a failed/outage run leaves that entry untouched.
#
#   scripts/bench_secondary.sh [logdir=/tmp/bench_secondary]
set -uo pipefail
LOG=${1:-/tmp/bench_secondary}
mkdir -p "$LOG"
cd "$(dirname "$0")/.."

declare -A METRICS=(
  [dpm]=dpm16_samples_per_sec
  [distill]=distill4_samples_per_sec
  [autoreg]=autoreg_s_per_piece
  [ddpm1000]=ddpm1000_samples_per_sec
  [inpaint]=inpaint_below_samples_per_sec
  [train]=train_ms_per_step
)

for m in dpm distill autoreg ddpm1000 inpaint train; do
  echo "=== BENCH_METRIC=$m $(date -u +%H:%M:%S) ==="
  if BENCH_METRIC=$m timeout 7200 python bench.py > "$LOG/$m.out" 2> "$LOG/$m.err"; then
    line=$(tail -1 "$LOG/$m.out")
    echo "$line"
    python - "$m" "${METRICS[$m]}" "$line" <<'EOF'
import json, sys
m, key, line = sys.argv[1], sys.argv[2], sys.argv[3]
rec = json.load(open("BENCH_SECONDARY.json"))
d = json.loads(line)
rec["secondary"][key] = d["value"]
if m == "train" and d.get("mfu") is not None:
    rec["secondary"]["train_mfu"] = d["mfu"]
    rec["captured"]["train_mfu"] = f"live recapture (metric {d['metric']}, spread {d['spread']}, congested {d.get('congested')})"
rec["captured"][key] = f"live recapture (metric {d['metric']}, spread {d['spread']}, congested {d.get('congested')})"
json.dump(rec, open("BENCH_SECONDARY.json", "w"), indent=2)
print(f"updated {key} = {d['value']}")
EOF
  else
    echo "FAILED (see $LOG/$m.err); entry left untouched"
  fi
done
echo "=== bench_secondary done ==="
