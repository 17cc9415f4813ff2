#!/bin/bash
# Fréchet-distance sample-QUALITY sweep over the sampling configs
# (PARITY.md "Sample quality: Fréchet distance"):
#
#   scripts/fd_sweep.sh <distill_fidelity workdir>
#
# Requires a completed scripts/distill_fidelity.sh workdir (teacher run +
# distilled students).  The control-fidelity tables measure STEERING and are
# saturation-prone (chd_acc certified "distillation loses nothing" but could
# not rank student vs naive DDIM-4); FD against the real val set measures
# DISTRIBUTIONAL match, where coarse few-step integration bias shows.  All
# configs run at EQUAL n (FD estimates are biased at small n) with the same
# seed and the same real reference set; the real_split row in each fd.json is
# the estimator's noise floor.
#
# Configs: teacher DDIM-50 (scales 0,1,3,5 — one traced-scale executable),
# teacher DDIM-16 + DDIM-4 (naive few-step ablations, scale 5), and every
# distilled student present (4/2/1 NFE, guidance baked -> scale 1).
set -euo pipefail
WORK=$(realpath -m "${1:?distill_fidelity workdir}")
BATCHES=${BATCHES:-8}        # x batch 16 = 128 samples/config
SCALES=${SCALES:-0,1,3,5}
cd "$(dirname "$0")/.."

CORPUS="$WORK/corpus"
PRE="$WORK/pretrained"
RUN=$(ls -d "$WORK/sdf_chd8bar"/*/ | tail -1)
[ -f "$RUN/params.yaml" ] || { echo "no teacher in $WORK"; exit 1; }

echo "=== fd: teacher @ DDIM-50, scales $SCALES ==="
timeout 7200 python -m polyffusion_tpu.expr --chkpt_path "$RUN" --data_dir "$CORPUS" \
  --pretrained_dir "$PRE" --type fd --scales "$SCALES" --batch_num "$BATCHES" \
  --batch_size 16 --ddim --ddim_steps 50 --output_dir "$WORK/fd_teacher50" --seed 1

for S in 16 4; do
  echo "=== fd: teacher @ DDIM-$S + CFG 5 (naive few-step ablation) ==="
  timeout 7200 python -m polyffusion_tpu.expr --chkpt_path "$RUN" --data_dir "$CORPUS" \
    --pretrained_dir "$PRE" --type fd --scales 5 --batch_num "$BATCHES" \
    --batch_size 16 --ddim --ddim_steps "$S" --output_dir "$WORK/fd_teacher$S" --seed 1
done

for ST in distilled distilled_2 distilled_1; do
  [ -f "$WORK/$ST/params.yaml" ] || continue
  echo "=== fd: student $ST @ its own grid, scale 1 (guidance baked) ==="
  timeout 7200 python -m polyffusion_tpu.expr --chkpt_path "$WORK/$ST" \
    --data_dir "$CORPUS" --pretrained_dir "$PRE" --type fd --scales 1 \
    --batch_num "$BATCHES" --batch_size 16 --ddim \
    --output_dir "$WORK/fd_$ST" --seed 1
done

echo "=== fd_sweep done: compare $WORK/fd_*/fd.json (fd_stats columns; equal n) ==="
