#!/bin/bash
# Distillation quality pipeline (PARITY.md "Progressive distillation"):
#
#   scripts/distill_fidelity.sh <workdir>
#
# Reuses a `control_fidelity.sh chd` workdir when present (corpus, frozen
# chord encoder, trained sdf_chd8bar teacher); otherwise builds those first.
# Then:
#   1. distill the teacher (CFG 5 baked in, 64 -> 4 step halving)
#   2. chd_acc sweep on the TEACHER at DDIM-50, CFG scales 0/1/3/5 (the
#      reference-parity quality row)
#   3. chd_acc on the TEACHER at DDIM-4 + CFG 5 (naive few-step ablation —
#      what quality 4 steps cost WITHOUT distillation)
#   4. chd_acc on the 4-step STUDENT at scale 1 (guidance baked in; the
#      session auto-pins the student's own tau grid)
# The distillation claim is (4) ~= (2) >> (3), at 4 single-pass UNet evals
# vs 100 double-batched ones.
#
# TPU wall time: ~2-4h cold through the remote tunnel (teacher train
# dominates); checkpoints save every 10 epochs so a mid-run kill never
# loses the training.
set -euo pipefail
WORK=$(realpath -m "${1:?workdir}")
STEPS=${STEPS:-16000}
SCALES=${SCALES:-0,1,3,5}
GUIDE=${GUIDE:-5.0}
BASE_STEPS=${BASE_STEPS:-64}
END_STEPS=${END_STEPS:-4}
STAGE_A_STEPS=${STAGE_A_STEPS:-3000}
PHASE_STEPS=${PHASE_STEPS:-1500}
mkdir -p "$WORK"
cd "$(dirname "$0")/.."

CORPUS="$WORK/corpus"
PRE="$WORK/pretrained"
if [ ! -d "$CORPUS" ]; then
  python -m polyffusion_tpu.tools synth_corpus --out "$CORPUS" --n_songs 256 --n_bars 32
fi
mkdir -p "$PRE"
if [ ! -d "$PRE/chd8bar" ]; then
  echo "=== chd_8bar pretrain (frozen chord encoder) ==="
  python -m polyffusion_tpu.main --model chd_8bar --output_dir "$WORK/chd8bar" \
    --data_dir "$CORPUS" --max_steps 3000 --save_every 5 --log_every 500 --fresh
  ln -s "$(ls -d "$WORK"/chd8bar/*/ | tail -1)" "$PRE/chd8bar"
fi

if [ -z "$(ls -d "$WORK"/sdf_chd8bar/*/ 2>/dev/null)" ]; then
  echo "=== sdf_chd8bar teacher train ($STEPS steps) ==="
  timeout 28800 python -m polyffusion_tpu.main --model sdf_chd8bar \
    --output_dir "$WORK/sdf_chd8bar" --data_dir "$CORPUS" --pretrained_dir "$PRE" \
    --max_steps "$STEPS" --save_every 10 --log_every 500 --fresh
fi
RUN=$(ls -d "$WORK/sdf_chd8bar"/*/ | tail -1)
echo "teacher: $RUN"

STUDENT="$WORK/distilled"
if [ ! -f "$STUDENT/params.yaml" ]; then
  echo "=== progressive distillation (CFG $GUIDE baked, $BASE_STEPS -> $END_STEPS) ==="
  timeout 28800 python -m polyffusion_tpu.distill --teacher "$RUN" \
    --data_dir "$CORPUS" --pretrained_dir "$PRE" --output_dir "$STUDENT" \
    --guide_scale "$GUIDE" --base_steps "$BASE_STEPS" --end_steps "$END_STEPS" \
    --stage_a_steps "$STAGE_A_STEPS" --phase_steps "$PHASE_STEPS" \
    --save_every 10 --log_every 500 --resume
fi

echo "=== teacher chd_acc @ DDIM-50, scales $SCALES ==="
timeout 7200 python -m polyffusion_tpu.expr --chkpt_path "$RUN" --data_dir "$CORPUS" \
  --pretrained_dir "$PRE" --type chd_acc --scales "$SCALES" --batch_num 2 \
  --batch_size 16 --ddim --ddim_steps 50 --output_dir "$WORK/eval_teacher50" --seed 1

echo "=== teacher chd_acc @ DDIM-$END_STEPS (naive few-step ablation), scale ${GUIDE%.*} ==="
timeout 7200 python -m polyffusion_tpu.expr --chkpt_path "$RUN" --data_dir "$CORPUS" \
  --pretrained_dir "$PRE" --type chd_acc --scales "${GUIDE%.*}" --batch_num 2 \
  --batch_size 16 --ddim --ddim_steps "$END_STEPS" \
  --output_dir "$WORK/eval_teacher$END_STEPS" --seed 1

echo "=== student chd_acc @ its $END_STEPS-step grid, scale 1 (guidance baked) ==="
timeout 7200 python -m polyffusion_tpu.expr --chkpt_path "$STUDENT" --data_dir "$CORPUS" \
  --pretrained_dir "$PRE" --type chd_acc --scales 1 --batch_num 2 \
  --batch_size 16 --ddim --output_dir "$WORK/eval_student" --seed 1

echo "=== distill_fidelity done: compare $WORK/eval_{teacher50,teacher$END_STEPS,student}/chd_acc.json ==="
