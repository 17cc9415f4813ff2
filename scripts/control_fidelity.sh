#!/bin/bash
# End-to-end control-fidelity pipeline (the reference paper's quality claim,
# measured on synthetic data this environment can provide — PARITY.md
# "Chord control fidelity").
#
#   scripts/control_fidelity.sh chd   <workdir>   # chord-conditioned sdf_chd8bar
#   scripts/control_fidelity.sh txt   <workdir>   # texture-conditioned sdf_txt
#   scripts/control_fidelity.sh joint <workdir>   # chord+texture sdf_chd8bar_txt
#   scripts/control_fidelity.sh pnt   <workdir>   # pnotree-conditioned sdf_pnotree
#
# Each mode: synth corpus -> (pretrain frozen encoders if needed) -> 16k-step
# flagship train -> expr accuracy sweep over CFG scales {0,1,3,5}.  The chd
# mode uses the harmonically-labeled corpus; txt/joint use --vary_texture so
# the shuffled-pair chance floor is meaningful (a texture-homogeneous corpus
# makes txt_acc blind — matched and shuffled pairings score identically).
#
# TPU wall time: ~2-4h per mode through the remote tunnel.  Checkpoints save
# every 10 epochs so a mid-run kill never loses the training.
set -euo pipefail
MODE=${1:?mode: chd|txt|joint|pnt}
# resolve the workdir to an absolute path BEFORE the cd below — a relative
# workdir otherwise dangles both the mkdir'd tree and the pretrain symlink
WORK=$(realpath -m "${2:?workdir}")
STEPS=${STEPS:-16000}
SCALES=${SCALES:-0,1,3,5}
mkdir -p "$WORK"
cd "$(dirname "$0")/.."

CORPUS="$WORK/corpus"
if [ ! -d "$CORPUS" ]; then
  VARY=""
  [ "$MODE" != "chd" ] && VARY="--vary_texture"
  python -m polyffusion_tpu.tools synth_corpus --out "$CORPUS" --n_songs 256 --n_bars 32 $VARY
fi

PRE="$WORK/pretrained"
mkdir -p "$PRE"
if [ "$MODE" != "txt" ] && [ "$MODE" != "pnt" ] && [ ! -d "$PRE/chd8bar" ]; then
  echo "=== chd_8bar pretrain (frozen chord encoder) ==="
  python -m polyffusion_tpu.main --model chd_8bar --output_dir "$WORK/chd8bar" \
    --data_dir "$CORPUS" --max_steps 3000 --save_every 5 --log_every 500 --fresh
  ln -s "$(ls -d "$WORK"/chd8bar/*/ | tail -1)" "$PRE/chd8bar"
fi
if { [ "$MODE" = "txt" ] || [ "$MODE" = "joint" ]; } && [ ! -f "$PRE/polydis.npz" ]; then
  # deterministic random-init frozen texture encoder (no pretrained PolyDis
  # weights exist in this environment; the embedding only needs to separate
  # textures, which random projections do)
  python -m polyffusion_tpu.convert --kind txt_enc --init --seed 0 --output "$PRE/polydis.npz"
fi

if [ "$MODE" = "pnt" ] && [ ! -d "$PRE/pnotree" ]; then
  # pretrain the PianoTree VAE and freeze its encoder — the reference's own
  # dependency chain (it loads a PolyDis-pretrained PianoTree VAE).  A
  # random-init hierarchical-GRU encoder is measurably BLIND: its embeddings
  # collapse (pairwise z distance ~3.5% of the z norm), so the diffusion
  # model learns to ignore the channel and matched == shuffled at every CFG
  # scale (measured round 5; same failure class as the homogeneous-texture
  # corpus catch).
  echo "=== pnotree_vae pretrain (frozen pnotree encoder) ==="
  python -m polyffusion_tpu.main --model pnotree_vae --output_dir "$WORK/pnotreevae" \
    --data_dir "$CORPUS" --max_steps "${PNT_VAE_STEPS:-3000}" --save_every 5 \
    --log_every 200 --fresh
  ln -s "$(ls -d "$WORK"/pnotreevae/*/ | tail -1)" "$PRE/pnotree"
fi

case "$MODE" in
  chd)   MODEL=sdf_chd8bar     SWEEPS="chd_acc" ;;
  txt)   MODEL=sdf_txt         SWEEPS="txt_acc" ;;
  joint) MODEL=sdf_chd8bar_txt SWEEPS="chd_acc txt_acc" ;;
  pnt)   MODEL=sdf_pnotree     SWEEPS="pnt_acc" ;;
esac

echo "=== $MODEL train ($STEPS steps) ==="
timeout 28800 python -m polyffusion_tpu.main --model "$MODEL" --output_dir "$WORK/$MODEL" \
  --data_dir "$CORPUS" --pretrained_dir "$PRE" --max_steps "$STEPS" \
  --save_every 10 --log_every 500 --fresh
RUN=$(ls -d "$WORK/$MODEL"/*/ | tail -1)
echo "run: $RUN"

for S in $SWEEPS; do
  echo "=== expr --type $S ==="
  timeout 7200 python -m polyffusion_tpu.expr --chkpt_path "$RUN" --data_dir "$CORPUS" \
    --pretrained_dir "$PRE" --type "$S" --scales "$SCALES" --batch_num 2 --batch_size 16 \
    --ddim --ddim_steps 50 --output_dir "$WORK/eval_$S" --seed 1
done
echo "=== control_fidelity $MODE done ==="
