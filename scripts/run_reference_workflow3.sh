#!/bin/bash
# Stage 4 (v3): full reference-workflow reproduction on the real chip,
# FROM SCRATCH — the VM reset between sessions wiped outputs/ (the v1/v2
# orbax train states) and data/, so there is nothing to resume. Runs the
# reference's documented recipe (README: 4 tasks x 10 epochs -> predict
# -> evaluate) through the production train_task/serving paths with the
# v2 checkpoint-I/O settings (async orbax saves, state_save_epochs
# cadence, frozen-component skip).
#
# Writes the same "reference workflow done" marker to $LOG so the armed
# stage-5 gate script (scripts/run_post_workflow.sh) fires.
set -u
LOG=${LOG:-/tmp/workflow.log}
cd "$(dirname "$0")/.."

TRAIN_ARGS="--num_epochs 10 --batch_size 8 --gradient_accumulation_steps 1 \
  --optimizer adafactor --save_steps -1 --max_val_samples 16 \
  --state_save_epochs 5"

run_train() {
  local script="$1" label="$2"; shift 2
  echo "--- train $label start $(date)" >> "$LOG"
  timeout 7200 python "scripts/$script" $TRAIN_ARGS "$@" >> "$LOG" 2>&1
  echo "--- train $label exit=$? $(date)" >> "$LOG"
}

echo "=== reference workflow v3 start $(date) ===" >> "$LOG"

# Self-heal after a VM reset: regenerate the procedural data if missing.
if [ ! -d data/pairs/denoise/train ]; then
  echo "--- regenerating data (VM reset wiped data/) $(date)" >> "$LOG"
  python scripts/make_procedural_clean.py --out_root data/clean >> "$LOG" 2>&1
  python scripts/make_synthetic_pairs.py --clean_root data/clean \
    --out_root data/pairs >> "$LOG" 2>&1
fi

run_train train_denoising.py denoise
run_train train_super_resolution.py sr_x4
run_train train_colorization.py colorize
run_train train_inpainting.py inpaint

echo "--- generate_predictions start $(date)" >> "$LOG"
timeout 7200 python scripts/generate_predictions.py \
  --tasks denoise sr_x4 colorize inpaint --split test >> "$LOG" 2>&1
echo "--- generate_predictions exit=$? $(date)" >> "$LOG"

echo "--- evaluate_model start $(date)" >> "$LOG"
timeout 3600 python scripts/evaluate_model.py --split test >> "$LOG" 2>&1
echo "--- evaluate_model exit=$? $(date)" >> "$LOG"

ART=docs/artifacts/realrun_full
mkdir -p "$ART"
for task_dir in denoising super_resolution colorization inpainting; do
  src="outputs/models/$task_dir"
  [ -d "$src" ] || continue
  cp "$src"/metrics_*.csv "$ART/" 2>/dev/null
  cp "$src"/training_*.log "$ART/" 2>/dev/null
  mkdir -p "$ART/val_samples_$task_dir"
  ls "$src/val_samples/" 2>/dev/null | sort | sed -n '1p;$p' | while read f; do
    cp "$src/val_samples/$f" "$ART/val_samples_$task_dir/" 2>/dev/null
  done
done
cp outputs/evaluation_results.json "$ART/" 2>/dev/null
echo "=== reference workflow done $(date) ===" >> "$LOG"
