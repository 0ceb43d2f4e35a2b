#!/bin/bash
# Full reference-workflow reproduction on the real chip, v4.
# Reference recipe (README: 4 tasks x 10 epochs -> predict -> evaluate)
# through the production train_task/serving paths, plus:
#
#   - Stage 0: VAE reconstruction pretrain (scripts/pretrain_vae.py) — the
#     air-gapped stand-in for the pretrained SD1.5 VAE the reference
#     freezes; task trainers consume it via --vae_init so validation PSNR
#     can actually track UNet learning (round-2 run had a random frozen
#     VAE, so val PSNR was pinned at decode-noise level).
#   - Incremental evidence commits: a background poller syncs per-epoch
#     CSVs/logs into docs/artifacts/realrun_full/ and commits them (flock'd
#     partial commits), so a VM reset costs at most ~an epoch of evidence
#     (round-2 lost two full attempts this way).
#   - Full val set per epoch (no --max_val_samples cap; batch-8 validation
#     with ragged-batch padding keeps it one compile).
#
# Writes the same "reference workflow done" marker to $LOG so the armed
# stage-5 gate script (scripts/run_post_workflow.sh) fires.
set -u
LOG=${LOG:-/tmp/workflow.log}
GITLOCK=/tmp/git_workflow.lock
cd "$(dirname "$0")/.."
ART=docs/artifacts/realrun_full
mkdir -p "$ART"

TRAIN_ARGS="--num_epochs 10 --batch_size 8 --gradient_accumulation_steps 1 \
  --optimizer adafactor --save_steps -1 --state_save_epochs 5 --resume"

state() {
  printf '{"stage": "%s", "ts": "%s"}\n' "$1" "$(date -u +%FT%TZ)" \
    > "$ART/workflow_state.json"
}

sync_artifacts() {
  for d in vae_pretrained denoising super_resolution colorization inpainting; do
    src="outputs/models/$d"
    [ -d "$src" ] || continue
    cp "$src"/metrics_*.csv "$ART/" 2>/dev/null
    cp "$src"/training_*.log "$ART/" 2>/dev/null
    if [ -d "$src/val_samples" ]; then
      mkdir -p "$ART/val_samples_$d"
      ls "$src/val_samples/" | sort -V | sed -n '1p;$p' | while read -r f; do
        cp "$src/val_samples/$f" "$ART/val_samples_$d/" 2>/dev/null
      done
    fi
  done
  cp outputs/evaluation_results.json "$ART/" 2>/dev/null
  return 0
}

commit_artifacts() {
  sync_artifacts
  (
    flock -w 120 9 || exit 0
    git add -A "$ART" >/dev/null 2>&1
    git commit -q -m "$1" -- "$ART" >/dev/null 2>&1 || true
  ) 9>"$GITLOCK"
}

# Background evidence poller: one commit per sync while training runs.
poller() {
  while [ -f /tmp/workflow_poller.on ]; do
    sleep 300
    commit_artifacts "workflow: periodic evidence sync"
  done
}

run_train() {
  local script="$1" label="$2"; shift 2
  echo "--- train $label start $(date)" >> "$LOG"
  state "train_$label"
  timeout 9000 python "scripts/$script" $TRAIN_ARGS "$@" >> "$LOG" 2>&1
  echo "--- train $label exit=$? $(date)" >> "$LOG"
  commit_artifacts "workflow: $label training artifacts"
}

echo "=== reference workflow v4 start $(date) ===" >> "$LOG"
state "start"

# Self-heal after a VM reset: regenerate the procedural data if missing.
if [ ! -d data/pairs/denoise/train ]; then
  echo "--- regenerating data (VM reset wiped data/) $(date)" >> "$LOG"
  state "datagen"
  python scripts/make_procedural_clean.py --out_root data/clean >> "$LOG" 2>&1
  python scripts/make_synthetic_pairs.py --clean_root data/clean \
    --out_root data/pairs >> "$LOG" 2>&1
fi

touch /tmp/workflow_poller.on
poller &
POLLER_PID=$!

# Stage 0: VAE pretrain (skipped when a previous run's best survives).
if [ ! -f outputs/models/vae_pretrained/best/model_index.json ]; then
  echo "--- vae pretrain start $(date)" >> "$LOG"
  state "vae_pretrain"
  timeout 5400 python scripts/pretrain_vae.py --num_epochs 16 \
    --output_dir outputs/models/vae_pretrained >> "$LOG" 2>&1
  echo "--- vae pretrain exit=$? $(date)" >> "$LOG"
else
  echo "--- vae pretrain skipped (best exists) $(date)" >> "$LOG"
fi
commit_artifacts "workflow: VAE pretrain artifacts"

# Degrade gracefully if stage 0 failed: train with a random frozen VAE
# (round-2 behavior) rather than aborting the whole workflow.
if [ -f outputs/models/vae_pretrained/best/model_index.json ]; then
  TRAIN_ARGS="$TRAIN_ARGS --vae_init outputs/models/vae_pretrained/best"
else
  echo "--- WARNING: no pretrained VAE; training with random frozen VAE" >> "$LOG"
fi

run_train train_denoising.py denoise
run_train train_super_resolution.py sr_x4
run_train train_colorization.py colorize
run_train train_inpainting.py inpaint

echo "--- generate_predictions start $(date)" >> "$LOG"
state "predict"
timeout 7200 python scripts/generate_predictions.py \
  --tasks denoise sr_x4 colorize inpaint --split test >> "$LOG" 2>&1
echo "--- generate_predictions exit=$? $(date)" >> "$LOG"

echo "--- evaluate_model start $(date)" >> "$LOG"
state "evaluate"
timeout 3600 python scripts/evaluate_model.py --split test >> "$LOG" 2>&1
echo "--- evaluate_model exit=$? $(date)" >> "$LOG"

rm -f /tmp/workflow_poller.on
kill "$POLLER_PID" 2>/dev/null
state "done"
commit_artifacts "workflow: final artifacts (predictions + evaluation)"
echo "=== reference workflow done $(date) ===" >> "$LOG"
