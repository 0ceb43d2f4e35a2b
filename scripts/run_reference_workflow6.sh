#!/bin/bash
# Reference-workflow completion run, v6 (round-3 session 6).
#
# v5 relaunch after a real incident: 74 min into train_colorize the
# stage's jax client froze inside device init — zero bytes in either
# direction on the relay socket for 50+ min while an INDEPENDENT tiny
# probe client succeeded (85s). Diagnosis: the relay upstream dropped
# one in-flight response; the client waits forever, and v5's static
# per-stage `timeout` caps would have burned the rest of the deadline
# (the doomed stage runs to its cap, then every later stage starts
# against the same odds with less budget).
#
# v6 = v5 (same priority-ordered, deadline-aware serial chain — see
# run_reference_workflow5.sh for stage rationale) plus:
#   * a STALL WATCHDOG: every 60s, sample rchar+wchar of the python
#     under the current stage's `timeout`; if frozen for 25 consecutive
#     minutes (legit remote compiles are 5-15 min), probe the relay
#     with a tiny independent client — if the probe SUCCEEDS the stage
#     client is wedged (lost response), so kill it and mark the stall;
#     if the probe fails the relay itself is down — keep waiting (the
#     stage may resume when it returns).
#   * run_item RETRIES ONCE when (and only when) the stage died to a
#     stall-kill — an honest cap expiry or a real crash never retries.
set -u
LOG=${LOG:-/tmp/workflow.log}
OUT=${OUT:-/tmp/ab_results.txt}
GITLOCK=/tmp/git_workflow.lock
DEADLINE_TS=${DEADLINE_TS:?set DEADLINE_TS (unix seconds)}
cd "$(dirname "$0")/.."
ART=docs/artifacts/realrun_full
mkdir -p "$ART"

TRAIN_ARGS="--num_epochs 10 --batch_size 8 --gradient_accumulation_steps 1 \
  --optimizer adafactor --save_steps -1 --state_save_epochs 5 --resume"
RETRAIN_ARGS="--batch_size 8 --gradient_accumulation_steps 1 \
  --optimizer adafactor --save_steps -1 --state_save_epochs -1"

STALL_MARK=/tmp/stall_killed
WD_LOG=/tmp/watchdog.log

left() { echo $(( DEADLINE_TS - $(date +%s) )); }

state() {
  printf '{"stage": "%s", "run": 2, "ts": "%s", "deadline_left_s": %s}\n' \
    "$1" "$(date -u +%FT%TZ)" "$(left)" > "$ART/workflow_state.json"
}

sync_artifacts() {
  for pair in "colorization:colorize" "inpainting:inpaint"; do
    d="${pair%%:*}"; t="${pair##*:}"
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
  [ -f outputs/models/vae_pretrained/metrics_vae.csv ] && \
    cp outputs/models/vae_pretrained/metrics_vae.csv "$ART/metrics_vae_run2.csv"
  [ -f outputs/models/vae_pretrained/training_vae.log ] && \
    cp outputs/models/vae_pretrained/training_vae.log "$ART/training_vae_run2.log"
  [ -f outputs/models/denoising/metrics_denoise.csv ] && \
    cp outputs/models/denoising/metrics_denoise.csv "$ART/metrics_denoise_run2.csv"
  [ -f outputs/models/denoising/training_denoise.log ] && \
    cp outputs/models/denoising/training_denoise.log "$ART/training_denoise_run2.log"
  [ -f outputs/models/super_resolution/metrics_sr_x4.csv ] && \
    cp outputs/models/super_resolution/metrics_sr_x4.csv "$ART/metrics_sr_x4_run2.csv"
  [ -f outputs/models/super_resolution/training_sr_x4.log ] && \
    cp outputs/models/super_resolution/training_sr_x4.log "$ART/training_sr_x4_run2.log"
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

poller() {
  while [ -f /tmp/workflow_poller.on ]; do
    sleep 300
    commit_artifacts "workflow: periodic evidence sync"
  done
}

# --- stall watchdog -------------------------------------------------
# Kills the current stage's python iff its relay I/O has been frozen
# for STALL_MIN minutes AND an independent tiny probe reaches the TPU
# (i.e. the relay is fine, the stage client is the one that's wedged).
probe_tpu() {
  timeout 240 python - >/dev/null 2>&1 <<'EOF'
import jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
assert float(jnp.sum(jnp.ones((8, 8)))) == 64.0
EOF
}

watchdog() {
  local chain_pid=$1 stall_min=${2:-25}
  local last="" frozen=0 t py io
  while kill -0 "$chain_pid" 2>/dev/null; do
    sleep 60
    # current stage: python under a `timeout` child of the chain
    py=""
    for t in $(ps --ppid "$chain_pid" -o pid= -o comm= \
               | awk '$2=="timeout"{print $1}'); do
      py=$(ps --ppid "$t" -o pid= -o comm= | awk '$2~/^python/{print $1; exit}')
      [ -n "$py" ] && break
    done
    if [ -z "$py" ]; then last=""; frozen=0; continue; fi
    io=$(awk -F': ' '/^(rchar|wchar)/{s+=$2} END{print s}' /proc/"$py"/io 2>/dev/null)
    [ -z "$io" ] && continue
    if [ "$io" = "$last" ]; then
      frozen=$((frozen + 1))
    else
      frozen=0; last="$io"
    fi
    if [ "$frozen" -ge "$stall_min" ]; then
      if probe_tpu; then
        echo "$(date -u) watchdog: stage python $py frozen ${frozen}m, relay alive -> kill" >> "$WD_LOG"
        touch "$STALL_MARK"
        kill -9 "$py" 2>/dev/null
        frozen=0; last=""
      else
        echo "$(date -u) watchdog: stage python $py frozen ${frozen}m, relay DOWN -> wait" >> "$WD_LOG"
        frozen=$((stall_min - 5))   # re-probe in 5 min
      fi
    fi
  done
}

run_item() {
  # run_item <label> <min_budget_s> <max_s> <cmd...>
  local label="$1" need="$2" cap="$3"; shift 3
  local rem rc attempt
  for attempt in 1 2; do
    rem=$(left)
    if [ "$rem" -lt "$need" ]; then
      echo "--- skip $label: ${rem}s left (< ${need}s)" >> "$LOG"; return 1
    fi
    rm -f "$STALL_MARK"
    echo "--- $label start (attempt $attempt) $(date) (left ${rem}s)" >> "$LOG"
    state "$label"
    timeout $(( rem < cap ? rem : cap )) "$@" >> "$LOG" 2>&1
    rc=$?
    echo "--- $label exit=$rc (attempt $attempt) $(date)" >> "$LOG"
    if [ "$rc" -ge 124 ] && [ -f "$STALL_MARK" ]; then
      echo "--- $label died to a stall-kill; retrying once" >> "$LOG"
      continue
    fi
    return $rc
  done
  return $rc
}

bench_item() {
  # bench_item <label> <min_budget_s> <env k=v ...>
  local label="$1" need="$2"; shift 2
  local rem; rem=$(left)
  if [ "$rem" -lt "$need" ]; then
    echo "--- skip bench $label: ${rem}s left" >> "$OUT"; return
  fi
  # skip only on a COMPLETED (exit=0) prior measurement: a bare start
  # marker can be a timed-out/crashed attempt from an earlier session and
  # must be retried (ADVICE r3 #1; matches run_after_wf5.sh semantics)
  if grep -q "^--- $label exit=0" "$OUT" 2>/dev/null; then
    echo "--- $label already measured, skipping" >> "$OUT"; return
  fi
  rm -f "$STALL_MARK"
  echo "--- $label start $(date)" >> "$OUT"
  state "bench_$label"
  env "$@" timeout $(( rem < 2400 ? rem : 2400 )) python bench.py \
    2>"/tmp/s6_${label}.err" | tail -1 >> "$OUT"
  echo "--- $label exit=${PIPESTATUS[0]} $(date)" >> "$OUT"
}

echo "=== reference workflow v6 start $(date), deadline in $(left)s ===" >> "$LOG"
state "start"

# datagen must already be DONE (v5 ran on this data); hard-require it.
if ! grep -q DATAGEN_DONE /tmp/datagen.log 2>/dev/null; then
  echo "--- datagen missing; regenerating" >> "$LOG"
  (python scripts/make_procedural_clean.py --out_root data/clean \
    && python scripts/make_synthetic_pairs.py --clean_root data/clean \
      --out_root data/pairs && echo DATAGEN_DONE >> /tmp/datagen.log) \
    >> /tmp/datagen.log 2>&1
fi

touch /tmp/workflow_poller.on
poller &
POLLER_PID=$!
watchdog $$ 25 &
WATCHDOG_PID=$!

# 1. VAE pretrain (skipped when the v5 run's best/ is present)
if [ ! -f outputs/models/vae_pretrained/best/model_index.json ]; then
  run_item vae_pretrain 2400 4500 python scripts/pretrain_vae.py \
    --num_epochs 10 --output_dir outputs/models/vae_pretrained
fi
commit_artifacts "workflow v6: VAE pretrain artifacts"

if [ -f outputs/models/vae_pretrained/best/model_index.json ]; then
  VAE_INIT="--vae_init outputs/models/vae_pretrained/best"
else
  echo "--- WARNING: no pretrained VAE; random frozen VAE" >> "$LOG"
  VAE_INIT=""
fi

# 2-3. the two tasks with missing/partial run-1 evidence
run_item train_colorize 3000 5400 python scripts/train_colorization.py \
  $TRAIN_ARGS $VAE_INIT
commit_artifacts "workflow v6: colorize training artifacts (full 10-epoch run)"

run_item train_inpaint 3000 6000 python scripts/train_inpainting.py \
  $TRAIN_ARGS $VAE_INIT
commit_artifacts "workflow v6: inpaint training artifacts"

# 4. first predictions + evaluation pass
run_item predict_1 1800 4200 python scripts/generate_predictions.py \
  --tasks colorize inpaint --split test
run_item evaluate_1 600 2400 python scripts/evaluate_model.py --split test
commit_artifacts "workflow v6: predictions + evaluation (colorize+inpaint fine-tuned)"

# 5-6. weights-only retrains to restore denoise/sr checkpoints
run_item retrain_denoise 2100 4200 python scripts/train_denoising.py \
  $RETRAIN_ARGS --num_epochs 4 $VAE_INIT
commit_artifacts "workflow v6: denoise retrain (4 ep, checkpoint restore)"

run_item retrain_sr 2400 4200 python scripts/train_super_resolution.py \
  $RETRAIN_ARGS --num_epochs 2 $VAE_INIT
commit_artifacts "workflow v6: sr_x4 retrain (2 ep, checkpoint restore)"

# 7. full predictions + evaluation with all four fine-tuned checkpoints
run_item predict_2 2400 5400 python scripts/generate_predictions.py \
  --tasks denoise sr_x4 --split test
run_item evaluate_2 600 2400 python scripts/evaluate_model.py --split test
commit_artifacts "workflow v6: final predictions + evaluation (all tasks)"

state "perf_queue"
# 8. quality gate on the fresh denoise best (int8_static + turbo + ToMe)
if [ -d outputs/models/denoising/best ]; then
  rem=$(left)
  if [ "$rem" -ge 1500 ]; then
    echo "--- gate_combo start $(date)" >> "$OUT"
    state "gate_combo"
    rm -f "$STALL_MARK"
    timeout $(( rem < 5400 ? rem : 5400 )) python -u \
      scripts/eval_quant_quality.py \
      --checkpoint outputs/models/denoising/best --size 512 --n 4 \
      --modes int8_static --cfg_cache 2 --tome 0.5 \
      >> "$OUT" 2>"/tmp/s6_gate.err"
    echo "--- gate_combo exit=$? $(date)" >> "$OUT"
  else
    echo "--- skip gate_combo: ${rem}s left" >> "$OUT"
  fi
fi

# 9. approximate-mode throughput points
bench_item bench_tome05 900 BENCH_TOME=0.5
bench_item bench_tome05_k2 800 BENCH_TOME=0.5 BENCH_CFG_CACHE=2
bench_item bench_turbo_k3 800 BENCH_CFG_CACHE=3

# 10. flag sweep, highest expected value first
bench_item base_ctl 800 BENCH_DUMMY=1
bench_item fastq 800 \
  BENCH_XLA_OPTS=xla_tpu_experimental_allow_fast_quantization_conversions=true
bench_item vmem64m 800 BENCH_XLA_OPTS=xla_tpu_scoped_vmem_limit_kib=65536
bench_item autotune 800 BENCH_XLA_OPTS=xla_tpu_autotune_dots=true
bench_item aggrfuse 800 \
  BENCH_XLA_OPTS=xla_tpu_enable_aggressive_loop_fusion_layout_opt=true

rm -f /tmp/workflow_poller.on
kill "$POLLER_PID" "$WATCHDOG_PID" 2>/dev/null
state "done"
commit_artifacts "workflow v6: final artifacts"
echo "=== reference workflow v6 done $(date) ===" >> "$LOG"
