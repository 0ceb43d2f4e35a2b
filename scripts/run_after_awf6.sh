#!/bin/bash
# Follow-on chain #2: runs after scripts/run_after_wf6.sh releases the chip.
#
# Purpose: the one remaining gap in the reference-workflow reproduction is
# colorize at 5/10 epochs (v6's 90-min stage cap expired at epoch 5; the
# orbax train_state/1250 is resumable). This chain resumes colorize to the
# full 10 epochs, refreshes its test-split predictions + evaluation, then
# re-offers any perf/gate items the earlier chains skipped for time.
#
# Same serial-TPU discipline, deadline awareness, and stall watchdog as
# run_after_wf6.sh (the relay has twice dropped an in-flight response,
# leaving the jax client frozen forever while the relay itself is fine).
#
# Launch:  DEADLINE_TS=<unix seconds> nohup bash scripts/run_after_awf6.sh \
#            >/tmp/aawf6_nohup.log 2>&1 & echo $! > /tmp/aawf6.pid
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
VAE_INIT=""
[ -f outputs/models/vae_pretrained/best/model_index.json ] && \
  VAE_INIT="--vae_init outputs/models/vae_pretrained/best"

STALL_MARK=/tmp/stall_killed
WD_LOG=/tmp/watchdog.log

left() { echo $(( DEADLINE_TS - $(date +%s) )); }

sync_artifacts() {
  for d in colorization inpainting denoising super_resolution; do
    src="outputs/models/$d"
    [ -d "$src" ] || continue
    cp "$src"/metrics_*.csv "$ART/" 2>/dev/null
    cp "$src"/training_*.log "$ART/" 2>/dev/null
  done
  cp outputs/evaluation_results.json "$ART/" 2>/dev/null
  [ -f "$OUT" ] && cp "$OUT" "$ART/perf_queue_r3.txt"
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
        echo "$(date -u) aawf6 watchdog: stage python $py frozen ${frozen}m, relay alive -> kill" >> "$WD_LOG"
        touch "$STALL_MARK"
        kill -9 "$py" 2>/dev/null
        frozen=0; last=""
      else
        echo "$(date -u) aawf6 watchdog: stage python $py frozen ${frozen}m, relay DOWN -> wait" >> "$WD_LOG"
        frozen=$((stall_min - 5))
      fi
    fi
  done
}

run_item() {
  # run_item <label> <min_budget_s> <max_s> <cmd...>; retry once on stall-kill
  local label="$1" need="$2" cap="$3"; shift 3
  local rem rc attempt
  for attempt in 1 2; do
    rem=$(left)
    if [ "$rem" -lt "$need" ]; then
      echo "--- skip $label: ${rem}s left (< ${need}s)" >> "$LOG"; return 1
    fi
    rm -f "$STALL_MARK"
    echo "--- $label start (aawf6 attempt $attempt) $(date) (left ${rem}s)" >> "$LOG"
    timeout $(( rem < cap ? rem : cap )) "$@" >> "$LOG" 2>&1
    rc=$?
    echo "--- $label exit=$rc (aawf6 attempt $attempt) $(date)" >> "$LOG"
    if [ "$rc" -ge 124 ] && [ -f "$STALL_MARK" ]; then
      echo "--- $label died to a stall-kill; retrying once" >> "$LOG"
      continue
    fi
    return $rc
  done
  return $rc
}

bench_item() {
  # skip iff a prior attempt SUCCEEDED (exit=0); timed-out/crashed retry
  local label="$1" need="$2"; shift 2
  local rem; rem=$(left)
  if [ "$rem" -lt "$need" ]; then
    echo "--- skip bench $label: ${rem}s left" >> "$OUT"; return
  fi
  if grep -q -- "--- $label exit=0" "$OUT" 2>/dev/null; then
    echo "--- $label already measured, skipping" >> "$OUT"; return
  fi
  rm -f "$STALL_MARK"
  echo "--- $label start $(date)" >> "$OUT"
  env "$@" timeout $(( rem < 2400 ? rem : 2400 )) python bench.py \
    2>"/tmp/aawf6_${label}.err" | tail -1 >> "$OUT"
  echo "--- $label exit=${PIPESTATUS[0]} $(date)" >> "$OUT"
}

# ---- wait for awf6 to release the chip -------------------------------
while true; do
  AWF6=$(cat /tmp/awf6.pid 2>/dev/null)
  if [ -z "${AWF6:-}" ] || ! kill -0 "$AWF6" 2>/dev/null; then break; fi
  [ "$(left)" -lt 900 ] && { echo "aawf6: deadline before awf6 finished" >> "$LOG"; exit 1; }
  sleep 120
done
echo "=== after-awf6 chain start $(date), left $(left)s ===" >> "$LOG"

watchdog $$ 25 &
WATCHDOG_PID=$!
trap 'kill $WATCHDOG_PID 2>/dev/null' EXIT

# ---- 1. resume colorize to the full 10-epoch reference recipe --------
COL_EPOCHS=$(tail -n +2 outputs/models/colorization/metrics_colorize.csv 2>/dev/null | wc -l)
if [ "${COL_EPOCHS:-0}" -lt 10 ] && \
   [ -d outputs/models/colorization/train_state ]; then
  run_item colorize_resume 1800 4500 python scripts/train_colorization.py \
    $TRAIN_ARGS $VAE_INIT
  COL_RC=$?
  commit_artifacts "workflow: colorize resumed to 10 epochs (aawf6)"
  # refresh colorize predictions + eval with the completed fine-tune
  if [ "$COL_RC" = "0" ] || [ -d outputs/models/colorization/best ]; then
    run_item predict_colorize_r 900 2400 python scripts/generate_predictions.py \
      --tasks colorize --split test
    run_item evaluate_r 600 2400 python scripts/evaluate_model.py --split test
    commit_artifacts "workflow: refreshed colorize predictions + evaluation (aawf6)"
  fi
fi

# ---- 2. re-offer anything the earlier chains skipped -----------------
CKPT=outputs/models/denoising/best
if [ -d "$CKPT" ] && ! grep -q -- "--- gate_combo exit=0" "$OUT" 2>/dev/null; then
  rem=$(left)
  if [ "$rem" -ge 1500 ]; then
    rm -f "$STALL_MARK"
    echo "--- gate_combo start $(date)" >> "$OUT"
    timeout $(( rem < 5400 ? rem : 5400 )) python -u \
      scripts/eval_quant_quality.py \
      --checkpoint "$CKPT" --size 512 --n 4 \
      --modes int8_static --cfg_cache 2 --tome 0.5 \
      >> "$OUT" 2>/tmp/aawf6_gate.err
    echo "--- gate_combo exit=$? $(date)" >> "$OUT"
    commit_artifacts "perf: fresh-checkpoint quality gate (aawf6)"
  fi
fi

bench_item bench_tome05 900 BENCH_TOME=0.5
bench_item bench_tome05_k2 800 BENCH_TOME=0.5 BENCH_CFG_CACHE=2
bench_item bench_turbo_k2 800 BENCH_CFG_CACHE=2
bench_item bench_turbo_k3 800 BENCH_CFG_CACHE=3
bench_item base_ctl 800 BENCH_DUMMY=1
bench_item fastq 800 \
  BENCH_XLA_OPTS=xla_tpu_experimental_allow_fast_quantization_conversions=true
bench_item vmem64m 800 BENCH_XLA_OPTS=xla_tpu_scoped_vmem_limit_kib=65536
bench_item autotune 800 BENCH_XLA_OPTS=xla_tpu_autotune_dots=true
bench_item convdc 800 \
  BENCH_XLA_OPTS=xla_tpu_allow_conv_input_fusion_with_downcast_convert=true
bench_item aggrfuse 800 \
  BENCH_XLA_OPTS=xla_tpu_enable_aggressive_loop_fusion_layout_opt=true
bench_item vmem32m 800 BENCH_XLA_OPTS=xla_tpu_scoped_vmem_limit_kib=32768
bench_item fcost 800 \
  BENCH_XLA_OPTS=xla_tpu_enable_experimental_fusion_cost_model=true

commit_artifacts "perf: after-awf6 queue results"
echo "=== after-awf6 chain done $(date) ===" >> "$LOG"
