#!/bin/bash
# Follow-on chain for leftover session time after workflow v6.
#
# v6's DEADLINE_TS was set by the previous session; its tail stages
# (retrains, final predictions/eval, quality gates, approximate-mode
# bench points, XLA flag sweep) get skipped when training runs long.
# This chain waits for v6 to finish, then runs exactly the stages v6
# skipped — same guards (skip when a "--- <label> exit=0" marker or the
# stage's output already exists), same serial-TPU discipline, same
# stall watchdog (the relay has twice dropped an in-flight response,
# leaving the jax client frozen forever while the relay itself is fine).
#
# Launch:  DEADLINE_TS=<unix seconds> nohup bash scripts/run_after_wf6.sh \
#            >/tmp/awf6_nohup.log 2>&1 & echo $! > /tmp/awf6.pid
set -u
LOG=${LOG:-/tmp/workflow.log}
OUT=${OUT:-/tmp/ab_results.txt}
GITLOCK=/tmp/git_workflow.lock
DEADLINE_TS=${DEADLINE_TS:?set DEADLINE_TS (unix seconds)}
cd "$(dirname "$0")/.."
ART=docs/artifacts/realrun_full
mkdir -p "$ART"

RETRAIN_ARGS="--batch_size 8 --gradient_accumulation_steps 1 \
  --optimizer adafactor --save_steps -1 --state_save_epochs -1"
VAE_INIT=""
[ -f outputs/models/vae_pretrained/best/model_index.json ] && \
  VAE_INIT="--vae_init outputs/models/vae_pretrained/best"

STALL_MARK=/tmp/stall_killed
WD_LOG=/tmp/watchdog.log

left() { echo $(( DEADLINE_TS - $(date +%s) )); }

sync_artifacts() {
  for pair in "colorization:colorize" "inpainting:inpaint"; do
    d="${pair%%:*}"; t="${pair##*:}"
    src="outputs/models/$d"
    [ -d "$src" ] || continue
    cp "$src"/metrics_*.csv "$ART/" 2>/dev/null
    cp "$src"/training_*.log "$ART/" 2>/dev/null
  done
  [ -f outputs/models/denoising/metrics_denoise.csv ] && \
    cp outputs/models/denoising/metrics_denoise.csv "$ART/metrics_denoise_run2.csv"
  [ -f outputs/models/denoising/training_denoise.log ] && \
    cp outputs/models/denoising/training_denoise.log "$ART/training_denoise_run2.log"
  [ -f outputs/models/super_resolution/metrics_sr_x4.csv ] && \
    cp outputs/models/super_resolution/metrics_sr_x4.csv "$ART/metrics_sr_x4_run2.csv"
  [ -f outputs/models/super_resolution/training_sr_x4.log ] && \
    cp outputs/models/super_resolution/training_sr_x4.log "$ART/training_sr_x4_run2.log"
  cp outputs/evaluation_results.json "$ART/" 2>/dev/null
  # perf evidence lives in /tmp; mirror it into the committed artifacts
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
        echo "$(date -u) awf6 watchdog: stage python $py frozen ${frozen}m, relay alive -> kill" >> "$WD_LOG"
        touch "$STALL_MARK"
        kill -9 "$py" 2>/dev/null
        frozen=0; last=""
      else
        echo "$(date -u) awf6 watchdog: stage python $py frozen ${frozen}m, relay DOWN -> wait" >> "$WD_LOG"
        frozen=$((stall_min - 5))
      fi
    fi
  done
}

stage_done() {  # a stage v6 (or this chain) already completed cleanly
  grep -q -- "--- $1 exit=0" "$LOG" 2>/dev/null
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
    echo "--- $label start (awf6 attempt $attempt) $(date) (left ${rem}s)" >> "$LOG"
    timeout $(( rem < cap ? rem : cap )) "$@" >> "$LOG" 2>&1
    rc=$?
    echo "--- $label exit=$rc (awf6 attempt $attempt) $(date)" >> "$LOG"
    if [ "$rc" -ge 124 ] && [ -f "$STALL_MARK" ]; then
      echo "--- $label died to a stall-kill; retrying once" >> "$LOG"
      continue
    fi
    return $rc
  done
  return $rc
}

bench_item() {
  # bench_item <label> <min_budget_s> <env k=v ...>; skip iff a prior
  # attempt SUCCEEDED (exit=0) — timed-out/crashed attempts retry.
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
    2>"/tmp/awf6_${label}.err" | tail -1 >> "$OUT"
  echo "--- $label exit=${PIPESTATUS[0]} $(date)" >> "$OUT"
}

# ---- wait for v6 to release the chip --------------------------------
while true; do
  grep -qE "reference workflow( v[0-9]+)? done" "$LOG" 2>/dev/null && break
  WF6=$(cat /tmp/wf6.pid 2>/dev/null)
  if [ -n "${WF6:-}" ] && ! kill -0 "$WF6" 2>/dev/null; then break; fi
  [ "$(left)" -lt 900 ] && { echo "awf6: deadline before v6 finished" >> "$LOG"; exit 1; }
  sleep 120
done
echo "=== after-wf6 chain start $(date), left $(left)s ===" >> "$LOG"
echo "=== after-wf6 chain start $(date) ===" >> "$OUT"

watchdog $$ 25 &
WATCHDOG_PID=$!
trap 'kill $WATCHDOG_PID 2>/dev/null' EXIT

# ---- 1. finish the reference workflow itself (highest value) --------
if ! stage_done predict_1; then
  run_item predict_1 1500 4200 python scripts/generate_predictions.py \
    --tasks colorize inpaint --split test
fi
if ! stage_done evaluate_1; then
  run_item evaluate_1 600 2400 python scripts/evaluate_model.py --split test
fi
commit_artifacts "workflow: predictions + evaluation (awf6)"

if ! stage_done retrain_denoise && [ ! -d outputs/models/denoising/best ]; then
  run_item retrain_denoise 2100 4200 python scripts/train_denoising.py \
    $RETRAIN_ARGS --num_epochs 4 $VAE_INIT
  commit_artifacts "workflow: denoise retrain (awf6)"
fi
if ! stage_done retrain_sr && [ ! -d outputs/models/super_resolution/best ]; then
  run_item retrain_sr 2100 4200 python scripts/train_super_resolution.py \
    $RETRAIN_ARGS --num_epochs 2 $VAE_INIT
  commit_artifacts "workflow: sr_x4 retrain (awf6)"
fi

if [ -d outputs/models/denoising/best ] && \
   [ -d outputs/models/super_resolution/best ] && ! stage_done predict_2; then
  run_item predict_2 2100 5400 python scripts/generate_predictions.py \
    --tasks denoise sr_x4 --split test
  run_item evaluate_2 600 2400 python scripts/evaluate_model.py --split test
  commit_artifacts "workflow: final predictions + evaluation, all tasks (awf6)"
fi

# ---- 2. quality gates on the fresh checkpoints -----------------------
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
      >> "$OUT" 2>/tmp/awf6_gate.err
    echo "--- gate_combo exit=$? $(date)" >> "$OUT"
    commit_artifacts "perf: fresh-checkpoint quality gate (awf6)"
  else
    echo "--- skip gate_combo: ${rem}s left" >> "$OUT"
  fi
fi

# ---- 3. approximate-mode throughput points ---------------------------
bench_item bench_tome05 900 BENCH_TOME=0.5
bench_item bench_tome05_k2 800 BENCH_TOME=0.5 BENCH_CFG_CACHE=2
bench_item bench_turbo_k2 800 BENCH_CFG_CACHE=2
bench_item bench_turbo_k3 800 BENCH_CFG_CACHE=3

# ---- 4. honest base control ------------------------------------------
bench_item base_ctl 800 BENCH_DUMMY=1

# ---- 5. XLA flag sweep (BENCH_XLA_OPTS; env XLA_FLAGS is fatal via relay)
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

# ---- 6. second-tier gates --------------------------------------------
if [ -d "$CKPT" ] && ! grep -q -- "--- gate_k3 exit=0" "$OUT" 2>/dev/null; then
  rem=$(left)
  if [ "$rem" -ge 1200 ]; then
    rm -f "$STALL_MARK"
    echo "--- gate_k3 start $(date)" >> "$OUT"
    timeout $(( rem < 3600 ? rem : 3600 )) python -u \
      scripts/eval_quant_quality.py \
      --checkpoint "$CKPT" --size 512 --n 4 --modes int8_static --cfg_cache 3 \
      >> "$OUT" 2>/tmp/awf6_gatek3.err
    echo "--- gate_k3 exit=$? $(date)" >> "$OUT"
  fi
fi

commit_artifacts "perf: after-wf6 queue results"
echo "=== after-wf6 chain done $(date) ===" >> "$OUT"
echo "=== after-wf6 chain done $(date) ===" >> "$LOG"
