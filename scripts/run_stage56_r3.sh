#!/bin/bash
# Round-3 post-workflow TPU queue (replaces the stage-5 + stage-6 pair):
# one priority-ordered, per-item deadline-aware chain, so the most
# valuable measurements land even if the workflow finishes late.
#
# Order of expected value (VERDICT r2 "next round" #3/#4):
#   1. quality gate on the fresh workflow checkpoint: int8_static (the
#      shipping mode), turbo k=2 (CFG cache), ToMe r=0.5 (token merge) —
#      one process so weights/compiles are shared
#   2. throughput points for the approximate modes: ToMe 0.5,
#      ToMe 0.5 + turbo k=2 (the >=8x candidate), turbo k=3
#   3. honest base re-run (sweep control; the driver's round-end bench
#      is also a base run)
#   4. XLA compiler-flag sweep (BENCH_XLA_OPTS mechanism — env XLA_FLAGS
#      is fatal through the axon relay, see bench.py:95-101)
#   5. second-tier gates: turbo k=3, SR-task int8
#
# Respects DEADLINE_TS so the chip is free for the driver's round-end
# bench run. TPU work stays strictly serial (CLAUDE.md).
set -u
OUT=${OUT:-/tmp/ab_results.txt}
LOG=${LOG:-/tmp/workflow.log}
DEADLINE_TS=${DEADLINE_TS:-$(( $(date +%s) + 14400 ))}
cd "$(dirname "$0")/.."

# match any workflow generation's completion marker (v4 wrote
# "reference workflow done", v5+ write "reference workflow vN done")
while ! grep -qE "reference workflow( v[0-9]+)? done" "$LOG" 2>/dev/null; do sleep 120; done

left() { echo $(( DEADLINE_TS - $(date +%s) )); }

echo "=== stage56_r3 (gates + tome/turbo points + flag sweep) start $(date) ===" >> "$OUT"

run_item() {
  # run_item <label> <min_budget_s> <cmd...>
  local label="$1" need="$2"; shift 2
  local rem; rem=$(left)
  if [ "$rem" -lt "$need" ]; then
    echo "--- skip $label: ${rem}s left (< ${need}s)" >> "$OUT"; return
  fi
  echo "--- $label start $(date) (budget ${rem}s)" >> "$OUT"
  timeout $(( rem < 5400 ? rem : 5400 )) "$@" >> "$OUT" 2>"/tmp/s56_${label}.err"
  echo "--- $label exit=$? $(date)" >> "$OUT"
}

bench_item() {
  # bench_item <label> <min_budget_s> <env k=v ...>
  local label="$1" need="$2"; shift 2
  local rem; rem=$(left)
  if [ "$rem" -lt "$need" ]; then
    echo "--- skip $label: ${rem}s left (< ${need}s)" >> "$OUT"; return
  fi
  echo "--- $label start $(date) (budget ${rem}s)" >> "$OUT"
  env "$@" timeout $(( rem < 2700 ? rem : 2700 )) python bench.py \
    2>"/tmp/s56_${label}.err" | tail -1 >> "$OUT"
  echo "--- $label exit=${PIPESTATUS[0]} $(date)" >> "$OUT"
}

CKPT=outputs/models/denoising/best
if [ -d "$CKPT" ]; then
  # 1. primary quality gate: bf16 ref + int8_static + turbo k2 + tome 0.5
  run_item gate_combo 1500 python -u scripts/eval_quant_quality.py \
    --checkpoint "$CKPT" --size 512 --n 4 --modes int8_static \
    --cfg_cache 2 --tome 0.5
else
  echo "--- no checkpoint at $CKPT; skipping gates" >> "$OUT"
fi

# 2. approximate-mode throughput points
bench_item bench_tome05 900 BENCH_TOME=0.5
bench_item bench_tome05_k2 700 BENCH_TOME=0.5 BENCH_CFG_CACHE=2
bench_item bench_turbo_k3 700 BENCH_CFG_CACHE=3

# 3. honest base (sweep control)
bench_item base 700 BENCH_DUMMY=1

# 4. flag sweep, ordered by expected value
bench_item fastq_attn_x8 700 \
  BENCH_XLA_OPTS=xla_tpu_experimental_allow_fast_quantization_conversions=true \
  IRET_ATTN_XLA_INT8_MIN=4096
bench_item fastq 700 \
  BENCH_XLA_OPTS=xla_tpu_experimental_allow_fast_quantization_conversions=true
bench_item convdc 700 \
  BENCH_XLA_OPTS=xla_tpu_allow_conv_input_fusion_with_downcast_convert=true
bench_item vmem64m 700 BENCH_XLA_OPTS=xla_tpu_scoped_vmem_limit_kib=65536
bench_item autotune 700 BENCH_XLA_OPTS=xla_tpu_autotune_dots=true
bench_item vmem32m 700 BENCH_XLA_OPTS=xla_tpu_scoped_vmem_limit_kib=32768
bench_item aggrfuse 700 \
  BENCH_XLA_OPTS=xla_tpu_enable_aggressive_loop_fusion_layout_opt=true
bench_item fcost 700 \
  BENCH_XLA_OPTS=xla_tpu_enable_experimental_fusion_cost_model=true

# 5. second-tier gates
if [ -d "$CKPT" ]; then
  run_item gate_k3 1200 python -u scripts/eval_quant_quality.py \
    --checkpoint "$CKPT" --size 512 --n 4 --modes int8_static --cfg_cache 3
fi
if [ -d outputs/models/super_resolution/best ]; then
  run_item gate_sr 1200 python -u scripts/eval_quant_quality.py \
    --checkpoint outputs/models/super_resolution/best --task sr_x4 \
    --pairs data/pairs/sr_x4/val --size 512 --n 4 --modes int8_static
fi

echo "=== stage56_r3 done $(date) ===" >> "$OUT"
