#!/bin/bash
# Stage 6: chained after the post-workflow quality gates (stage 5) on the
# serial TPU queue — the round-3 throughput levers, in order of expected
# value (VERDICT r2 "next round" #3):
#   a) the armed XLA compiler-flag sweep (BENCH_XLA_OPTS mechanism)
#   b) turbo k=3 throughput point (k=2 measured 4.129; its quality gate
#      runs in stage 5 against the fresh workflow checkpoint)
# Respects DEADLINE_TS so the chip is free for the driver's round-end
# bench run.
set -u
OUT=${OUT:-/tmp/ab_results.txt}
DEADLINE_TS=${DEADLINE_TS:-$(( $(date +%s) + 14400 ))}
cd "$(dirname "$0")/.."

while ! grep -q "stage5 done" "$OUT" 2>/dev/null; do sleep 180; done

left() { echo $(( DEADLINE_TS - $(date +%s) )); }

echo "=== stage6 (flag sweep + turbo ladder) start $(date) ===" >> "$OUT"

run_cfg() {
  local label="$1" opts="$2" env_kv="${3:-}"
  local rem; rem=$(left)
  if [ "$rem" -lt 600 ]; then
    echo "--- skip $label: ${rem}s left" >> "$OUT"; return
  fi
  echo "--- s6 $label start $(date) (budget ${rem}s)" >> "$OUT"
  env BENCH_XLA_OPTS="$opts" $env_kv timeout $(( rem < 2700 ? rem : 2700 )) \
    python bench.py 2>"/tmp/s6_${label}.err" | tail -1 >> "$OUT"
  echo "--- s6 $label exit=${PIPESTATUS[0]} $(date)" >> "$OUT"
}

run_cfg base "" ""
run_cfg turbo_k3 "" "BENCH_CFG_CACHE=3"
run_cfg fastq_attn_x8 "xla_tpu_experimental_allow_fast_quantization_conversions=true" "IRET_ATTN_XLA_INT8_MIN=4096"
run_cfg fastq    "xla_tpu_experimental_allow_fast_quantization_conversions=true"
run_cfg convdc   "xla_tpu_allow_conv_input_fusion_with_downcast_convert=true"
run_cfg vmem64m  "xla_tpu_scoped_vmem_limit_kib=65536"
run_cfg autotune "xla_tpu_autotune_dots=true" ""
run_cfg vmem32m  "xla_tpu_scoped_vmem_limit_kib=32768"
run_cfg aggrfuse "xla_tpu_enable_aggressive_loop_fusion_layout_opt=true"
run_cfg fcost    "xla_tpu_enable_experimental_fusion_cost_model=true"

echo "=== stage6 done $(date) ===" >> "$OUT"
