#!/bin/bash
# Serial TPU bench queue (fresh VM, empty compile cache).
#   A) bench.py with default flags — validates the shipping path end-to-end
#      on the fresh VM and warms /tmp/jax_cache for the driver's round-end
#      bench run.
#   B..D) the top XLA-flag-sweep lines from scripts/run_flag_sweep.sh,
#      ordered by expected value (fastq+attn_x8 is the projected +0.4 img/s
#      that would cross the 8x bar if the fast-quantization flag restores
#      XLA's streaming-softmax fusion around the s8 QK matmul).
# Every stage is timeout-bounded; the whole queue respects DEADLINE_TS so
# the chip is free before the driver's round-end bench.
#
# MECHANISM NOTE: env XLA_FLAGS does NOT work through the axon relay — the
# client-side parse_flags_from_env fatals on TPU-backend flags. All flags go
# through bench.py's BENCH_XLA_OPTS (AOT compiler_options), like
# scripts/run_flag_sweep.sh.
set -u
OUT=${OUT:-/tmp/ab_results.txt}
DEADLINE_TS=${DEADLINE_TS:-$(( $(date +%s) + 2700 ))}
cd "$(dirname "$0")/.."

left() { echo $(( DEADLINE_TS - $(date +%s) )); }

run_cfg() {
  local label="$1" opts="$2" env_kv="$3"
  local rem; rem=$(left)
  if [ "$rem" -lt 300 ]; then
    echo "--- skip $label: ${rem}s left" >> "$OUT"; return
  fi
  echo "--- s9 $label start $(date) (budget ${rem}s)" >> "$OUT"
  env BENCH_XLA_OPTS="$opts" $env_kv timeout "$rem" python bench.py \
    2>"/tmp/s9_${label}.err" | tail -1 >> "$OUT"
  # tail's status is always 0; report python/timeout's actual exit
  echo "--- s9 $label exit=${PIPESTATUS[0]} $(date)" >> "$OUT"
}

echo "=== session9 queue start $(date) deadline=$DEADLINE_TS ===" >> "$OUT"
run_cfg base     "" ""
run_cfg fastq_attn_x8 "xla_tpu_experimental_allow_fast_quantization_conversions=true" "IRET_ATTN_XLA_INT8_MIN=4096"
run_cfg fastq    "xla_tpu_experimental_allow_fast_quantization_conversions=true" ""
run_cfg convdc   "xla_tpu_allow_conv_input_fusion_with_downcast_convert=true" ""
run_cfg vmem64m  "xla_tpu_scoped_vmem_limit_kib=65536" ""
echo "=== session9 queue done $(date) ===" >> "$OUT"
