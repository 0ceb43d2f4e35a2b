#!/bin/bash
# XLA/libtpu compiler-flag sweep over the headline serving bench
# (int8_static, batch 8, 512px, 20 steps). Flags picked from
# `strings libtpu.so`: int8 quantize-conversion fusion, conv input fusion
# with downcast converts, scoped-vmem sizing, autotuning, fusion cost model.
#
# MECHANISM NOTE: env XLA_FLAGS does NOT work through the axon relay — the
# client-side parse_flags_from_env fatals on TPU-backend flags (the client
# binary doesn't link libtpu). bench.py's BENCH_XLA_OPTS instead forwards
# the options via AOT .lower().compile(compiler_options=...), which the
# remote compiler validates and applies (probe-verified).
#
# Each config is a fresh compile (options key the compilation cache) —
# budget ~15-30 min per line through the remote compiler.
#
# Usage: bash scripts/run_flag_sweep.sh [results_file]
set -u
OUT=${1:-/tmp/ab_results.txt}
cd "$(dirname "$0")/.."

echo "=== xla flag sweep (compiler_options) start $(date) ===" >> "$OUT"

run_cfg() {
  local label="$1" opts="$2" extra="${3:-}"
  echo "--- flags $label: $opts $extra" >> "$OUT"
  env BENCH_XLA_OPTS="$opts" $extra timeout 2700 python bench.py \
    2>"/tmp/flag_${label}.err" | tail -1 >> "$OUT"
  # tail's status is always 0; report python/timeout's actual exit
  echo "--- flags $label exit=${PIPESTATUS[0]} $(date)" >> "$OUT"
}

# Ordered by expected value (time may cut the tail short).

# 1) s8-QK attention beat bf16 STANDALONE at N=4096 (7.94 vs 8.67ms) but
# lost 58% in-program: the quantize converts break XLA's streaming-softmax
# pattern-match. If fast quantization conversions restore the fusion, the
# combination is the projected ~+0.4 img/s that crosses the 8x bar.
run_cfg fastq_attn_x8 \
  "xla_tpu_experimental_allow_fast_quantization_conversions=true" \
  "IRET_ATTN_XLA_INT8_MIN=4096"

run_cfg fastq    "xla_tpu_experimental_allow_fast_quantization_conversions=true"
run_cfg convdc   "xla_tpu_allow_conv_input_fusion_with_downcast_convert=true"
run_cfg vmem32m  "xla_tpu_scoped_vmem_limit_kib=32768"
run_cfg autotune "xla_tpu_autotune_dots=true,xla_tpu_autotune_fusions=true"
run_cfg vmem64m  "xla_tpu_scoped_vmem_limit_kib=65536"
run_cfg aggrfuse "xla_tpu_enable_aggressive_loop_fusion_layout_opt=true"
run_cfg fcost    "xla_tpu_enable_experimental_fusion_cost_model=true"

echo "=== xla flag sweep done $(date) ===" >> "$OUT"
