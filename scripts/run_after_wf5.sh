#!/bin/bash
# Follow-on perf queue for leftover session time after workflow v5.
# Launch manually once /tmp/workflow.log shows "reference workflow v5
# done"; runs the items v5's deadline skipped, highest value first.
# Same serial-TPU discipline: one process at a time.
set -u
OUT=${OUT:-/tmp/ab_results.txt}
DEADLINE_TS=${DEADLINE_TS:?set DEADLINE_TS (unix seconds)}
cd "$(dirname "$0")/.."

left() { echo $(( DEADLINE_TS - $(date +%s) )); }

bench_item() {
  local label="$1" need="$2"; shift 2
  local rem; rem=$(left)
  if [ "$rem" -lt "$need" ]; then
    echo "--- skip bench $label: ${rem}s left" >> "$OUT"; return
  fi
  # skip anything v5 already measured SUCCESSFULLY (exit=0 means bench.py
  # printed its result line; a bare start marker from a timed-out/crashed
  # attempt must NOT count as measured — retrying those is this script's
  # whole purpose)
  if grep -q "^--- $label exit=0" "$OUT" 2>/dev/null; then
    echo "--- $label already measured, skipping" >> "$OUT"; return
  fi
  echo "--- $label start $(date)" >> "$OUT"
  env "$@" timeout $(( rem < 2400 ? rem : 2400 )) python bench.py \
    2>"/tmp/s5b_${label}.err" | tail -1 >> "$OUT"
  echo "--- $label exit=${PIPESTATUS[0]} $(date)" >> "$OUT"
}

echo "=== after-wf5 perf queue start $(date) ===" >> "$OUT"

# gate on the freshest checkpoint if v5 never ran it
if [ -d outputs/models/denoising/best ] \
   && ! grep -q "gate_combo start" "$OUT" 2>/dev/null; then
  rem=$(left)
  if [ "$rem" -ge 1500 ]; then
    echo "--- gate_combo start $(date)" >> "$OUT"
    timeout $(( rem < 5400 ? rem : 5400 )) python -u \
      scripts/eval_quant_quality.py \
      --checkpoint outputs/models/denoising/best --size 512 --n 4 \
      --modes int8_static --cfg_cache 2 --tome 0.5 \
      >> "$OUT" 2>/tmp/s5b_gate.err
    echo "--- gate_combo exit=$? $(date)" >> "$OUT"
  fi
fi

bench_item bench_tome05 900 BENCH_TOME=0.5
bench_item bench_tome05_k2 800 BENCH_TOME=0.5 BENCH_CFG_CACHE=2
bench_item bench_turbo_k3 800 BENCH_CFG_CACHE=3
bench_item base_ctl 800 BENCH_DUMMY=1
bench_item bench_batch12 800 BENCH_BATCH=12
bench_item fastq 800 \
  BENCH_XLA_OPTS=xla_tpu_experimental_allow_fast_quantization_conversions=true
bench_item vmem64m 800 BENCH_XLA_OPTS=xla_tpu_scoped_vmem_limit_kib=65536
bench_item autotune 800 BENCH_XLA_OPTS=xla_tpu_autotune_dots=true
bench_item aggrfuse 800 \
  BENCH_XLA_OPTS=xla_tpu_enable_aggressive_loop_fusion_layout_opt=true

echo "=== after-wf5 perf queue done $(date) ===" >> "$OUT"
