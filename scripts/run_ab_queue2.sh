#!/bin/bash
# Stage 2 of the serial A/B queue: quality gates + kernel sweep. Waits for
# stage 1 (run_ab_queue.sh) to finish so TPU work stays strictly serial.
set -u
OUT=${OUT:-/tmp/ab_results.txt}
cd "$(dirname "$0")/.."

while ! grep -q "ab queue done" "$OUT" 2>/dev/null; do sleep 120; done

echo "=== stage2 start $(date) ===" >> "$OUT"

# Quality gate for the quantized N=4096 attention (approximate mode):
# must run at 512px so the sites the serving loop quantizes are the ones
# being gated. Reports int8-vs-bf16 output PSNR/SSIM + gt-metric deltas.
echo "--- gate attn_x8_pv 512px" >> "$OUT"
timeout 3000 python scripts/eval_quant_quality.py \
  --size 512 --n 4 --modes int8_static --attn_int8_min 4096 \
  >> "$OUT" 2>/tmp/ab2_gate_attn.err

# Quality gate for turbo k=2 (uncond CFG branch reuse)
echo "--- gate turbo_k2" >> "$OUT"
timeout 3000 python scripts/eval_quant_quality.py \
  --size 512 --n 4 --modes int8_static --cfg_cache 2 \
  >> "$OUT" 2>/tmp/ab2_gate_turbo.err

# Attention ladder sweep (kernel-level timings across the SD 512px sites)
echo "--- attn sweep" >> "$OUT"
ATTN_SWEEP=1 timeout 3000 python scripts/bench_attn.py \
  >> "$OUT" 2>/tmp/ab2_sweep.err

echo "=== stage2 done $(date) ===" >> "$OUT"
