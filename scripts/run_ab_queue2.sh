#!/bin/bash
# Stage 2 of the serial A/B queue: quality gates + kernel sweep. Waits for
# stage 1 (run_ab_queue.sh) to finish so TPU work stays strictly serial.
set -u
OUT=${OUT:-/tmp/ab_results.txt}
cd "$(dirname "$0")/.."

while ! grep -q "ab queue done" "$OUT" 2>/dev/null; do sleep 120; done

echo "=== stage2 start $(date) ===" >> "$OUT"

# (The planned quantized-attention quality gate was dropped: stage 1
# measured IRET_ATTN_XLA_INT8_MIN=4096 at 1.66 img/s vs 3.99 baseline —
# quantize ops break XLA's streaming-softmax pattern, so the [16,8,4096,
# 4096] score tensor materializes. Perf-dead; no point gating quality.)

# Quality gate for turbo k=2 (uncond CFG branch reuse). Needs trained
# weights; the realrun checkpoint was wiped with the VM (untracked 4GB) —
# if absent, the gate re-runs post-workflow against the fresh checkpoint
# (scripts/run_post_workflow.sh).
if [ -d outputs/models/denoising_realrun/best ]; then
  echo "--- gate turbo_k2" >> "$OUT"
  timeout 3000 python scripts/eval_quant_quality.py \
    --size 512 --n 4 --modes int8_static --cfg_cache 2 \
    >> "$OUT" 2>/tmp/ab2_gate_turbo.err
else
  echo "--- gate turbo_k2 SKIPPED (no checkpoint; deferred to post-workflow)" >> "$OUT"
fi

# Attention ladder sweep (kernel-level timings across the SD 512px sites)
echo "--- attn sweep" >> "$OUT"
ATTN_SWEEP=1 timeout 3000 python scripts/bench_attn.py \
  >> "$OUT" 2>/tmp/ab2_sweep.err

echo "=== stage2 done $(date) ===" >> "$OUT"
