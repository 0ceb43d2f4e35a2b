#!/bin/bash
# Stage 5: post-workflow quality gates, run against the fresh trained
# checkpoint the reference-workflow stage just produced (the previous
# realrun checkpoint was untracked and wiped with the VM).
#
# Gates (scripts/eval_quant_quality.py, real val pairs, 512px):
#   - int8_static vs bf16 (the shipping serving mode)
#   - turbo k=2 (opt-in approximate CFG-cache mode)
set -u
OUT=${OUT:-/tmp/ab_results.txt}
LOG=${LOG:-/tmp/workflow.log}
cd "$(dirname "$0")/.."

while ! grep -q "reference workflow done" "$LOG" 2>/dev/null; do sleep 180; done

echo "=== stage5 (post-workflow gates) start $(date) ===" >> "$OUT"

CKPT=outputs/models/denoising/best
if [ ! -d "$CKPT" ]; then
  echo "stage5: no checkpoint at $CKPT — skipping gates" >> "$OUT"
  exit 0
fi

echo "--- gate int8_static + turbo_k2 @512px (fresh checkpoint)" >> "$OUT"
timeout 4000 python scripts/eval_quant_quality.py \
  --checkpoint "$CKPT" --size 512 --n 4 --modes int8_static --cfg_cache 2 \
  >> "$OUT" 2>/tmp/ab5_gate.err

# turbo k=3 ladder point (stage-1 measured k=2 at 4.129 img/s; gate the
# next rung so the serving guide can state its quality cost too)
echo "--- gate turbo_k3 @512px" >> "$OUT"
timeout 4000 python scripts/eval_quant_quality.py \
  --checkpoint "$CKPT" --size 512 --n 4 --modes int8_static --cfg_cache 3 \
  >> "$OUT" 2>/tmp/ab5_gate_k3.err

# breadth: int8 gate on a second task family (SR's 25-step/gs-3.5 recipe)
if [ -d outputs/models/super_resolution/best ]; then
  echo "--- gate int8_static sr_x4 @512px" >> "$OUT"
  timeout 4000 python scripts/eval_quant_quality.py \
    --checkpoint outputs/models/super_resolution/best --task sr_x4 \
    --pairs data/pairs/sr_x4/val --size 512 --n 4 --modes int8_static \
    >> "$OUT" 2>/tmp/ab5_gate_sr.err
fi

echo "=== stage5 done $(date) ===" >> "$OUT"
