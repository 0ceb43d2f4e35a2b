#!/bin/bash
# Stage 3: Pallas int8 conv kernel tile sweep at the real serving shapes
# (the level-0 resnet convs run at 150-227 TOPS on XLA's s8 emitter vs
# ~380 for peers; the kernel lost at default tiles — check the tile grid).
set -u
OUT=${OUT:-/tmp/ab_results.txt}
cd "$(dirname "$0")/.."

while ! grep -q "stage2 done" "$OUT" 2>/dev/null; do sleep 120; done

echo "=== stage3 start $(date) ===" >> "$OUT"
for tm in 256 512 1024; do
  for tn in 256 512; do
    echo "--- conv kernel tile_m=$tm tile_n=$tn" >> "$OUT"
    IRET_CONV_TILE_M=$tm IRET_CONV_TILE_N=$tn \
      timeout 2400 python scripts/bench_conv_int8.py --shapes unet \
      >> "$OUT" 2>/tmp/ab3_conv.err
  done
done
echo "=== stage3 sweep complete $(date) ===" >> "$OUT"

# Auto-pick the winning tile config from the sweep and A/B it end-to-end
# (kernel routed only at the heights where it beat XLA; ops/quant.py
# IRET_CONV_KERNEL_HW). Skipped if no config wins anywhere.
if CFG=$(python scripts/pick_conv_kernel_config.py "$OUT"); then
  echo "--- conv_kernel_e2e start ($(echo $CFG | tr '\n' ' ')) $(date)" >> "$OUT"
  line=$(env $CFG timeout 2400 python bench.py 2>/tmp/ab3_e2e.err | tail -1)
  echo "conv_kernel_e2e $line" >> "$OUT"
else
  echo "--- conv_kernel_e2e SKIPPED (kernel never beat XLA)" >> "$OUT"
fi

# VAE-decode shapes with the same kernel (125ms/call block; the decoder's
# 512px c128 stages ran at 56-85 TFLOP/s in bf16) — kernel-level only.
echo "--- conv kernel vae shapes" >> "$OUT"
timeout 2400 python scripts/bench_conv_int8.py --shapes vae \
  >> "$OUT" 2>>/tmp/ab3_conv.err

# Manual follow-up window: the reference-workflow runner (stage 4, ~5h of
# TPU) triggers on "stage3 done". Hold that sentinel for up to 100 min so
# a live session can run e2e benches with the sweep's winning tiles first
# (touch /tmp/stage4_go to release early; the deadline guarantees the
# workflow still runs unattended).
for _ in $(seq 100); do
  [ -f /tmp/stage4_go ] && break
  sleep 60
done
echo "=== stage3 done $(date) ===" >> "$OUT"
