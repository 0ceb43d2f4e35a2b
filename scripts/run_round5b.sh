#!/bin/bash
# Round-5 follow-up chain: the wide tome gates + bench points that the
# main run_round5.sh chain skips if its deadline squeezes Stage C/D.
# Idempotent: gates skip if their /tmp/r5_gate_*.txt transcript already
# shows a completed bf16 reference line; bench points skip on a completed
# measurement in $OUT (same machinery as run_round5.sh).
set -u
LOG=${LOG:-/tmp/round5.log}
OUT=${OUT:-/tmp/ab_results_r5.txt}
GITLOCK=/tmp/git_workflow.lock
DEADLINE_TS=${DEADLINE_TS:?set DEADLINE_TS (unix seconds)}
cd "$(dirname "$0")/.."
ARTROOT=docs/artifacts

left() { echo $(( DEADLINE_TS - $(date +%s) )); }

commit_artifacts() {
  cp "$OUT" "$ARTROOT/perf_r5_bench_points.txt" 2>/dev/null
  for g in /tmp/r5_gate_*.txt; do
    [ -f "$g" ] && cp "$g" "$ARTROOT/" 2>/dev/null
  done
  (
    flock -w 120 9 || exit 0
    git add -A "$ARTROOT" >/dev/null 2>&1
    git commit -q -m "$1" -- "$ARTROOT" >/dev/null 2>&1 || true
  ) 9>"$GITLOCK"
}

run_item() {
  local label="$1" need="$2" cap="$3"; shift 3
  local rem; rem=$(left)
  if [ "$rem" -lt "$need" ]; then
    echo "--- skip $label: ${rem}s left (< ${need}s)" >> "$LOG"; return 1
  fi
  echo "--- $label start (5b) $(date) (left ${rem}s)" >> "$LOG"
  timeout $(( rem < cap ? rem : cap )) "$@" >> "$LOG" 2>&1
  echo "--- $label exit=$? (5b) $(date)" >> "$LOG"
}

gate() {
  local tag="$1" need="$2" cap="$3"; shift 3
  if grep -q "bf16        vs gt" "/tmp/r5_gate_$tag.txt" 2>/dev/null; then
    echo "--- gate $tag already done, skipping (5b)" >> "$LOG"; return
  fi
  run_item gate_$tag "$need" "$cap" sh -c \
    "python -u scripts/eval_quant_quality.py $* | tee /tmp/r5_gate_$tag.txt"
}

bench_item() {
  local label="$1" need="$2"; shift 2
  local rem; rem=$(left)
  if [ "$rem" -lt "$need" ]; then
    echo "--- skip bench $label: ${rem}s left" >> "$OUT"; return
  fi
  if grep -q "^--- $label exit=0" "$OUT" 2>/dev/null; then
    echo "--- $label already measured, skipping" >> "$OUT"; return
  fi
  if ! grep -q "^--- prewarm_$label done" "$OUT" 2>/dev/null; then
    echo "--- prewarm_$label start $(date)" >> "$OUT"
    env "$@" BENCH_ITERS=1 timeout $(( rem < 3000 ? rem : 3000 )) \
      python bench.py >/dev/null 2>"/tmp/r5_${label}_warm.err" \
      && echo "--- prewarm_$label done $(date)" >> "$OUT" \
      || echo "--- prewarm_$label FAILED rc=$? $(date)" >> "$OUT"
    rem=$(left)
    [ "$rem" -lt "$need" ] && { echo "--- skip bench $label post-warm" >> "$OUT"; return; }
  fi
  echo "--- $label start $(date)" >> "$OUT"
  env "$@" timeout $(( rem < 2400 ? rem : 2400 )) python bench.py \
    2>"/tmp/r5_${label}.err" | tail -1 >> "$OUT"
  echo "--- $label exit=${PIPESTATUS[0]} $(date)" >> "$OUT"
}

echo "=== round5b follow-up start $(date), deadline in $(left)s ===" >> "$LOG"

# wide tome gates first (VERDICT r4 #2) — denoise is the headliner
if [ -d outputs/models/denoising/best ]; then
  gate denoise_s05 1800 7200 "--checkpoint outputs/models/denoising/best \
    --size 512 --n 32 --batch 8 --modes int8_static --tome 0.5 --cfg_cache 2"
fi
if [ -d outputs/models/super_resolution/best ]; then
  gate sr_def 1500 7200 "--checkpoint outputs/models/super_resolution/best \
    --task sr_x4 --pairs data/pairs/sr_x4/val --size 512 --n 32 --batch 8 \
    --modes int8_static --tome 0.5"
fi
commit_artifacts "round5b: first wide gates"
if [ -d outputs/models/denoising/best ]; then
  gate denoise_s035 1500 7200 "--checkpoint outputs/models/denoising/best \
    --size 512 --n 32 --batch 8 --strength 0.35 --modes int8_static --tome 0.5"
fi
if [ -d outputs/models/colorization/best ]; then
  gate colorize_def 1200 5400 "--checkpoint outputs/models/colorization/best \
    --task colorize --pairs data/pairs/colorize/val --size 256 --n 32 \
    --batch 8 --modes int8_static --tome 0.5"
fi
if [ -d outputs/models/inpainting/best ]; then
  gate inpaint_def 1200 5400 "--checkpoint outputs/models/inpainting/best \
    --task inpaint --pairs data/pairs/inpaint/val --size 256 --n 32 \
    --batch 8 --modes '' --tome 0.5"
fi
if [ -d outputs/models/super_resolution/best ]; then
  gate sr_s06 1200 5400 "--checkpoint outputs/models/super_resolution/best \
    --task sr_x4 --pairs data/pairs/sr_x4/val --size 512 --n 32 --batch 8 \
    --strength 0.6 --modes int8_static --tome 0.5"
fi
commit_artifacts "round5b: wide tome gates"

bench_item exact_ctl 900
bench_item tome05 900 BENCH_TOME=0.5
bench_item tome05_k2 800 BENCH_TOME=0.5 BENCH_CFG_CACHE=2
bench_item turbo_k3 800 BENCH_CFG_CACHE=3
bench_item autotune 800 BENCH_XLA_OPTS=xla_tpu_autotune_dots=true
bench_item aggrfuse 800 \
  BENCH_XLA_OPTS=xla_tpu_enable_aggressive_loop_fusion_layout_opt=true
commit_artifacts "round5b: bench points"

if [ -d outputs/models/denoising/best ]; then
  gate k3 1000 3600 "--checkpoint outputs/models/denoising/best --size 512 \
    --n 8 --batch 8 --modes int8_static --cfg_cache 3"
fi
commit_artifacts "round5b: final follow-up artifacts"
echo "=== round5b follow-up done $(date) ===" >> "$LOG"
