#!/bin/bash
# Round-5 chain (VERDICT r4 "Next round" #1, #2, #4, #5, #6).
#
# One priority-ordered, deadline-aware, strictly-serial TPU queue (the
# relay wedges under concurrency) reusing the proven round-4 machinery
# (stall watchdog, periodic evidence commits, per-stage budgets), with
# the two round-4 chain bugs fixed (VERDICT #5):
#   - commit_artifacts uses the PARENT docs/artifacts pathspec (an empty
#     subdir made git commit error, silently eaten by `|| true`)
#   - every first-measurement bench slot is preceded by an untimed
#     prewarm run so a cold remote-compile can never eat the measurement
#     (round-4 lost 40 min + the tome point to exactly that)
#
# Order (why): VERDICT #1 (hard-family full-scale measured restoration)
# first — it has the longest dependency chain (VAE probe -> VAE continue
# -> 860M UNet resume -> sweep -> eval) and is the round's top ask. The
# round-5 probe showed the mixed VAE (24.5 dB recon) caps any serve below
# the 16.3 dB do-nothing baseline, so the VAE continue stage is the
# gating lever. Then VERDICT #4 (full 10-epoch retrains so the committed
# eval serves checkpoints matching committed curves), then the 4-task
# predictions + paired-stats eval, then VERDICT #2 (wide n>=32 ToMe gate
# across tasks/strengths), then benches + VERDICT #6 second-tier points.
set -u
LOG=${LOG:-/tmp/round5.log}
OUT=${OUT:-/tmp/ab_results_r5.txt}
GITLOCK=/tmp/git_workflow.lock
DEADLINE_TS=${DEADLINE_TS:?set DEADLINE_TS (unix seconds)}
cd "$(dirname "$0")/.."
ARTROOT=docs/artifacts
ART=$ARTROOT/realrun_full
ART_HARD=$ARTROOT/realrun_hard_r5
mkdir -p "$ART" "$ART_HARD"

VAE_INIT="--vae_init outputs/models/vae_pretrained/best"
RETRAIN_ARGS="--batch_size 8 --gradient_accumulation_steps 1 \
  --optimizer adafactor --save_steps -1 --state_save_epochs 5 \
  --num_epochs 10 --resume"

STALL_MARK=/tmp/stall_killed
WD_LOG=/tmp/watchdog_r5.log

left() { echo $(( DEADLINE_TS - $(date +%s) )); }

state() {
  printf '{"stage": "%s", "round": 5, "ts": "%s", "deadline_left_s": %s}\n' \
    "$1" "$(date -u +%FT%TZ)" "$(left)" > "$ART/workflow_state.json"
}

sync_artifacts() {
  # round-5 full-retrain curves land under _run3 names (run1 = committed
  # 10-ep curves, run2 = the r4 reset-recovery restores)
  for p in "denoising:denoise:_run3" "super_resolution:sr_x4:_run3" \
           "inpainting:inpaint:_run3" "colorization:colorize:_run4"; do
    d="${p%%:*}"; r="${p##*:}"; t="${p#*:}"; t="${t%%:*}"
    for src in "outputs/models_r5/$d" "outputs/models/$d"; do
      [ -f "$src/metrics_${t}.csv" ] || continue
      cp "$src/metrics_${t}.csv" "$ART/metrics_${t}${r}.csv" 2>/dev/null
      cp "$src/training_${t}.log" "$ART/training_${t}${r}.log" 2>/dev/null
      break
    done
  done
  cp outputs/evaluation_results.json "$ART/" 2>/dev/null
  # hard-family round-5 artifacts
  cp outputs/models_hard/vae_mixed_v2/metrics_vae.csv \
    "$ART_HARD/metrics_vae_mixed_v2.csv" 2>/dev/null
  for src in outputs/models_hard_r5/denoising; do
    cp "$src"/metrics_*.csv "$ART_HARD/" 2>/dev/null
    cp "$src"/training_*.log "$ART_HARD/" 2>/dev/null
    if [ -d "$src/val_samples" ]; then
      mkdir -p "$ART_HARD/val_samples"
      ls "$src/val_samples/" | sort -V | sed -n '1p;$p' | while read -r f; do
        cp "$src/val_samples/$f" "$ART_HARD/val_samples/" 2>/dev/null
      done
    fi
  done
  cp outputs/evaluation_results_hard.json "$ART_HARD/" 2>/dev/null
  cp outputs/pred_hard_sweep_r5/eval_*.json "$ART_HARD/" 2>/dev/null
  cp /tmp/probe_vae_*.json "$ART_HARD/" 2>/dev/null
  cp "$OUT" "$ARTROOT/perf_r5_bench_points.txt" 2>/dev/null
  for g in /tmp/r5_gate_*.txt; do
    [ -f "$g" ] && cp "$g" "$ARTROOT/" 2>/dev/null
  done
  return 0
}

commit_artifacts() {
  sync_artifacts
  (
    flock -w 120 9 || exit 0
    # parent-dir pathspec: always exists, so git never errors on an
    # empty/new artifact subdir (round-4 chain bug, VERDICT #5)
    git add -A "$ARTROOT" >/dev/null 2>&1
    git commit -q -m "$1" -- "$ARTROOT" >/dev/null 2>&1 || true
  ) 9>"$GITLOCK"
}

poller() {
  while [ -f /tmp/workflow_poller_r5.on ]; do
    sleep 300
    commit_artifacts "workflow r5: periodic evidence sync"
  done
}

probe_tpu() {
  timeout 240 python - >/dev/null 2>&1 <<'EOF'
import jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
assert float(jnp.sum(jnp.ones((8, 8)))) == 64.0
EOF
}

watchdog() {
  local chain_pid=$1 stall_min=${2:-25}
  local last="" frozen=0 t py io
  while kill -0 "$chain_pid" 2>/dev/null; do
    sleep 60
    py=""
    for t in $(ps --ppid "$chain_pid" -o pid= -o comm= \
               | awk '$2=="timeout"{print $1}'); do
      py=$(ps --ppid "$t" -o pid= -o comm= | awk '$2~/^python/{print $1; exit}')
      [ -n "$py" ] && break
    done
    if [ -z "$py" ]; then last=""; frozen=0; continue; fi
    io=$(awk -F': ' '/^(rchar|wchar)/{s+=$2} END{print s}' /proc/"$py"/io 2>/dev/null)
    [ -z "$io" ] && continue
    if [ "$io" = "$last" ]; then
      frozen=$((frozen + 1))
    else
      frozen=0; last="$io"
    fi
    if [ "$frozen" -ge "$stall_min" ]; then
      if probe_tpu; then
        echo "$(date -u) watchdog: stage python $py frozen ${frozen}m, relay alive -> kill" >> "$WD_LOG"
        touch "$STALL_MARK"
        kill -9 "$py" 2>/dev/null
        frozen=0; last=""
      else
        echo "$(date -u) watchdog: stage python $py frozen ${frozen}m, relay DOWN -> wait" >> "$WD_LOG"
        frozen=$((stall_min - 5))
      fi
    fi
  done
}

run_item() {
  # run_item <label> <min_budget_s> <max_s> <cmd...>
  local label="$1" need="$2" cap="$3"; shift 3
  local rem rc attempt
  for attempt in 1 2; do
    rem=$(left)
    if [ "$rem" -lt "$need" ]; then
      echo "--- skip $label: ${rem}s left (< ${need}s)" >> "$LOG"; return 1
    fi
    rm -f "$STALL_MARK"
    echo "--- $label start (attempt $attempt) $(date) (left ${rem}s)" >> "$LOG"
    state "$label"
    timeout $(( rem < cap ? rem : cap )) "$@" >> "$LOG" 2>&1
    rc=$?
    echo "--- $label exit=$rc (attempt $attempt) $(date)" >> "$LOG"
    if [ "$rc" -ge 124 ] && [ -f "$STALL_MARK" ]; then
      echo "--- $label died to a stall-kill; retrying once" >> "$LOG"
      continue
    fi
    return $rc
  done
  return $rc
}

bench_item() {
  # bench_item <label> <min_budget_s> <env k=v ...>
  # The first run of a label is an UNTIMED prewarm (result discarded,
  # BENCH_ITERS=1) so remote compiles land in /tmp/jax_cache; the timed
  # measurement then runs on a warm cache (VERDICT r4 #5 fix).
  local label="$1" need="$2"; shift 2
  local rem; rem=$(left)
  if [ "$rem" -lt "$need" ]; then
    echo "--- skip bench $label: ${rem}s left" >> "$OUT"; return
  fi
  if grep -q "^--- $label exit=0" "$OUT" 2>/dev/null; then
    echo "--- $label already measured, skipping" >> "$OUT"; return
  fi
  rm -f "$STALL_MARK"
  if ! grep -q "^--- prewarm_$label done" "$OUT" 2>/dev/null; then
    echo "--- prewarm_$label start $(date)" >> "$OUT"
    state "prewarm_$label"
    env "$@" BENCH_ITERS=1 timeout $(( rem < 3000 ? rem : 3000 )) \
      python bench.py >/dev/null 2>"/tmp/r5_${label}_warm.err" \
      && echo "--- prewarm_$label done $(date)" >> "$OUT" \
      || echo "--- prewarm_$label FAILED rc=$? $(date)" >> "$OUT"
    rem=$(left)
    if [ "$rem" -lt "$need" ]; then
      echo "--- skip bench $label post-warm: ${rem}s left" >> "$OUT"; return
    fi
  fi
  echo "--- $label start $(date)" >> "$OUT"
  state "bench_$label"
  env "$@" timeout $(( rem < 2400 ? rem : 2400 )) python bench.py \
    2>"/tmp/r5_${label}.err" | tail -1 >> "$OUT"
  echo "--- $label exit=${PIPESTATUS[0]} $(date)" >> "$OUT"
}

echo "=== round5 chain start $(date), deadline in $(left)s ===" >> "$LOG"
state "start"
touch /tmp/workflow_poller_r5.on
poller &
POLLER_PID=$!
watchdog $$ 25 &
WATCHDOG_PID=$!

while [ "$(left)" -gt 3600 ]; do
  if probe_tpu; then
    echo "--- relay probe ok $(date)" >> "$LOG"; break
  fi
  echo "--- relay probe failed, waiting $(date)" >> "$LOG"
  sleep 180
done

# ---- 0. data self-heal (outputs/ and data/ survived this round, but a
#         mid-round VM bounce would wipe the gitignored pairs)
if [ ! -d data/pairs/denoise/train/input ]; then
  state "datagen"
  (python scripts/make_procedural_clean.py --out_root data/clean \
    && python scripts/make_synthetic_pairs.py --clean_root data/clean \
      --out_root data/pairs) >> /tmp/datagen_r5.log 2>&1 \
    || { echo "--- FATAL: datagen failed" >> "$LOG"; exit 1; }
fi
# =====================================================================
# Stage A: REBUILD the VAEs with verified saves. Round-5 root-cause
# finding: every round-2..4 best/final checkpoint was silently corrupted
# at save time (relay returned stale near-init buffers on the host fetch;
# live device training was fine — e.g. vae_pretrained stamped 31.7 dB
# val PSNR but reloads at 9.0 dB). core/checkpoint.py now verifies every
# fetch against device-side checksums, and this chain retrains everything
# that matters from scratch through the verified path. Probe-gated so a
# chain restart never redoes a good rebuild.
# =====================================================================
probe_rt() {  # probe_rt <checkpoint> <pairs> <out.json>; echoes rt_gt_vs_gt
  run_item "probe_$(basename "$3" .json)" 300 2400 sh -c \
    "python scripts/probe_vae_roundtrip.py --checkpoint '$1' \
       --pairs '$2' --n 16 | tail -1 > '$3'" >/dev/null 2>&1
  python -c "import json;print(json.load(open('$3'))['rt_gt_vs_gt'])" 2>/dev/null || echo 0
}

# ---- A0. main (clean-family) VAE: required by every Stage-B retrain
RT_MAIN=$(probe_rt outputs/models/vae_pretrained/best data/pairs/denoise/val /tmp/probe_vae_main.json)
echo "--- main VAE rt_gt_vs_gt: $RT_MAIN" >> "$LOG"
if python -c "exit(0 if float('$RT_MAIN' or 0) < 22.0 else 1)"; then
  run_item vae_pretrain_rebuild 2400 7200 python scripts/pretrain_vae.py \
    --num_epochs 8 --output_dir outputs/models/vae_pretrained_v2
  if [ -f outputs/models/vae_pretrained_v2/best/model_index.json ]; then
    rm -rf outputs/models/vae_pretrained_corrupt_r4
    mv outputs/models/vae_pretrained outputs/models/vae_pretrained_corrupt_r4 2>/dev/null
    mv outputs/models/vae_pretrained_v2 outputs/models/vae_pretrained
  fi
  RT_MAIN=$(probe_rt outputs/models/vae_pretrained/best data/pairs/denoise/val /tmp/probe_vae_main_after.json)
  echo "--- rebuilt main VAE rt_gt_vs_gt: $RT_MAIN" >> "$LOG"
  # a corrupt/random frozen VAE would commit decode-noise metrics as round
  # artifacts (ADVICE r4 #3): fail the chain loudly instead
  python -c "exit(0 if float('$RT_MAIN' or 0) >= 22.0 else 1)" \
    || { echo "--- FATAL: rebuilt main VAE still bad ($RT_MAIN)" >> "$LOG"; exit 1; }
fi

# ---- A1. hard-family mixed VAE rebuild (same corruption)
VAE_HARD=outputs/models_hard/vae_mixed_v2/best
RT_HARD=$(probe_rt outputs/models_hard/vae_mixed_v2/best data/pairs_hard/denoise/val /tmp/probe_vae_hard.json)
echo "--- hard mixed VAE rt_gt_vs_gt: $RT_HARD" >> "$LOG"
if python -c "exit(0 if float('$RT_HARD' or 0) < 20.0 else 1)"; then
  run_item vae_mixed_rebuild 2400 7200 python scripts/pretrain_vae.py \
    --data_root data/vae_mixed_hard --num_epochs 12 \
    --output_dir outputs/models_hard/vae_mixed_v2
  RT_HARD=$(probe_rt outputs/models_hard/vae_mixed_v2/best data/pairs_hard/denoise/val /tmp/probe_vae_hard_after.json)
  echo "--- rebuilt hard VAE rt_gt_vs_gt: $RT_HARD" >> "$LOG"
fi
[ -f "$VAE_HARD/model_index.json" ] || VAE_HARD=outputs/models/vae_pretrained/best
echo "--- hard-family frozen VAE: $VAE_HARD" >> "$LOG"
commit_artifacts "round5: verified VAE rebuilds (main + hard mixed)"

# ---- A3. hard-family 860M UNet from scratch against the verified VAE
#          (the r4 checkpoint is corrupt — init_from it would be ~random
#          init with extra steps)
if [ ! -f outputs/models_hard_r5/denoising/final/model_index.json ]; then
  run_item train_hard_r5 4200 12600 python scripts/train_denoising.py \
    --data_root data/pairs_hard --output_dir outputs/models_hard_r5/denoising \
    --vae_init "$VAE_HARD" \
    --num_epochs 16 --batch_size 8 --gradient_accumulation_steps 1 \
    --optimizer adafactor --save_steps -1 --state_save_epochs 5 --resume
fi
commit_artifacts "round5: hard-family 860M UNet trained vs verified VAE"

# ---- A4. serving sweep on val (16 imgs): strength x guidance grid.
#          gs=1 disables CFG (fidelity mode); low strengths lean on the
#          VAE+light UNet polish, higher ones on generation.
if [ -f outputs/models_hard_r5/denoising/best/model_index.json ]; then
  mkdir -p outputs/pred_hard_sweep_r5
  for pt in "0.05:1.0" "0.1:1.0" "0.2:1.0" "0.1:5.0" "0.35:5.0"; do
    s="${pt%%:*}"; g="${pt##*:}"
    tag="s${s}_g${g}"
    run_item hard_sweep_$tag 900 3600 python scripts/generate_predictions.py \
      --data_root data/pairs_hard --models_root outputs/models_hard_r5 \
      --tasks denoise --split val --max_images 16 --denoise_strength "$s" \
      --denoise_guidance "$g" --out_root "outputs/pred_hard_sweep_r5/$tag"
    run_item hard_sweep_eval_$tag 300 1800 python scripts/evaluate_model.py \
      --pred_root "outputs/pred_hard_sweep_r5/$tag" \
      --data_root data/pairs_hard \
      --split val --tasks denoise --no-use_lpips --no-use_fid \
      --out_json "outputs/pred_hard_sweep_r5/eval_$tag.json"
  done
  BEST_PT=$(python - <<'EOF'
import glob, json
best, tag = -1e9, "s0.1_g1.0"
for p in glob.glob("outputs/pred_hard_sweep_r5/eval_*.json"):
    try:
        d = json.load(open(p))["denoise"]["metrics"]["psnr"]["mean"]
    except Exception:
        continue
    if d > best:
        best, tag = d, p.split("eval_")[1].split(".json")[0]
print(tag)
EOF
)
  BEST_S=$(echo "$BEST_PT" | sed 's/s\(.*\)_g.*/\1/')
  BEST_G=$(echo "$BEST_PT" | sed 's/.*_g//')
  echo "--- hard sweep best point: s=$BEST_S gs=$BEST_G" >> "$LOG"
  run_item predict_hard_r5 1500 5400 python scripts/generate_predictions.py \
    --data_root data/pairs_hard --models_root outputs/models_hard_r5 \
    --tasks denoise --split test --denoise_strength "$BEST_S" \
    --denoise_guidance "$BEST_G" --out_root outputs/predictions_hard
  run_item evaluate_hard_r5 600 2400 python scripts/evaluate_model.py \
    --pred_root outputs/predictions_hard --data_root data/pairs_hard \
    --split test --tasks denoise --no-use_fid \
    --out_json outputs/evaluation_results_hard.json
  commit_artifacts "round5: hard-family sweep + test eval (paired stats)"
fi

# =====================================================================
# Stage B (VERDICT #4 + corruption rebuild): full 10-epoch retrains for
# ALL FOUR tasks — every pre-round-5 best/ checkpoint reloads as
# near-init (see Stage A header), so the committed curves' checkpoints
# never actually existed on disk. These runs serve through the verified
# save path against the rebuilt VAE.
# =====================================================================
for task in denoising:train_denoising super_resolution:train_super_resolution \
            inpainting:train_inpainting colorization:train_colorization; do
  d="${task%%:*}"; scr="${task##*:}"
  if [ ! -f "outputs/models_r5/$d/final/model_index.json" ] \
     && [ ! -f "outputs/models/$d/.r5_full" ]; then
    run_item retrain10_$d 4200 10800 python "scripts/$scr.py" \
      $RETRAIN_ARGS $VAE_INIT --output_dir "outputs/models_r5/$d"
  fi
  # swap in only a COMPLETED fresh run; a half-trained one keeps the old
  # (servable) checkpoint in place so eval can never silently fall back
  # to classical predictions
  if [ -f "outputs/models_r5/$d/final/model_index.json" ]; then
    rm -rf "outputs/models/${d}_r4bak"
    mv "outputs/models/$d" "outputs/models/${d}_r4bak" 2>/dev/null
    rm -rf "outputs/models/${d}_r4bak/train_state"   # ~3G; curves committed
    mv "outputs/models_r5/$d" "outputs/models/$d"
    touch "outputs/models/$d/.r5_full"
    commit_artifacts "round5: $d full 10-epoch retrain (run 3)"
  fi
done

# ---- B2. predictions + fail-loud paired-stats evaluation, all 4 tasks
run_item predict_all_r5 2400 9000 python scripts/generate_predictions.py \
  --tasks denoise sr_x4 colorize inpaint --split test
run_item evaluate_all_r5 900 3600 env IRET_FID_RANDOM_INIT=1 \
  python scripts/evaluate_model.py --split test
python scripts/summarize_workflow.py > "$ART/summary.md" 2>/dev/null
commit_artifacts "round5: 4-task predictions + paired-stats evaluation"

# =====================================================================
# Stage C (VERDICT #2): widen the tome(0.5) gate — n=32, 4 tasks,
# 2 strengths on the restoration headliners
# =====================================================================
gate() {
  # gate <tag> <need> <cap> <args...>
  local tag="$1" need="$2" cap="$3"; shift 3
  run_item gate_$tag "$need" "$cap" sh -c \
    "python -u scripts/eval_quant_quality.py $* | tee /tmp/r5_gate_$tag.txt"
}
if [ -d outputs/models/denoising/best ]; then
  gate denoise_s05 1800 7200 "--checkpoint outputs/models/denoising/best \
    --size 512 --n 32 --batch 8 --modes int8_static --tome 0.5 --cfg_cache 2"
  gate denoise_s035 1500 7200 "--checkpoint outputs/models/denoising/best \
    --size 512 --n 32 --batch 8 --strength 0.35 --modes int8_static --tome 0.5"
fi
if [ -d outputs/models/super_resolution/best ]; then
  gate sr_def 1500 7200 "--checkpoint outputs/models/super_resolution/best \
    --task sr_x4 --pairs data/pairs/sr_x4/val --size 512 --n 32 --batch 8 \
    --modes int8_static --tome 0.5"
  gate sr_s06 1200 5400 "--checkpoint outputs/models/super_resolution/best \
    --task sr_x4 --pairs data/pairs/sr_x4/val --size 512 --n 32 --batch 8 \
    --strength 0.6 --modes int8_static --tome 0.5"
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
commit_artifacts "round5: wide tome(0.5) gates (n=32, 4 tasks)"

# =====================================================================
# Stage D: benches (prewarmed) + VERDICT #6 second-tier points
# =====================================================================
bench_item exact_ctl 900
bench_item tome05 900 BENCH_TOME=0.5
bench_item tome05_k2 900 BENCH_TOME=0.5 BENCH_CFG_CACHE=2
bench_item turbo_k3 900 BENCH_CFG_CACHE=3
bench_item autotune 900 BENCH_XLA_OPTS=xla_tpu_autotune_dots=true
bench_item aggrfuse 900 \
  BENCH_XLA_OPTS=xla_tpu_enable_aggressive_loop_fusion_layout_opt=true
commit_artifacts "round5: bench points (prewarmed)"

# second-tier gates (turbo k=3 fresh; SR int8_static) — narrow n=8 probes
if [ -d outputs/models/denoising/best ]; then
  gate k3 1200 3600 "--checkpoint outputs/models/denoising/best --size 512 \
    --n 8 --batch 8 --modes int8_static --cfg_cache 3"
fi

rm -f /tmp/workflow_poller_r5.on
kill "$POLLER_PID" "$WATCHDOG_PID" 2>/dev/null
state "done"
commit_artifacts "round5: final chain artifacts"
echo "=== round5 chain done $(date) ===" >> "$LOG"
