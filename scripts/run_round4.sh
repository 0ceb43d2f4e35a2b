#!/bin/bash
# Round-4 finishing chain (VERDICT r3 "Next round" #1-#3 + leftovers).
#
# One priority-ordered, deadline-aware, strictly-serial TPU queue
# (CLAUDE.md: the relay wedges under concurrency), with v6's stall
# watchdog (kill a stage whose relay I/O is frozen 25 min while an
# independent probe proves the relay alive; retry once on stall-kill).
#
# Order (why): the round-3 judge's top ask is the COMPLETED 4-task
# evaluation (retrain-then-eval ordering, fail-loud eval), and its #2 is
# the measured settlement of the 8x bar (the stage-5/6 queue training
# pre-empted twice). The denoise retrain comes first because BOTH need
# it: it restores the missing eval checkpoint AND is the fresh
# checkpoint the int8/turbo/ToMe gates must run on. Then the rest of the
# eval story (sr retrain, colorize resume to 10/10, predictions,
# fail-loud evaluate with input baselines + the FID path exercised),
# then the hard-degradation (sigma in [40,80]) denoise run that makes a
# reference-layout artifact demonstrate MEASURED restoration
# (output-PSNR > input-PSNR through generate_predictions -> evaluate),
# then the XLA flag sweep + second-tier gates.
set -u
LOG=${LOG:-/tmp/round4.log}
OUT=${OUT:-/tmp/ab_results.txt}
GITLOCK=/tmp/git_workflow.lock
DEADLINE_TS=${DEADLINE_TS:?set DEADLINE_TS (unix seconds)}
cd "$(dirname "$0")/.."
ART=docs/artifacts/realrun_full
ART_HARD=docs/artifacts/realrun_hard
mkdir -p "$ART" "$ART_HARD"

VAE_INIT="--vae_init outputs/models/vae_pretrained/best"
RETRAIN_ARGS="--batch_size 8 --gradient_accumulation_steps 1 \
  --optimizer adafactor --save_steps -1 --state_save_epochs -1"
RESUME_ARGS="--num_epochs 10 --batch_size 8 --gradient_accumulation_steps 1 \
  --optimizer adafactor --save_steps -1 --state_save_epochs 5 --resume"

STALL_MARK=/tmp/stall_killed
WD_LOG=/tmp/watchdog.log

left() { echo $(( DEADLINE_TS - $(date +%s) )); }

state() {
  printf '{"stage": "%s", "round": 4, "ts": "%s", "deadline_left_s": %s}\n' \
    "$1" "$(date -u +%FT%TZ)" "$(left)" > "$ART/workflow_state.json"
}

sync_artifacts() {
  # Every round-4 run is post-reset: denoise/sr/inpaint retrains are
  # checkpoint restores (not the committed run-1 curves) -> sync under
  # _run2 names; colorize round-4 IS a full fresh 10-epoch run -> _run3
  # (runs 1: 6 ep, 2: 5 ep stay on the books); vae -> _run3 (v4 16ep +
  # v5/v6 10ep committed). Copy STRAIGHT to the suffixed name — never
  # through the unsuffixed path, which would clobber the committed
  # run-1 files.
  for p in "denoising:denoise:_run2" "super_resolution:sr_x4:_run2" \
           "inpainting:inpaint:_run2" "colorization:colorize:_run3"; do
    d="${p%%:*}"; r="${p##*:}"; t="${p#*:}"; t="${t%%:*}"
    src="outputs/models/$d"
    [ -d "$src" ] || continue
    [ -f "$src/metrics_${t}.csv" ] && \
      cp "$src/metrics_${t}.csv" "$ART/metrics_${t}${r}.csv" 2>/dev/null
    [ -f "$src/training_${t}.log" ] && \
      cp "$src/training_${t}.log" "$ART/training_${t}${r}.log" 2>/dev/null
    if [ -d "$src/val_samples" ]; then
      mkdir -p "$ART/val_samples_$d"
      ls "$src/val_samples/" | sort -V | sed -n '1p;$p' | while read -r f; do
        cp "$src/val_samples/$f" "$ART/val_samples_$d/" 2>/dev/null
      done
    fi
  done
  [ -f outputs/models/vae_pretrained/metrics_vae.csv ] && \
    cp outputs/models/vae_pretrained/metrics_vae.csv \
      "$ART/metrics_vae_run3.csv" 2>/dev/null
  cp outputs/evaluation_results.json "$ART/" 2>/dev/null
  # hard-family artifacts (measured-restoration run)
  if [ -d outputs/models_hard/denoising ]; then
    cp outputs/models_hard/denoising/metrics_*.csv "$ART_HARD/" 2>/dev/null
    cp outputs/models_hard/denoising/training_*.log "$ART_HARD/" 2>/dev/null
    if [ -d outputs/models_hard/denoising/val_samples ]; then
      mkdir -p "$ART_HARD/val_samples"
      ls outputs/models_hard/denoising/val_samples/ | sort -V | sed -n '1p;$p' \
        | while read -r f; do
        cp "outputs/models_hard/denoising/val_samples/$f" \
          "$ART_HARD/val_samples/" 2>/dev/null
      done
    fi
  fi
  cp outputs/evaluation_results_hard.json "$ART_HARD/" 2>/dev/null
  cp outputs/pred_hard_sweep/eval_*.json "$ART_HARD/" 2>/dev/null
  return 0
}

commit_artifacts() {
  sync_artifacts
  (
    flock -w 120 9 || exit 0
    git add -A "$ART" "$ART_HARD" >/dev/null 2>&1
    git commit -q -m "$1" -- "$ART" "$ART_HARD" >/dev/null 2>&1 || true
  ) 9>"$GITLOCK"
}

poller() {
  while [ -f /tmp/workflow_poller.on ]; do
    sleep 300
    commit_artifacts "workflow: periodic evidence sync"
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
  local label="$1" need="$2"; shift 2
  local rem; rem=$(left)
  if [ "$rem" -lt "$need" ]; then
    echo "--- skip bench $label: ${rem}s left" >> "$OUT"; return
  fi
  # skip only on a COMPLETED prior measurement (exit=0) — a bare start
  # marker can be a crashed/timed-out attempt (ADVICE r3 #1)
  if grep -q "^--- $label exit=0" "$OUT" 2>/dev/null; then
    echo "--- $label already measured, skipping" >> "$OUT"; return
  fi
  rm -f "$STALL_MARK"
  echo "--- $label start $(date)" >> "$OUT"
  state "bench_$label"
  env "$@" timeout $(( rem < 2400 ? rem : 2400 )) python bench.py \
    2>"/tmp/r4_${label}.err" | tail -1 >> "$OUT"
  echo "--- $label exit=${PIPESTATUS[0]} $(date)" >> "$OUT"
}

echo "=== round4 chain start $(date), deadline in $(left)s ===" >> "$LOG"
state "start"
touch /tmp/workflow_poller.on
poller &
POLLER_PID=$!
watchdog $$ 25 &
WATCHDOG_PID=$!

# Wait for the relay to come back before burning stage budgets: a wedged
# relay (observed after concurrent clients) hangs every client in device
# init. Probe every 3 min until one succeeds or the deadline nears.
while [ "$(left)" -gt 3600 ]; do
  if probe_tpu; then
    echo "--- relay probe ok $(date)" >> "$LOG"; break
  fi
  echo "--- relay probe failed, waiting $(date)" >> "$LOG"
  sleep 180
done

# ---- 0a. datagen (the VM reset wiped the gitignored data/clean +
#          data/pairs; the session arms this before launching the chain
#          but self-heal here too). Block until done — every later stage
#          reads data/pairs.
if ! grep -q DATAGEN_DONE /tmp/datagen.log 2>/dev/null; then
  if [ ! -f /tmp/datagen.pid ] || ! kill -0 "$(cat /tmp/datagen.pid)" 2>/dev/null; then
    echo "--- datagen missing; regenerating inline" >> "$LOG"
    state "datagen"
    (python scripts/make_procedural_clean.py --out_root data/clean \
      && python scripts/make_synthetic_pairs.py --clean_root data/clean \
        --out_root data/pairs && echo DATAGEN_DONE >> /tmp/datagen.log) \
      >> /tmp/datagen.log 2>&1 &
    echo $! > /tmp/datagen.pid
  fi
  state "datagen_wait"
  while ! grep -q DATAGEN_DONE /tmp/datagen.log 2>/dev/null; do
    kill -0 "$(cat /tmp/datagen.pid)" 2>/dev/null || break
    sleep 30
  done
  grep -q DATAGEN_DONE /tmp/datagen.log 2>/dev/null \
    || { echo "--- FATAL: datagen failed" >> "$LOG"; exit 1; }
fi

# ---- 0b. VAE pretrain (reset wiped it; every task trainer seeds its
#          frozen VAE from this — without it val PSNR pins at
#          decode-noise level)
if [ ! -f outputs/models/vae_pretrained/best/model_index.json ]; then
  run_item vae_pretrain 2400 5400 python scripts/pretrain_vae.py \
    --num_epochs 8 --output_dir outputs/models/vae_pretrained
  commit_artifacts "round4: VAE pretrain (8 ep, reset recovery)"
fi
if [ ! -f outputs/models/vae_pretrained/best/model_index.json ]; then
  echo "--- WARNING: no pretrained VAE; random frozen VAE" >> "$LOG"
  VAE_INIT=""
fi

# ---- 1. denoise retrain: restores the eval checkpoint AND provides the
#         fresh checkpoint for the gates (VERDICT #1 + weak #5)
if [ ! -f outputs/models/denoising/best/model_index.json ]; then
  run_item retrain_denoise 2400 5400 python scripts/train_denoising.py \
    $RETRAIN_ARGS --num_epochs 3 $VAE_INIT
  commit_artifacts "round4: denoise retrain (3 ep, checkpoint restore)"
fi

# ---- 2. fresh-checkpoint quality gates: int8_static + turbo k2 + ToMe 0.5
if [ -d outputs/models/denoising/best ]; then
  run_item gate_combo 1500 5400 python -u scripts/eval_quant_quality.py \
    --checkpoint outputs/models/denoising/best --size 512 --n 4 \
    --modes int8_static --cfg_cache 2 --tome 0.5
  cp /tmp/round4.log /tmp/round4_gate_snapshot.log 2>/dev/null
fi

# ---- 3. approximate-mode throughput points (the >=8x candidates)
bench_item bench_tome05 900 BENCH_TOME=0.5
bench_item bench_tome05_k2 800 BENCH_TOME=0.5 BENCH_CFG_CACHE=2
bench_item bench_turbo_k3 800 BENCH_CFG_CACHE=3

# ---- 4. sr retrain (checkpoint restore for the 4-task eval)
if [ ! -f outputs/models/super_resolution/best/model_index.json ]; then
  run_item retrain_sr 2400 5400 python scripts/train_super_resolution.py \
    $RETRAIN_ARGS --num_epochs 2 $VAE_INIT
  commit_artifacts "round4: sr_x4 retrain (2 ep, checkpoint restore)"
fi

# ---- 5. colorize: the reset took the resumable state@1250 with it, so
#         this is the full 10-epoch run the judge asked for, from scratch
#         (--resume is a no-op with no state and protects against a
#         mid-chain VM bounce via state_save_epochs 5)
run_item train_colorize 3000 9000 python scripts/train_colorization.py \
  $RESUME_ARGS $VAE_INIT
commit_artifacts "round4: colorize full 10-epoch curve (run 3, from scratch)"

# ---- 5b. inpaint retrain (reset wiped the v6 checkpoint; the 10/10
#          curve is committed — this restores a servable best/ for eval)
if [ ! -f outputs/models/inpainting/best/model_index.json ]; then
  run_item retrain_inpaint 2400 5400 python scripts/train_inpainting.py \
    $RETRAIN_ARGS --num_epochs 2 $VAE_INIT
  commit_artifacts "round4: inpaint retrain (2 ep, checkpoint restore)"
fi

# ---- 6-7. predictions + FAIL-LOUD evaluation for ALL four tasks
run_item predict_all 2400 7200 python scripts/generate_predictions.py \
  --tasks denoise sr_x4 colorize inpaint --split test
run_item evaluate_all 900 3600 env IRET_FID_RANDOM_INIT=1 \
  python scripts/evaluate_model.py --split test
python scripts/summarize_workflow.py > "$ART/summary.md" 2>/dev/null
commit_artifacts "round4: 4-task predictions + evaluation (fail-loud, input baselines, FID path exercised)"

# ---- 8. hard-degradation denoise run (measured restoration; sigma in
#         [40,80] family). Two-stage: (a) a NOISE-FAITHFUL VAE pretrained
#         on mixed clean+noisy images — measured prerequisite: the
#         clean-only VAE round-trips a hard noisy input at ~9 dB vs the
#         16 dB input baseline (it mangles off-manifold inputs), so no
#         serving strength could beat do-nothing through it; the mixed
#         VAE reconstructs noisy inputs faithfully, like the
#         general-purpose SD VAE (the demo's --vae_data mixed finding at
#         full scale). (b) the 860M UNet fine-tuned on the hard pairs
#         against that frozen VAE.
# (the hard pairs + mixed-VAE data are committed in git, so they
# survived the VM reset — no datagen needed here)
[ -d data/pairs_hard/denoise/train/input ] || \
  echo "--- WARNING: hard pairs missing" >> "$LOG"
if [ ! -f outputs/models_hard/vae_mixed/best/model_index.json ]; then
  run_item vae_mixed 2400 5400 python scripts/pretrain_vae.py \
    --data_root data/vae_mixed_hard --num_epochs 5 \
    --output_dir outputs/models_hard/vae_mixed
fi
run_item train_hard 3600 9000 python scripts/train_denoising.py \
  --data_root data/pairs_hard --output_dir outputs/models_hard/denoising \
  --num_epochs 8 $RETRAIN_ARGS \
  --vae_init outputs/models_hard/vae_mixed/best
commit_artifacts "round4: hard-family denoise training artifacts"

# ---- 9. serving-strength mini-sweep on the val split (16 images each),
#         then test predictions at the best point + evaluation with the
#         do-nothing input baseline alongside
if [ -f outputs/models_hard/denoising/best/model_index.json ]; then
  mkdir -p outputs/pred_hard_sweep
  for s in 0.1 0.2 0.35; do
    run_item hard_sweep_$s 1200 3600 python scripts/generate_predictions.py \
      --data_root data/pairs_hard --models_root outputs/models_hard \
      --tasks denoise --split val --max_images 16 --denoise_strength $s \
      --out_root outputs/pred_hard_sweep/s$s
    run_item hard_sweep_eval_$s 300 1800 python scripts/evaluate_model.py \
      --pred_root outputs/pred_hard_sweep/s$s --data_root data/pairs_hard \
      --split val --tasks denoise --no-use_lpips --no-use_fid \
      --out_json outputs/pred_hard_sweep/eval_s$s.json
  done
  BEST_S=$(python - <<'EOF'
import glob, json
best, bs = -1e9, "0.1"
for p in glob.glob("outputs/pred_hard_sweep/eval_s*.json"):
    try:
        d = json.load(open(p))["denoise"]["metrics"]["psnr"]["mean"]
    except Exception:
        continue
    if d > best:
        best, bs = d, p.split("eval_s")[1].split(".json")[0]
print(bs)
EOF
)
  echo "--- hard sweep best strength: $BEST_S" >> "$LOG"
  run_item predict_hard 1500 5400 python scripts/generate_predictions.py \
    --data_root data/pairs_hard --models_root outputs/models_hard \
    --tasks denoise --split test --denoise_strength "$BEST_S" \
    --out_root outputs/predictions_hard
  run_item evaluate_hard 600 2400 python scripts/evaluate_model.py \
    --pred_root outputs/predictions_hard --data_root data/pairs_hard \
    --split test --tasks denoise --no-use_fid \
    --out_json outputs/evaluation_results_hard.json
  commit_artifacts "round4: hard-family predictions + evaluation (input-baseline comparison)"
fi

# ---- 10. XLA flag sweep (BENCH_XLA_OPTS mechanism; env XLA_FLAGS is
#          fatal through the relay, bench.py comments). Trimmed to the
#          five most promising after the reset cost the chain ~2h of
#          rebuild stages.
bench_item base_ctl 800 BENCH_DUMMY=1
bench_item fastq 800 \
  BENCH_XLA_OPTS=xla_tpu_experimental_allow_fast_quantization_conversions=true
bench_item vmem64m 800 BENCH_XLA_OPTS=xla_tpu_scoped_vmem_limit_kib=65536
bench_item autotune 800 BENCH_XLA_OPTS=xla_tpu_autotune_dots=true
bench_item aggrfuse 800 \
  BENCH_XLA_OPTS=xla_tpu_enable_aggressive_loop_fusion_layout_opt=true

# ---- 11. second-tier gates
if [ -d outputs/models/denoising/best ]; then
  run_item gate_k3 1200 3600 python -u scripts/eval_quant_quality.py \
    --checkpoint outputs/models/denoising/best --size 512 --n 4 \
    --modes int8_static --cfg_cache 3
fi
if [ -d outputs/models/super_resolution/best ]; then
  run_item gate_sr 1200 3600 python -u scripts/eval_quant_quality.py \
    --checkpoint outputs/models/super_resolution/best --task sr_x4 \
    --pairs data/pairs/sr_x4/val --size 512 --n 4 --modes int8_static
fi

rm -f /tmp/workflow_poller.on
kill "$POLLER_PID" "$WATCHDOG_PID" 2>/dev/null
state "done"
commit_artifacts "round4: final chain artifacts"
echo "=== round4 chain done $(date) ===" >> "$LOG"

# --- session follow-ups (appended at EOF while the chain runs mid-file;
#     append-only is safe — existing byte offsets untouched). The
#     bench_tome05 first attempt burned its whole cap on the post-reset
#     cold compile (programs landed in cache at 00:42-00:44, kill at
#     00:44:34); a warm-cache retry is minutes. tome(0.5) is the
#     strongest >=8x candidate: its gate is 0.982 SSIM-vs-exact and it
#     BEATS exact bf16 on gt-PSNR at the fresh checkpoint.
bench_item bench_tome05_retry 600 BENCH_TOME=0.5
commit_artifacts "round4: tome05 warm-cache bench retry"
echo "=== round4 appended follow-ups done $(date) ===" >> "$LOG"
