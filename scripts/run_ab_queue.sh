#!/bin/bash
# Serial A/B queue for the headline bench: waits for the TPU relay to come
# back (backend init HANGS while it is down), then runs each experiment
# end-to-end, one process at a time (the relay wedges under concurrency).
# Results append to $OUT as "LABEL <json-line>".
set -u
OUT=${OUT:-/tmp/ab_results.txt}
cd "$(dirname "$0")/.."

echo "=== ab queue start $(date) ===" >> "$OUT"

# 1. wait for the relay
while true; do
  if timeout 240 python -c "
import jax
jax.config.update('jax_compilation_cache_dir', '/tmp/jax_cache')
import jax.numpy as jnp
x = jnp.ones((128,128)); print(float(jnp.mean(x@x)))
assert jax.devices()[0].platform == 'tpu'
" >/dev/null 2>&1; then
    echo "TPU UP $(date)" >> "$OUT"
    break
  fi
  echo "tpu down $(date)" >> "$OUT"
  sleep 540
done

run() {
  local label="$1"; shift
  echo "--- $label start $(date)" >> "$OUT"
  local line
  line=$(env "$@" timeout 2400 python bench.py 2>/tmp/ab_last_stderr.log | tail -1)
  echo "$label $line" >> "$OUT"
}

# A: confirm the shipping default still measures ~3.99
run baseline_int8_static_b8
# A2: quantized s8 QK+PV attention at the five N=4096 sites (the 700ms
# block; projected ~+0.4 img/s). Approximate — quality gate in stage 2.
run attn_x8 IRET_ATTN_XLA_INT8_MIN=4096
# B: zero-pad the 960-ch concat conv to 1024 lanes (exact; bitwise-tested)
run pad_conv_cin IRET_PAD_CONV_CIN=1
# B2: attn quant + pad combo
run attn_x8_pad IRET_ATTN_XLA_INT8_MIN=4096 IRET_PAD_CONV_CIN=1
# C: batch 12 (new program shape -> fresh compile)
run batch12 BENCH_BATCH=12
# D: combo if both matter independently — cheap to just measure
run batch12_pad BENCH_BATCH=12 IRET_PAD_CONV_CIN=1
# E: documented opt-in turbo mode (approximate; quality gate separately)
run turbo_k2 BENCH_CFG_CACHE=2
# F: turbo + pad combo
run turbo_k2_pad BENCH_CFG_CACHE=2 IRET_PAD_CONV_CIN=1

echo "=== ab queue done $(date) ===" >> "$OUT"
