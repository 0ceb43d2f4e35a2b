#!/usr/bin/env python3
"""Headline benchmark: SD-1.5 img2img throughput on one TPU chip.

Measures the reference's headline serving path (BASELINE.json: "img2img
images/sec/chip @512px/20 steps") end to end: CLIP-conditioned, CFG-enabled,
20-step DDIM denoising loop + VAE decode, jit-compiled as one program, bf16
weights, on the attached TPU chip.

Baseline: the torch reference never measured inference throughput; its
A100-40GB/fp16 diffusers img2img at 512px/20 steps runs at ~0.55 images/s
(typical published diffusers numbers for SD1.5 on A100 with CFG).
`vs_baseline` is ours / 0.55.

Prints exactly one JSON line:
  {"metric": ..., "value": N, "unit": "img/s/chip", "vs_baseline": N}
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

A100_REFERENCE_IMG_PER_S = 0.55

# Hard wall-clock deadline with re-exec retry. The TPU relay can drop an
# in-flight response (observed 2026-08-20: a training stage's jax client
# froze forever mid device-init while an independent probe client worked
# fine). This benchmark runs unattended at round end; without a deadline a
# dropped response would hang it indefinitely and record nothing. On
# expiry the process re-execs itself (same PID, fresh jax client + relay
# connection) up to BENCH_MAX_RETRIES times, then exits non-zero — it
# never prints a fabricated number.
def _default_deadline_s() -> float:
    """Scale the default deadline with the requested workload so a
    legitimately long interactive run (large BENCH_ITERS/STEPS/SIZE) is not
    silently restarted and failed by a deadline tuned for the default
    workload (ADVICE r3 #4). The default workload (batch 8, 20 steps,
    512px, 3 iters) keeps the historical 3600s budget — dominated by the
    ~15 min remote compile + warmup, not the iters — and anything heavier
    grows it proportionally to the extra device work."""
    steps = int(os.environ.get("BENCH_STEPS", "20"))
    size = int(os.environ.get("BENCH_SIZE", "512"))
    iters = int(os.environ.get("BENCH_ITERS", "3"))
    batch = int(os.environ.get("BENCH_BATCH", "8"))
    # device work scales ~ iters * steps * batch * size^2 (attention grows
    # faster, but this is a deadline, not a model)
    scale = (iters * steps * batch * size * size) / (3 * 20 * 8 * 512 * 512)
    return 3600.0 * max(1.0, scale)


BENCH_DEADLINE_S = float(
    os.environ.get("BENCH_DEADLINE_S") or _default_deadline_s()
)
BENCH_MAX_RETRIES = int(os.environ.get("BENCH_MAX_RETRIES", "2"))


def _arm_deadline():
    if BENCH_DEADLINE_S <= 0:
        return
    import threading

    attempt = int(os.environ.get("BENCH_RETRY", "0"))

    def fire():
        sys.stderr.write(
            f"bench.py: no result after {BENCH_DEADLINE_S:.0f}s "
            f"(attempt {attempt + 1}) — "
        )
        if attempt >= BENCH_MAX_RETRIES:
            sys.stderr.write("giving up\n")
            sys.stderr.flush()
            os._exit(1)
        sys.stderr.write("re-exec with a fresh client\n")
        sys.stderr.flush()
        os.environ["BENCH_RETRY"] = str(attempt + 1)
        os.execv(sys.executable, [sys.executable] + sys.argv)

    t = threading.Timer(BENCH_DEADLINE_S, fire)
    t.daemon = True
    t.start()


def main():
    _arm_deadline()
    if os.environ.get("BENCH_TEST_SLEEP"):  # deadline self-test hook
        time.sleep(float(os.environ["BENCH_TEST_SLEEP"]))
        return
    import jax
    import jax.numpy as jnp
    import numpy as np

    # persistent compile cache: the 512px scanned loop is expensive to build
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from image_restoration_and_enhancement_tpu import config as C
    from image_restoration_and_enhancement_tpu.core import sampling
    from image_restoration_and_enhancement_tpu.ops import token_merge

    batch = int(os.environ.get("BENCH_BATCH", "8"))  # best measured batch
    steps = int(os.environ.get("BENCH_STEPS", "20"))
    size = int(os.environ.get("BENCH_SIZE", "512"))
    iters = int(os.environ.get("BENCH_ITERS", "3"))

    # Int8 serving with static calibrated activation scales (ops/quant.py)
    # is the shipping default: measured on v5e 3.99 img/s static vs 3.65
    # dynamic vs 3.20 bf16, quality-gated by scripts/eval_quant_quality.py
    # (static-vs-bf16 output PSNR 34.0 dB / SSIM 0.993 on the real trained
    # checkpoint, gt-PSNR delta -0.013 dB). BENCH_QUANT=int8 for dynamic
    # scales, =none for bf16.
    quant_env = os.environ.get(
        "BENCH_QUANT", os.environ.get("IRET_QUANT", "int8_static"))
    if quant_env and quant_env != "none":
        os.environ["IRET_QUANT"] = quant_env
    else:
        os.environ.pop("IRET_QUANT", None)

    platform = jax.devices()[0].platform
    attn_backend = os.environ.get("BENCH_ATTN") or None
    modules = sampling.SDModules.create(
        C.SD15, dtype=jnp.bfloat16, attention_backend=attn_backend
    )
    params = sampling.init_params(modules, jax.random.PRNGKey(0), image_size=size)
    # Serving-grade weights: bf16 resident (halves HBM traffic on the
    # bandwidth-bound UNet).
    params = jax.tree.map(lambda x: x.astype(jnp.bfloat16), params)

    # Structured deterministic inputs (not zeros): the static-int8
    # calibration below derives activation scales from THIS batch, and a
    # zero image under-excites every conv/dense site (VERDICT r2 weak #3 —
    # calibration/serving drift). Content does not affect the timing; it
    # does make the calibrated program the one a real image would get.
    yy, xx = np.mgrid[0:size, 0:size].astype(np.float32) / size
    chans = np.stack([
        np.sin(2 * np.pi * (1.3 * xx + 0.7 * yy)),
        np.cos(2 * np.pi * (0.5 * xx + 1.9 * yy)),
        np.sin(2 * np.pi * (2.1 * xx * yy + 0.25)),
    ], axis=-1)
    image = jnp.asarray(
        np.broadcast_to(chans * 0.9, (batch, size, size, 3)), jnp.float32
    )
    ctx = sampling.encode_text(
        modules, params, jnp.zeros((batch, 77), jnp.int32)
    )
    key = jax.random.PRNGKey(42)

    if quant_env == "int8_static":
        # Calibrate per-site activation scales on the bench inputs (one
        # dynamic-int8 pass), then trace the serving fn with the scales as
        # constants — no absmax reduces in the hot program (ops/quant.py).
        from image_restoration_and_enhancement_tpu.ops import quant

        calib = sampling.make_calib_img2img_fn(
            modules, num_inference_steps=steps, strength=1.0,
            guidance_scale=5.0, sampler="ddim",
        )
        _, stats = calib(params, image, ctx, ctx, key)
        quant.load_static_table({k: float(v) for k, v in stats.items()})

    # BENCH_CFG_CACHE=k (default 1 = exact): opt-in approximate turbo mode —
    # uncond branch recomputed every k-th step (core/sampling.py). NOT the
    # headline path; quality-gate with scripts/eval_quant_quality.py
    # --cfg_cache before serving with it.
    cfg_cache = int(os.environ.get("BENCH_CFG_CACHE", "1"))
    # BENCH_TOME=r (default 0 = exact): opt-in approximate token-merge mode —
    # merge r*N tokens around the N>=4096 self-attention sites
    # (ops/token_merge.py). NOT the headline path; quality-gate with
    # scripts/eval_quant_quality.py --tome before serving with it.
    tome = float(os.environ.get("BENCH_TOME", "0") or 0.0)
    if tome:
        token_merge.set_tome(tome)
    fn = sampling.make_img2img_fn(
        modules, num_inference_steps=steps, strength=1.0,
        guidance_scale=5.0, sampler="ddim", cfg_cache_interval=cfg_cache,
    )

    # BENCH_XLA_OPTS="k=v,k=v": per-compile XLA/TPU backend options for the
    # serving program. The axon relay's LOCAL XLA_FLAGS parser fatals on
    # TPU-backend flags (parse_flags_from_env checks against the client
    # binary, which doesn't link libtpu); compiler_options on an AOT
    # .lower().compile() ARE forwarded to the remote compiler and validated
    # there (probe-verified: bogus names are rejected remotely). This is the
    # only working mechanism for TPU compiler flags through the relay.
    # Format: comma-separated k=v pairs. Comma-VALUED options are not
    # supported (the split is on ','); entries without '=' are an error.
    xla_opts = os.environ.get("BENCH_XLA_OPTS", "")
    if xla_opts:
        opts = {}
        for kv in xla_opts.split(","):
            if not kv:
                continue
            if "=" not in kv:
                raise SystemExit(
                    f"BENCH_XLA_OPTS entry {kv!r} is not k=v (comma-separated "
                    "k=v pairs; comma-valued options unsupported)")
            k, v = kv.split("=", 1)
            opts[k] = v
        fn = fn.lower(params, image, ctx, ctx, key).compile(
            compiler_options=opts)

    # Warmup/compile, then force real execution with a host fetch: through
    # remote-relay TPU backends, block_until_ready alone does not guarantee
    # the queue has drained — only a device_get does.
    out = fn(params, image, ctx, ctx, key)
    _ = float(jnp.mean(out))

    t0 = time.perf_counter()
    x = image
    for i in range(iters):
        # chain: each iteration consumes the previous output, so the device
        # cannot overlap or elide any of the work
        x = fn(params, x, ctx, ctx, jax.random.fold_in(key, i))
    sync = float(jnp.mean(x))  # 4-byte fetch closes the timed region
    dt = time.perf_counter() - t0
    assert sync == sync, "NaN in benchmark output"

    img_per_s = batch * iters / dt
    print(json.dumps({
        "metric": f"sd15_img2img_{size}px_{steps}step_cfg_throughput_{platform}",
        "value": round(img_per_s, 4),
        "unit": "img/s/chip",
        "vs_baseline": round(img_per_s / A100_REFERENCE_IMG_PER_S, 3),
    }))


if __name__ == "__main__":
    main()
