#!/usr/bin/env python3
"""Training-step throughput on the attached TPU chip (relay-safe timing).

Reference baseline: the A100 denoise fine-tune sustains ~2.24 images/s
(2000 images per 14m53s epoch, batch 1 + accum 8, fp16, 256px —
training_denoise.log). This measures our jitted train step (soft-
conditioning loss, frozen-VAE encodes, remat UNet, bf16 compute) at the
same resolution.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from image_restoration_and_enhancement_tpu import config as C
from image_restoration_and_enhancement_tpu.core import sampling
from image_restoration_and_enhancement_tpu.tasks.registry import get_task
from image_restoration_and_enhancement_tpu.train import loop as train_loop

A100_REFERENCE_TRAIN_IMG_PER_S = 2.24


def main():
    batch = int(os.environ.get("BENCH_BATCH", "8"))
    size = int(os.environ.get("BENCH_SIZE", "256"))
    iters = int(os.environ.get("BENCH_ITERS", "8"))

    modules = sampling.SDModules.create(C.SD15, dtype=jnp.bfloat16, remat=True)
    params = sampling.init_params(modules, jax.random.PRNGKey(0), image_size=size)
    task = get_task("denoise")
    cfg = train_loop.TrainConfig(
        gradient_accumulation_steps=1, lambda_img=0.05, batch_size=batch,
        image_size=size,
        optimizer=os.environ.get("BENCH_OPT", "adafactor"),
        nan_guard=os.environ.get("BENCH_GUARD", "zero_grads"),
    )
    step = train_loop.make_train_step(modules, task, cfg)
    state = train_loop.create_train_state(cfg, params["unet"], num_train_steps=1000)
    frozen = {"vae": params["vae"]}
    ctx = sampling.encode_text(modules, params, jnp.zeros((1, 77), jnp.int32))
    batch_data = {
        "input": jnp.zeros((batch, size, size, 3), jnp.float32),
        "gt": jnp.zeros((batch, size, size, 3), jnp.float32),
    }

    state, metrics = step(state, frozen, batch_data, ctx, jax.random.PRNGKey(0))
    _ = float(metrics["loss"])  # compile + drain

    t0 = time.perf_counter()
    for i in range(iters):
        state, metrics = step(state, frozen, batch_data, ctx, jax.random.fold_in(jax.random.PRNGKey(1), i))
    _ = float(metrics["loss"])
    dt = time.perf_counter() - t0

    img_per_s = batch * iters / dt
    print(json.dumps({
        "metric": f"sd15_train_step_{size}px_throughput_tpu",
        "value": round(img_per_s, 3),
        "unit": "img/s/chip",
        "vs_baseline": round(img_per_s / A100_REFERENCE_TRAIN_IMG_PER_S, 3),
    }))


if __name__ == "__main__":
    main()
