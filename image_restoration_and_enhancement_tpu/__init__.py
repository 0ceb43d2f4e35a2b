"""image_restoration_and_enhancement_tpu — a TPU-native image restoration framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of
``qmoututu11/Image_Restoration_and_Enhancement`` ("RestoraGen"): Stable-Diffusion
fine-tuning and inference for four restoration tasks — denoise, super-resolution
x4, colorization, inpainting — plus the surrounding data, metrics, training and
serving machinery.

Unlike the reference (single-GPU PyTorch scripts over `diffusers`), every
compute component here is first-party and TPU-first:

- ``models``  — Flax UNet2DCondition (4ch & 9ch), AutoencoderKL, CLIP text
  encoder, BPE tokenizer (NHWC layouts, bf16-friendly).
- ``core``    — noise schedulers (DDPM/DDIM/PLMS) as pure jittable functions,
  jitted sampling loops, checkpoint I/O.
- ``ops``     — Pallas TPU kernels (flash attention) + jnp image ops.
- ``parallel``— `jax.sharding` Mesh utilities, pjit train/infer sharding.
- ``data``    — degradation synthesis, pair datasets, COCO tooling, native
  C++ host preprocessing.
- ``metrics`` — PSNR/SSIM/ΔE in jnp (vmappable), LPIPS/FID model ports.
- ``tasks``   — the 4-task registry (prompts, conditioning, losses).
- ``train``   — generic data-parallel fine-tune loop (optax, bf16, grad accum).
- ``infer``   — `RestorationPipeline` equivalent with fallback chains.

Import as ``import image_restoration_and_enhancement_tpu as iret``.
"""

__version__ = "0.1.0"

# Short alias used throughout docs/tests.
PACKAGE_ALIAS = "iret"

# IRET_PLATFORM=cpu|tpu: pin the JAX platform via jax.config BEFORE backend
# initialization. The env var JAX_PLATFORMS alone is not sufficient on
# boxes where a TPU plugin (e.g. the axon relay) overrides platform
# selection — and a hung relay then blocks even CPU-only CLI runs. Used by
# the CLI subprocess tests and by users running the data/eval tooling on
# non-TPU hosts.
import os as _os

if _os.environ.get("IRET_PLATFORM"):
    import jax as _jax

    try:
        _jax.config.update("jax_platforms", _os.environ["IRET_PLATFORM"])
    except Exception:  # noqa: BLE001 — backend already initialized
        pass

# Persistent compilation cache, on by default: each big-program compile
# goes through a remote compile service (~5-15 min); identically-shaped
# programs across the four task trainers (same UNet step / val sampler)
# must hit the disk cache, not recompile. Opt out with
# IRET_NO_COMPILE_CACHE=1; override location with JAX_COMPILATION_CACHE_DIR.
if not _os.environ.get("IRET_NO_COMPILE_CACHE"):
    import jax as _jax

    try:
        if _jax.config.jax_compilation_cache_dir is None:
            _jax.config.update(
                "jax_compilation_cache_dir",
                _os.environ.get("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache"),
            )
    except Exception:  # noqa: BLE001 — older jax without the option
        pass
del _os
