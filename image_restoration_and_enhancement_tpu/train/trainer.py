"""Training orchestrator: the L4 layer — epochs, validation, checkpoints.

One generic driver replaces the four reference scripts' outer loops
(train_denoising.py:84-927 and siblings). Behavior parity:

- per-epoch validation through the full jitted sampling pipeline at the
  task's val sampler settings (train_denoising.py:399-406), with PSNR/SSIM
  (+Y/L-channel, delta-E extras per task) and a dark-output sanity check
  (:409-410)
- best-by-val-PSNR full-pipeline checkpoint to {output_dir}/best
  (:777-786), periodic step checkpoints `checkpoint-{step}` honoring
  save_steps semantics 0/-1 (:956-957), `final/` at the end (:837-911)
- metrics.csv with the reference's per-task column sets (:279-281,
  train_colorization.py:222-224, train_inpainting.py:236-239)
- append-mode training.log surviving restarts (:105-137)
- val comparison strips (input|result|gt) to val_samples/epoch_N.png
  (:457-465)

Beyond the reference: optimizer state is checkpointed via Orbax so resume
is exact (the reference resumes weights-only), and the step runs
data-parallel over a Mesh.
"""
from __future__ import annotations

import csv
import dataclasses
import json
import logging
import os
import time
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np
from PIL import Image

from ..core import checkpoint as ckpt
from ..core import sampling
from ..metrics import functional as F
from ..metrics import perceptual
from ..parallel import mesh as meshlib
from ..tasks.registry import TaskSpec, get_task
from ..data.datasets import BatchLoader, PairDataset
from ..models.tokenizer import load_tokenizer
from .loop import TrainConfig, create_train_state, make_train_step

logger = logging.getLogger(__name__)


def _is_main() -> bool:
    """Multi-host: only process 0 writes logs/CSV/strips/pipeline files
    (SURVEY §2.3; reference gates on accelerator.is_main_process,
    train_denoising.py:726,:780). Orbax train-state checkpoints are NOT
    gated — orbax coordinates all hosts itself."""
    return jax.process_index() == 0


def _setup_logging(output_dir: str, task: str) -> None:
    """Attach the per-run training log file to the root logger.

    REPLACES any handler a previous call installed (tagged attribute):
    stacking them would duplicate every later record into every earlier
    run's log — e.g. a VAE pretrain followed by train_task in one process
    would append the whole denoise log to training_vae.log."""
    if not _is_main():
        return
    os.makedirs(output_dir, exist_ok=True)
    root = logging.getLogger()
    for h in [h for h in root.handlers if getattr(h, "_iret_task_log", False)]:
        root.removeHandler(h)
        h.close()
    handler = logging.FileHandler(os.path.join(output_dir, f"training_{task}.log"), mode="a")
    handler.setFormatter(logging.Formatter("%(asctime)s %(levelname)s %(message)s"))
    handler._iret_task_log = True
    root.addHandler(handler)
    if root.level > logging.INFO:
        root.setLevel(logging.INFO)


def _csv_columns(spec: TaskSpec) -> List[str]:
    cols = ["epoch", "psnr", "ssim", "lpips"]
    if spec.with_y_metrics:
        cols += ["psnr_y", "ssim_y"]
    if spec.with_color_metrics:
        cols += ["psnr_l", "ssim_l", "delta_e"]
    return cols + ["train_loss"]


def _append_csv(path: str, columns: List[str], row: Dict[str, float]) -> None:
    exists = os.path.exists(path)
    with open(path, "a", newline="") as f:
        writer = csv.DictWriter(f, fieldnames=columns)
        if not exists:
            writer.writeheader()
        writer.writerow({c: row.get(c, "") for c in columns})


def _save_strip(path: str, inp: np.ndarray, out: np.ndarray, gt: np.ndarray) -> None:
    strip = np.concatenate([inp, out, gt], axis=1)
    Image.fromarray(((strip + 1) * 127.5).clip(0, 255).astype(np.uint8)).save(path)


@dataclasses.dataclass
class ValidationResult:
    metrics: Dict[str, float]

    @property
    def psnr(self) -> float:
        return self.metrics.get("psnr", float("-inf"))


def run_validation(
    modules: sampling.SDModules,
    params,
    spec: TaskSpec,
    val_loader: BatchLoader,
    context: jnp.ndarray,
    uncond_context: Optional[jnp.ndarray],
    epoch: int,
    output_dir: str,
    max_batches: Optional[int] = None,
    seed: int = 42,
    sampler_fn_cache: Optional[dict] = None,
    log_input_baseline: Optional[bool] = None,
) -> ValidationResult:
    """Sample the pipeline on val pairs and compute task metrics.

    max_batches=None validates the FULL val loader — `--max_val_samples`
    on the CLI is the only limiter, matching the reference's semantics
    (train_denoising.py:446-499 iterates the whole val set)."""
    vs = spec.val_sampler or spec.sampler
    cache = sampler_fn_cache if sampler_fn_cache is not None else {}
    key = ("val", vs.num_inference_steps, vs.strength, vs.guidance_scale, vs.sampler)
    if key not in cache:
        maker = sampling.make_inpaint_fn if spec.uses_mask else sampling.make_img2img_fn
        cache[key] = maker(
            modules, num_inference_steps=vs.num_inference_steps,
            strength=vs.strength, guidance_scale=vs.guidance_scale,
            sampler=vs.sampler,
        )
    fn = cache[key]

    acc: Dict[str, List[float]] = {}
    input_psnrs: List[float] = []  # degraded-input-vs-gt baseline (epoch 1)
    # per-sigma buckets when the val set carries `_sigma` filename suffixes
    # (reference: train_denoising.py:446-455, :482-499)
    sigmas = getattr(val_loader.ds, "sigmas", [])
    sigma_buckets: Dict[int, Dict[str, List[float]]] = {}
    strip_saved = False
    sample_idx = 0
    for bi, batch in enumerate(val_loader.epoch(0)):
        if max_batches is not None and bi >= max_batches:
            break
        rng = jax.random.fold_in(jax.random.PRNGKey(seed), bi)
        # Pad a ragged final batch up to the loader's batch size so the
        # jitted sampler sees exactly ONE shape (each new shape is a fresh
        # multi-minute remote compile on this TPU relay); padded outputs
        # are dropped before metrics.
        n_valid = batch["input"].shape[0]
        bs = val_loader.batch_size
        if n_valid < bs:
            batch = {
                k: np.concatenate(
                    [v, np.repeat(v[-1:], bs - n_valid, axis=0)], axis=0
                )
                for k, v in batch.items()
            }
        x = jnp.asarray(batch["input"])
        if spec.uses_mask:
            out = fn(params, x, jnp.asarray(batch["mask"]), context,
                     uncond_context, rng)
        else:
            out = fn(params, x, context, uncond_context, rng)
        out01 = (np.asarray(out)[:n_valid] + 1.0) / 2.0
        gt01 = (batch["gt"][:n_valid] + 1.0) / 2.0
        # dark-output sanity check (reference :409-410)
        if out01.mean() < 0.02:
            logger.warning("validation produced near-black output (epoch %d)", epoch)
        # LPIPS when learned weights are imported (reference validation
        # computes it, train_denoising.py:328-519; column stays empty
        # otherwise — availability-gated like the reference's optional dep)
        # Baseline on the FIRST validated epoch of this run — which is not
        # epoch 1 on a resumed run (log_input_baseline lets the trainer say
        # so explicitly; the epoch<=1 default keeps direct callers working).
        if (epoch <= 1 if log_input_baseline is None else log_input_baseline):
            # "restores" must be measured, not asserted: record the
            # do-nothing baseline PSNR(degraded input, gt) once per run so
            # output PSNR has a reference point in the log.
            in01 = (batch["input"][:n_valid] + 1.0) / 2.0
            input_psnrs.extend(
                float(F.psnr(jnp.asarray(i), jnp.asarray(g)))
                for i, g in zip(in01, gt01)
            )
        batch_lpips: List[float] = []
        if perceptual.lpips_available():
            batch_lpips = perceptual.lpips_pairs(list(out01), list(gt01))
        for in_batch_idx, (p, g) in enumerate(zip(out01, gt01)):
            m = F.calculate_all(
                jnp.asarray(p), jnp.asarray(g),
                with_color=spec.with_color_metrics, with_y=spec.with_y_metrics,
            )
            if in_batch_idx < len(batch_lpips):
                m["lpips"] = batch_lpips[in_batch_idx]
            for name, v in m.items():
                acc.setdefault(name, []).append(float(v))
            sigma = sigmas[sample_idx] if sample_idx < len(sigmas) else None
            if sigma is not None:
                bucket = sigma_buckets.setdefault(int(round(sigma)), {})
                for name in ("psnr", "ssim", "psnr_y", "ssim_y", "lpips"):
                    if name in m:
                        bucket.setdefault(name, []).append(float(m[name]))
            sample_idx += 1
        if not strip_saved and _is_main():
            strip_dir = os.path.join(output_dir, "val_samples")
            os.makedirs(strip_dir, exist_ok=True)
            _save_strip(
                os.path.join(strip_dir, f"epoch_{epoch}.png"),
                batch["input"][0], np.asarray(out)[0], batch["gt"][0],
            )
            strip_saved = True
    if input_psnrs:
        logger.info(
            "val input-vs-gt baseline psnr %.3f (the do-nothing score output "
            "psnr is measured against)", float(np.mean(input_psnrs)),
        )
    if sigma_buckets:
        for sv in sorted(sigma_buckets):
            b = sigma_buckets[sv]
            logger.info(
                "  sigma=%d: %s", sv,
                {k: round(float(np.mean(v)), 4) for k, v in b.items()},
            )
    return ValidationResult({k: float(np.mean(v)) for k, v in acc.items()})


def train_task(
    task_name: str,
    data_root: str = "data/pairs",
    output_dir: Optional[str] = None,
    cfg: TrainConfig = TrainConfig(),
    init_from: Optional[str] = None,
    vae_init: Optional[str] = None,
    max_train_samples: Optional[int] = None,
    max_val_samples: Optional[int] = None,
    use_mesh: bool = True,
    dtype=jnp.bfloat16,
    resume: bool = False,
    model_config=None,
    task_spec=None,
) -> Dict[str, float]:
    """Fine-tune one task end to end. Returns the last validation metrics.

    model_config: optional SDModelConfig override (tiny configs in tests).
    task_spec: optional full TaskSpec override (demo/experiment variants,
    e.g. scripts/demo_restoration_learning.py's heavy-noise denoise);
    task_name is still used for registry lookup when task_spec is None."""
    spec = task_spec if task_spec is not None else get_task(task_name)
    if model_config is not None:
        spec = dataclasses.replace(spec, model_config=model_config)
    output_dir = output_dir or os.path.join("outputs", "models", spec.model_dir)
    _setup_logging(output_dir, spec.name)
    logger.info("=== training %s -> %s ===", spec.name, output_dir)
    t_start = time.time()

    # remat: fit 512px / larger batches (reference enables gradient
    # checkpointing unconditionally, train_denoising.py:251-253)
    modules = sampling.SDModules.create(spec.model_config, dtype=dtype, remat=True)
    rng = jax.random.PRNGKey(cfg.seed)

    if init_from and ckpt.pipeline_exists(init_from):
        logger.info("initializing from checkpoint %s", init_from)
        params = ckpt.load_pipeline(init_from)
    elif init_from and os.path.isdir(init_from):
        logger.info("importing torch pipeline from %s", init_from)
        params = ckpt.import_hf_pipeline(init_from)
    else:
        logger.warning("random-initializing all components (no init_from)")
        params = sampling.init_params(modules, rng, image_size=cfg.image_size)

    seeded_comps: set = set()
    if vae_init:
        # Seed FROZEN components (VAE, text towers) from a separate
        # pipeline checkpoint — e.g. scripts/pretrain_vae.py output. Without
        # pretrained SD weights (air-gapped), a reconstruction-pretrained
        # VAE is what makes the frozen encode/decode path meaningful, so
        # validation PSNR can actually reflect UNet learning. The UNet is
        # never taken from here (that's init_from's job).
        seeded = ckpt.load_pipeline(vae_init)
        for comp in ("vae", "text_encoder", "text_encoder_2"):
            if comp in seeded:
                params[comp] = seeded[comp]
                seeded_comps.add(comp)
                logger.info("seeded frozen %s from %s", comp, vae_init)

    train_ds = PairDataset(spec.name, data_root, "train", cfg.image_size, max_train_samples)
    val_ds = PairDataset(spec.name, data_root, "val", cfg.image_size, max_val_samples)
    train_loader = BatchLoader(train_ds, cfg.batch_size, seed=cfg.seed)
    # val batch 8 (when the train batch allows): full-set validation per
    # epoch is 4x cheaper than the reference-style batch-2 loop; ragged
    # final batches are padded inside run_validation (single jit shape).
    val_loader = BatchLoader(val_ds, min(cfg.batch_size, 8), shuffle=False, drop_last=False)
    logger.info("train pairs: %d, val pairs: %d", len(train_ds), len(val_ds))

    steps_per_epoch = len(train_loader)
    num_opt_steps = max(1, steps_per_epoch * cfg.num_epochs // cfg.gradient_accumulation_steps)

    mesh = None
    if use_mesh and jax.device_count() > 1 and cfg.batch_size % jax.device_count() == 0:
        mesh = meshlib.make_mesh()
        logger.info("data-parallel mesh over %d devices", jax.device_count())

    state = create_train_state(cfg, params["unet"], num_opt_steps)
    frozen = {"vae": params["vae"]}
    # verified save-time export path, pre-compiled before the first
    # optimizer step (core/checkpoint.ParamExporter)
    exporter = ckpt.ParamExporter()
    exporter.prepare(state.params)
    if cfg.state_save_epochs >= 0:
        exporter.prepare(state)  # sidecar checksums for orbax train state
    step_fn = make_train_step(modules, spec, cfg, mesh=mesh)

    tokenizer = load_tokenizer(init_from, vocab_size=spec.model_config.text_encoder.vocab_size)
    encode = (
        sampling.encode_text_sdxl if modules.is_sdxl else sampling.encode_text
    )
    context = encode(modules, params, jnp.asarray(tokenizer([spec.prompt])))
    vs = spec.val_sampler or spec.sampler
    uncond = (
        encode(modules, params, jnp.asarray(tokenizer([""])))
        if vs.guidance_scale > 1.0
        else None
    )

    train_ckpt = ckpt.TrainCheckpointer(os.path.join(output_dir, "train_state"))
    start_epoch = 0
    if resume:
        restored = train_ckpt.restore(state)
        if restored is not None:
            state = restored
            # Continue the epoch schedule where the state left off
            # (state.step counts per-batch steps, one per loader batch);
            # a resumed 10-epoch run trains only the remaining epochs and
            # keeps CSV epoch numbering monotonic.
            start_epoch = min(int(state.step) // max(1, steps_per_epoch), cfg.num_epochs)
            logger.info(
                "resumed training state at step %d (epoch %d/%d)",
                int(state.step), start_epoch, cfg.num_epochs,
            )

    csv_path = os.path.join(output_dir, f"metrics_{spec.name}.csv")
    columns = _csv_columns(spec)
    best_psnr = float("-inf")
    if resume:
        # keep best-checkpoint selection monotonic across restarts
        meta_path = os.path.join(output_dir, "best", "model_index.json")
        if os.path.exists(meta_path):
            with open(meta_path) as f:
                best_psnr = float(json.load(f).get("val_psnr", float("-inf")))
            logger.info("resumed best val psnr %.3f", best_psnr)
    global_step = int(state.step)
    val_metrics: Dict[str, float] = {}
    sampler_cache: dict = {}

    # Fetch losses in chunks, not per step: a per-step float() forces a
    # host round-trip through the TPU relay every step and serializes the
    # pipeline (VERDICT r1 weak #4). Device scalars are cheap to hold; we
    # drain every _LOSS_FETCH_EVERY steps so the remote queue never grows
    # unbounded (CLAUDE.md: never flood the relay with unawaited work).
    _LOSS_FETCH_EVERY = 50
    _FROZEN_COMPS = ("vae", "text_encoder", "text_encoder_2")
    frozen_synced = False
    for epoch in range(start_epoch, cfg.num_epochs):
        epoch_t0 = time.time()
        losses: List[float] = []
        pending = []
        for batch in train_loader.epoch(epoch):
            batch_j = jax.tree.map(jnp.asarray, batch)
            if mesh is not None:
                batch_j = meshlib.shard_batch(batch_j, mesh)
            step_key = jax.random.fold_in(rng, global_step)
            state, metrics = step_fn(state, frozen, batch_j, context, step_key)
            pending.append(metrics["loss"])
            global_step += 1
            if len(pending) >= _LOSS_FETCH_EVERY:
                losses.extend(float(v) for v in jax.device_get(pending))
                pending = []
            if cfg.save_steps > 0 and global_step % cfg.save_steps == 0:
                losses.extend(float(v) for v in jax.device_get(pending))
                pending = []
                if _is_main():
                    cdir = os.path.join(output_dir, f"checkpoint-{global_step}")
                    ckpt.save_pipeline(cdir, {"unet": state.params},
                                       spec.model_config, fetcher=exporter.fetch)
                    logger.info("saved step checkpoint %s", cdir)
        losses.extend(float(v) for v in jax.device_get(pending))
        train_loss = float(np.mean(losses)) if losses else float("nan")

        current = {**params, "unet": state.params}
        vres = run_validation(
            modules, current, spec, val_loader, context, uncond,
            epoch + 1, output_dir, seed=cfg.seed, sampler_fn_cache=sampler_cache,
            log_input_baseline=(epoch == start_epoch),
        )
        val_metrics = vres.metrics
        logger.info(
            "epoch %d/%d loss %.4f val %s (%.1fs)",
            epoch + 1, cfg.num_epochs, train_loss,
            {k: round(v, 4) for k, v in val_metrics.items()},
            time.time() - epoch_t0,
        )
        if _is_main():
            _append_csv(csv_path, columns, {"epoch": epoch + 1, "train_loss": train_loss, **val_metrics})

        if vres.psnr > best_psnr:
            best_psnr = vres.psnr
            if _is_main():
                # Frozen components are written on the first best-save of
                # THIS process only — but components seeded via --vae_init
                # must overwrite whatever a previous run left in best/
                # (e.g. a random-init VAE from a run without --vae_init):
                # the UNet was trained against the seeded weights, and
                # serving it through stale frozen comps is silent garbage.
                skip = tuple(c for c in _FROZEN_COMPS
                             if frozen_synced or c not in seeded_comps)
                ckpt.save_pipeline(
                    os.path.join(output_dir, "best"), current, spec.model_config,
                    extra_meta={"val_psnr": best_psnr, "epoch": epoch + 1},
                    skip_existing=skip, fetcher=exporter.fetch,
                )
                frozen_synced = True
                logger.info("new best (psnr %.3f) -> %s/best", best_psnr, output_dir)

        if cfg.save_steps == 0 and _is_main():
            ckpt.save_pipeline(
                os.path.join(output_dir, f"checkpoint-epoch-{epoch+1}"),
                {"unet": state.params}, spec.model_config,
                fetcher=exporter.fetch,
            )
        # orbax coordinates multi-host itself: every process participates.
        # Cadence: every state_save_epochs epochs + always the final epoch
        # (async — the background commit overlaps the next epoch's compute).
        # -1 = never save the ~3.2GiB train state (throwaway runs on slow
        # disk; the best/ pipeline checkpoint is still written above).
        is_last = epoch + 1 == cfg.num_epochs
        if cfg.state_save_epochs >= 0 and (
            is_last
            or (
                cfg.state_save_epochs > 0
                and (epoch + 1 - start_epoch) % cfg.state_save_epochs == 0
            )
        ):
            train_ckpt.save(global_step, state, wait=is_last,
                            checksums=exporter.sums_dict(state))

    if _is_main():
        ckpt.save_pipeline(
            os.path.join(output_dir, "final"), {**params, "unet": state.params},
            spec.model_config, fetcher=exporter.fetch,
        )
    train_ckpt.wait()
    logger.info("training done in %.1fs; best val psnr %.3f", time.time() - t_start, best_psnr)
    return val_metrics
