"""VAE reconstruction pretraining — air-gapped stand-in for SD1.5's VAE.

The reference freezes a PRETRAINED AutoencoderKL and only fine-tunes the
UNet (reference: scripts/train_denoising.py:248-249; the VAE comes from
runwayml/stable-diffusion-v1-5 via from_pretrained, :219). In this
air-gapped environment no pretrained weights exist, so a random-init
frozen VAE makes the whole sampling pipeline decode noise — validation
PSNR can never reflect UNet learning (measured in the round-2 real run:
val PSNR flat at ~8.4 from epoch 1). This module pretrains the VAE on the
clean images with a reconstruction objective so the frozen encode/decode
path is meaningful, then the four task trainers seed it via
`train_task(vae_init=...)`.

Objective (standard KL-VAE recipe, adapted for the pinned scaling
factor): L2 reconstruction + tiny KL + a latent-scale penalty that pushes
`Var(z * scaling_factor) -> 1`. The diffusion process assumes scaled
latents with roughly unit variance (`add_noise` mixes them with N(0,1)
noise at the config's fixed scaling_factor 0.18215 — SD picked that
number as 1/std of ITS VAE's latents; here the VAE learns to match the
pinned number instead).

TPU-native: one jitted train step (bf16 compute / fp32 params), data
sharded over the mesh `data` axis when more than one device is present.
"""
from __future__ import annotations

import csv
import dataclasses
import logging
import os
import time
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import NamedSharding, PartitionSpec as P

from .. import config as C
from ..core import checkpoint as ckpt
from ..metrics import functional as F
from ..models.vae import AutoencoderKL
from ..parallel import mesh as meshlib
from ..data.datasets import IMG_EXTS, BatchLoader, _load_rgb
from .. import native

logger = logging.getLogger(__name__)


@dataclasses.dataclass(frozen=True)
class VAEPretrainConfig:
    num_epochs: int = 20
    batch_size: int = 8
    learning_rate: float = 1e-4
    weight_decay: float = 0.0
    max_grad_norm: float = 1.0
    warmup_frac: float = 0.05
    image_size: int = 256
    seed: int = 42
    # tiny KL keeps the posterior well-formed without fighting recon
    # (same role as SD's ~1e-6 KL weight)
    kl_weight: float = 1e-6
    # pushes E[(z*sf)^2] -> 1 so the pinned scaling_factor is correct
    scale_weight: float = 0.1


class ImageFolderDataset:
    """Flat folder of images -> {"image": [-1,1] HWC float32}."""

    def __init__(self, directory: str, image_size: int = 256,
                 max_samples: Optional[int] = None):
        self.image_size = image_size
        names = [
            n for n in sorted(os.listdir(directory))
            if os.path.splitext(n)[1].lower() in IMG_EXTS
        ] if os.path.isdir(directory) else []
        if max_samples is not None:
            names = names[:max_samples]
        self.paths = [os.path.join(directory, n) for n in names]
        if not self.paths:
            raise FileNotFoundError(f"No images under {directory}")

    def __len__(self) -> int:
        return len(self.paths)

    def __getitem__(self, idx: int) -> Dict[str, np.ndarray]:
        img = _load_rgb(self.paths[idx]).astype(np.float32)
        size = self.image_size
        if img.shape[:2] != (size, size):
            img = native.resize_bicubic(img, (size, size))
        return {"image": np.clip(img / 127.5 - 1.0, -1.0, 1.0).astype(np.float32)}


def make_vae_train_step(vae: AutoencoderKL, sf: float, cfg: VAEPretrainConfig,
                        num_steps: int, mesh=None):
    schedule = optax.warmup_cosine_decay_schedule(
        init_value=0.0, peak_value=cfg.learning_rate,
        warmup_steps=max(1, int(num_steps * cfg.warmup_frac)),
        decay_steps=max(2, num_steps), end_value=0.0,
    )
    tx = optax.chain(
        optax.clip_by_global_norm(cfg.max_grad_norm),
        optax.adamw(schedule, weight_decay=cfg.weight_decay),
    )

    def loss_fn(params, batch, key):
        x = batch["image"]
        post = vae.apply({"params": params}, x, method=vae.encode)
        z = post.sample(key)
        recon = vae.apply({"params": params}, z, method=vae.decode)
        recon_mse = jnp.mean((recon - x) ** 2)
        # expected scaled second moment (deterministic; smoother than the
        # sampled z's) — the log-square penalty has its minimum at 1
        msq = jnp.mean((post.mean ** 2 + jnp.exp(post.logvar)) * sf * sf)
        scale_pen = jnp.log(msq) ** 2
        kl = 0.5 * jnp.mean(
            (post.mean ** 2 + jnp.exp(post.logvar)) * sf * sf
            - 1.0 - post.logvar - 2.0 * jnp.log(sf)
        )
        loss = recon_mse + cfg.scale_weight * scale_pen + cfg.kl_weight * kl
        return loss, {"loss": loss, "recon_mse": recon_mse, "scaled_msq": msq}

    def step(params, opt_state, batch, key):
        (_, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params, batch, key
        )
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, metrics

    if mesh is None:
        return tx, jax.jit(step, donate_argnums=(0, 1))
    repl = NamedSharding(mesh, P())
    data = NamedSharding(mesh, P("data"))
    return tx, jax.jit(
        step,
        in_shardings=(repl, repl, data, repl),
        out_shardings=(repl, repl, repl),
        donate_argnums=(0, 1),
    )


def pretrain_vae(
    data_root: str = "data/clean",
    output_dir: str = "outputs/models/vae_pretrained",
    cfg: VAEPretrainConfig = VAEPretrainConfig(),
    model_config: Optional[C.SDModelConfig] = None,
    max_train_samples: Optional[int] = None,
    max_val_samples: Optional[int] = None,
    use_mesh: bool = True,
    dtype=jnp.bfloat16,
    init_from: Optional[str] = None,
) -> Dict[str, float]:
    """Pretrain the AutoencoderKL on data_root/{train,val}. Returns the
    final validation metrics; writes best/final pipeline checkpoints with a
    `vae` component plus metrics_vae.csv (epoch, psnr, latent_std,
    train_loss)."""
    model_config = model_config or C.SD15
    os.makedirs(output_dir, exist_ok=True)
    # Shared helper replaces (not stacks) any previous run's file handler,
    # so a train_task in the same process is not duplicated into this log.
    from .trainer import _setup_logging

    _setup_logging(output_dir, "vae")

    sf = model_config.vae.scaling_factor
    vae = AutoencoderKL(model_config.vae, dtype=dtype)
    rng = jax.random.PRNGKey(cfg.seed)
    params = vae.init(
        rng, jnp.zeros((1, cfg.image_size, cfg.image_size, 3), jnp.float32)
    )["params"]
    if init_from:
        # continue from a previous pretrain's best/ (optimizer state restarts;
        # pass a reduced learning_rate for a gentle continuation)
        loaded = ckpt.load_pipeline(init_from)
        if "vae" not in loaded:
            raise FileNotFoundError(f"no vae component under {init_from}")
        params = jax.tree.map(
            lambda ref, new: jnp.asarray(new, ref.dtype), params, loaded["vae"]
        )
        logger.info("initialized VAE params from %s", init_from)
    n_params = sum(int(np.prod(p.shape)) for p in jax.tree.leaves(params))
    logger.info("=== VAE pretrain -> %s (%d params) ===", output_dir, n_params)
    t_start = time.time()

    train_ds = ImageFolderDataset(
        os.path.join(data_root, "train"), cfg.image_size, max_train_samples)
    val_ds = ImageFolderDataset(
        os.path.join(data_root, "val"), cfg.image_size, max_val_samples)
    train_loader = BatchLoader(train_ds, cfg.batch_size, seed=cfg.seed)
    val_loader = BatchLoader(val_ds, min(cfg.batch_size, 4), shuffle=False,
                             drop_last=False)
    logger.info("train images: %d, val images: %d", len(train_ds), len(val_ds))

    mesh = None
    if use_mesh and jax.device_count() > 1 and cfg.batch_size % jax.device_count() == 0:
        mesh = meshlib.make_mesh()
        logger.info("data-parallel mesh over %d devices", jax.device_count())

    num_steps = max(1, len(train_loader) * cfg.num_epochs)
    tx, step_fn = make_vae_train_step(vae, sf, cfg, num_steps, mesh=mesh)
    # verified save-time export path, pre-compiled before the first
    # optimizer step (core/checkpoint.ParamExporter)
    exporter = ckpt.ParamExporter()
    exporter.prepare(params)
    opt_state = tx.init(params)

    @jax.jit
    def recon_fn(params, x):
        post = vae.apply({"params": params}, x, method=vae.encode)
        return vae.apply({"params": params}, post.mean, method=vae.decode), post.mean

    csv_path = os.path.join(output_dir, "metrics_vae.csv")
    columns = ["epoch", "psnr", "latent_std", "train_loss"]
    best_psnr = float("-inf")
    global_step = 0
    val_metrics: Dict[str, float] = {}
    _FETCH_EVERY = 50
    for epoch in range(cfg.num_epochs):
        epoch_t0 = time.time()
        losses: List[float] = []
        pending = []
        for batch in train_loader.epoch(epoch):
            batch_j = jax.tree.map(jnp.asarray, batch)
            if mesh is not None:
                batch_j = meshlib.shard_batch(batch_j, mesh)
            key = jax.random.fold_in(rng, global_step)
            params, opt_state, metrics = step_fn(params, opt_state, batch_j, key)
            pending.append(metrics["loss"])
            global_step += 1
            if len(pending) >= _FETCH_EVERY:
                losses.extend(float(v) for v in jax.device_get(pending))
                pending = []
        losses.extend(float(v) for v in jax.device_get(pending))
        train_loss = float(np.mean(losses)) if losses else float("nan")

        # validation: deterministic (mode) round-trip PSNR + latent scale
        psnrs: List[float] = []
        stds: List[float] = []
        for batch in val_loader.epoch(0):
            x = jnp.asarray(batch["image"])
            recon, z = recon_fn(params, x)
            recon = np.asarray(recon)
            stds.append(float(np.asarray(jnp.std(z))) * sf)
            for p, g in zip((recon + 1) / 2, (batch["image"] + 1) / 2):
                psnrs.append(float(F.psnr(jnp.asarray(p), jnp.asarray(g))))
        val_psnr = float(np.mean(psnrs))
        latent_std = float(np.mean(stds))
        val_metrics = {"psnr": val_psnr, "latent_std": latent_std}
        logger.info(
            "epoch %d/%d loss %.4f val psnr %.3f scaled-latent std %.3f (%.1fs)",
            epoch + 1, cfg.num_epochs, train_loss, val_psnr, latent_std,
            time.time() - epoch_t0,
        )
        exists = os.path.exists(csv_path)
        with open(csv_path, "a", newline="") as f:
            w = csv.DictWriter(f, fieldnames=columns)
            if not exists:
                w.writeheader()
            w.writerow({"epoch": epoch + 1, "psnr": round(val_psnr, 4),
                        "latent_std": round(latent_std, 4),
                        "train_loss": round(train_loss, 6)})
        if val_psnr > best_psnr:
            best_psnr = val_psnr
            ckpt.save_pipeline(
                os.path.join(output_dir, "best"), {"vae": params}, model_config,
                extra_meta={"val_psnr": best_psnr, "epoch": epoch + 1,
                            "latent_std": latent_std},
                fetcher=exporter.fetch,
            )
            logger.info("new best (psnr %.3f) -> %s/best", best_psnr, output_dir)

    ckpt.save_pipeline(os.path.join(output_dir, "final"), {"vae": params},
                       model_config, fetcher=exporter.fetch)
    logger.info("VAE pretrain done in %.1fs; best val psnr %.3f",
                time.time() - t_start, best_psnr)
    return val_metrics
