#!/usr/bin/env python3
"""Pretrain the AutoencoderKL on the clean-image splits (reconstruction).

Air-gapped stand-in for the pretrained SD1.5 VAE the reference freezes
(reference: scripts/train_denoising.py:219,:248-249 — from_pretrained +
requires_grad_(False)). The four task trainers consume the result via
`--vae_init outputs/models/vae_pretrained/best` so the frozen
encode/decode path is meaningful and validation PSNR can track UNet
learning. See train/vae_pretrain.py for the objective.
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--data_root", default="data/clean",
                   help="Root with {train,val} image folders")
    p.add_argument("--output_dir", default="outputs/models/vae_pretrained")
    p.add_argument("--num_epochs", type=int, default=20)
    p.add_argument("--batch_size", type=int, default=8)
    p.add_argument("--learning_rate", type=float, default=1e-4)
    p.add_argument("--image_size", type=int, default=256)
    p.add_argument("--kl_weight", type=float, default=1e-6)
    p.add_argument("--scale_weight", type=float, default=0.1)
    p.add_argument("--max_train_samples", type=int, default=None)
    p.add_argument("--max_val_samples", type=int, default=None)
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--no_mesh", action="store_true")
    p.add_argument("--base_model", default="sd15", choices=["sd15", "tiny_sd"])
    p.add_argument("--init_from", default=None,
                   help="Pipeline dir (e.g. a previous run's best/) to "
                        "continue from instead of random init")
    args = p.parse_args()

    from image_restoration_and_enhancement_tpu import config as C
    from image_restoration_and_enhancement_tpu.train.vae_pretrain import (
        VAEPretrainConfig, pretrain_vae,
    )

    cfg = VAEPretrainConfig(
        num_epochs=args.num_epochs,
        batch_size=args.batch_size,
        learning_rate=args.learning_rate,
        image_size=args.image_size,
        kl_weight=args.kl_weight,
        scale_weight=args.scale_weight,
        seed=args.seed,
    )
    metrics = pretrain_vae(
        data_root=args.data_root,
        output_dir=args.output_dir,
        cfg=cfg,
        model_config={"sd15": C.SD15, "tiny_sd": C.TINY_SD}[args.base_model],
        max_train_samples=args.max_train_samples,
        max_val_samples=args.max_val_samples,
        use_mesh=not args.no_mesh,
        init_from=args.init_from,
    )
    print({k: round(v, 4) for k, v in metrics.items()})


if __name__ == "__main__":
    main()
