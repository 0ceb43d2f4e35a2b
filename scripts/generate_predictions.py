#!/usr/bin/env python3
"""Run the RestorationPipeline over the test split and save final outputs.

Equivalent of the reference's scripts/generate_predictions.py (:15-100),
without its latent `backend=` kwarg bug (:18 — documented in SURVEY §2.1 #14).
Writes outputs/predictions/{task}/ for evaluate_model.py.
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from PIL import Image

from image_restoration_and_enhancement_tpu.infer.pipeline import RestorationPipeline
from image_restoration_and_enhancement_tpu.tasks.registry import TASKS


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--data_root", default="data/pairs")
    p.add_argument("--out_root", default="outputs/predictions")
    p.add_argument("--models_root", default="outputs/models")
    p.add_argument("--tasks", nargs="+", default=list(TASKS), choices=list(TASKS))
    p.add_argument("--split", default="test")
    p.add_argument("--max_images", type=int, default=None)
    p.add_argument("--max_size", type=int, default=1024,
                   help="resolution cap (reference's >1MP guard); raise it "
                        "together with --spatial_shards for high-res runs")
    p.add_argument("--spatial_shards", type=int, default=0,
                   help="shard each image's height over this many chips "
                        "(sequence parallelism for vision; docs/SERVING.md)")
    # serving-mode pass-throughs (docs/SERVING.md §3-4b); the approximate
    # modes (--cfg_cache >1, --tome >0) are opt-in and should be
    # quality-gated with scripts/eval_quant_quality.py first
    p.add_argument("--quant", default=None,
                   choices=["none", "int8", "int8_static"])
    p.add_argument("--quant_calib", default=None,
                   help="calibration JSON from scripts/calibrate_quant.py "
                        "(required for int8_static)")
    p.add_argument("--cfg_cache", type=int, default=1)
    p.add_argument("--tome", type=float, default=0.0)
    p.add_argument("--denoise_guidance", type=float, default=None,
                   help="override the denoise CFG scale (gs<=1 disables the "
                        "uncond branch; restoration fidelity wants low gs)")
    p.add_argument("--denoise_strength", type=float, default=0.5,
                   help="Serving strength for the denoise task (reference "
                        "default 0.5, src/inference.py:486-494; the hard-"
                        "degradation runs serve at <=0.15 — the measured "
                        "restoration point, docs/artifacts/demo_learning_v2)")
    args = p.parse_args()

    mesh_kwargs = {}
    if args.spatial_shards > 1:
        import jax

        from image_restoration_and_enhancement_tpu.parallel import mesh as meshlib

        mesh_kwargs = {
            "mesh": meshlib.make_mesh(
                (args.spatial_shards,), ("sp",),
                devices=jax.devices()[: args.spatial_shards],
            ),
            "spatial_axis": "sp",
        }
    pipeline = RestorationPipeline(models_root=args.models_root,
                                   max_size=args.max_size,
                                   quant=args.quant,
                                   quant_calib=args.quant_calib,
                                   cfg_cache_interval=args.cfg_cache,
                                   tome_ratio=args.tome, **mesh_kwargs)
    for task in args.tasks:
        spec = TASKS[task]
        in_dir = os.path.join(args.data_root, spec.pair_dir, args.split, "input")
        mask_dir = os.path.join(args.data_root, spec.pair_dir, args.split, "mask")
        out_dir = os.path.join(args.out_root, spec.pair_dir)
        os.makedirs(out_dir, exist_ok=True)
        if not os.path.isdir(in_dir):
            print(f"[{task}] no inputs at {in_dir}, skipping")
            continue
        names = sorted(os.listdir(in_dir))[: args.max_images]
        print(f"[{task}] {len(names)} images")
        for name in names:
            img = Image.open(os.path.join(in_dir, name)).convert("RGB")
            kwargs = {"denoise_strength": args.denoise_strength,
                      "denoise_guidance": args.denoise_guidance}
            if spec.uses_mask:
                mpath = os.path.join(mask_dir, name)
                if os.path.exists(mpath):
                    kwargs["mask"] = Image.open(mpath).convert("L")
            result = pipeline.process(img, [task], **kwargs)
            result["final"].save(os.path.join(out_dir, name))
    print("done.")


if __name__ == "__main__":
    main()
