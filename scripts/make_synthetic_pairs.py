#!/usr/bin/env python3
"""Generate synthetic degraded/clean training pairs for all four tasks.

CLI-compatible equivalent of the reference's scripts/make_synthetic_pairs.py
(:197-262): reads data/clean/{train,val,test}, writes
data/pairs/{task}/{split}/{input,gt[,mask]} with the same degradations
(see image_restoration_and_enhancement_tpu/data/host_degradations.py).
"""
import argparse
import os
import sys

import numpy as np
from PIL import Image

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from image_restoration_and_enhancement_tpu.data import host_degradations as hd
from image_restoration_and_enhancement_tpu.data.datasets import IMG_EXTS

ALL_TASKS = ["denoise", "sr", "colorize", "inpaint"]


def process_split(clean_dir, out_root, split, args):
    src = os.path.join(clean_dir, split)
    if not os.path.isdir(src):
        print(f"WARNING: no clean images at {src}")
        return
    names = sorted(
        n for n in os.listdir(src) if os.path.splitext(n)[1].lower() in IMG_EXTS
    )
    print(f"[{split}] {len(names)} images")
    rng = np.random.default_rng(args.seed + hash(split) % 1000)

    def outdir(task, kind):
        d = os.path.join(out_root, task, split, kind)
        os.makedirs(d, exist_ok=True)
        return d

    for name in names:
        img = np.array(Image.open(os.path.join(src, name)).convert("RGB"))
        img = hd.resize_to_max_size(img, args.max_size)
        stem = os.path.splitext(name)[0]

        if "denoise" in args.tasks:
            noisy = hd.degrade_denoise(rng, img, args.denoise_with_artifacts,
                                       tuple(args.denoise_sigma))
            Image.fromarray(noisy).save(os.path.join(outdir("denoise", "input"), name))
            Image.fromarray(img).save(os.path.join(outdir("denoise", "gt"), name))

        if "sr" in args.tasks:
            task = f"sr_x{args.sr_scale}"
            lr = hd.degrade_sr(rng, img, args.sr_scale, args.sr_with_jpeg,
                               args.sr_with_motion_blur)
            Image.fromarray(lr).save(os.path.join(outdir(task, "input"), name))
            Image.fromarray(img).save(os.path.join(outdir(task, "gt"), name))

        if "colorize" in args.tasks:
            gray = hd.to_grayscale(img)
            Image.fromarray(gray).save(
                os.path.join(outdir("colorize", "input"), stem + ".png")
            )
            Image.fromarray(img).save(os.path.join(outdir("colorize", "gt"), name))

        if "inpaint" in args.tasks:
            masked, mask = hd.inpaint_pair(rng, img, args.inpaint_easy_ratio)
            Image.fromarray(masked).save(os.path.join(outdir("inpaint", "input"), name))
            Image.fromarray(mask).save(os.path.join(outdir("inpaint", "mask"), name))
            Image.fromarray(img).save(os.path.join(outdir("inpaint", "gt"), name))


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--clean_root", default="data/clean")
    p.add_argument("--out_root", default="data/pairs")
    p.add_argument("--splits", nargs="+", default=["train", "val", "test"])
    p.add_argument("--tasks", nargs="+", default=ALL_TASKS, choices=ALL_TASKS)
    p.add_argument("--sr_scale", type=int, default=4)
    p.add_argument("--max_size", type=int, default=1024)
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--denoise_with_artifacts", action="store_true")
    p.add_argument("--denoise_sigma", type=float, nargs=2, default=[5.0, 8.0],
                   metavar=("MIN", "MAX"),
                   help="Gaussian noise sigma range for the denoise family "
                        "(reference [5,8]; >=40 = the hard family whose "
                        "do-nothing baseline is actually beatable)")
    p.add_argument("--sr_with_jpeg", action="store_true")
    p.add_argument("--sr_with_motion_blur", action="store_true")
    p.add_argument("--inpaint_easy_ratio", type=float, default=0.7)
    args = p.parse_args()

    for split in args.splits:
        process_split(args.clean_root, args.out_root, split, args)
    print("done.")


if __name__ == "__main__":
    main()
