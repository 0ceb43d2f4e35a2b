#!/usr/bin/env python3
"""Download a COCO-2017 subset and split into data/clean/{train,val,test}.

Equivalent of the reference's scripts/download_coco_subset.py (:24-193):
streams the val2017 (or train2017) zip, samples N images with a fixed seed,
and writes the three splits. Gated on network availability — in air-gapped
environments use --from_dir to split an existing local image folder instead.
"""
import argparse
import io
import os
import random
import shutil
import sys
import zipfile

COCO_URLS = {
    "val2017": "http://images.cocodataset.org/zips/val2017.zip",
    "train2017": "http://images.cocodataset.org/zips/train2017.zip",
}


def download_and_extract(split: str, dest: str) -> str:
    import requests

    url = COCO_URLS[split]
    zip_path = os.path.join(dest, f"{split}.zip")
    os.makedirs(dest, exist_ok=True)
    if not os.path.exists(zip_path):
        print(f"downloading {url} ...")
        with requests.get(url, stream=True, timeout=60) as r:
            r.raise_for_status()
            with open(zip_path + ".tmp", "wb") as f:
                for chunk in r.iter_content(chunk_size=1 << 20):
                    f.write(chunk)
        os.rename(zip_path + ".tmp", zip_path)
    out_dir = os.path.join(dest, split)
    if not os.path.isdir(out_dir):
        print("extracting ...")
        with zipfile.ZipFile(zip_path) as z:
            z.extractall(dest)
    return out_dir


def split_images(src_dir: str, out_root: str, counts, seed: int):
    names = sorted(
        n for n in os.listdir(src_dir) if n.lower().endswith((".jpg", ".jpeg", ".png"))
    )
    rng = random.Random(seed)
    rng.shuffle(names)
    total = sum(counts.values())
    if len(names) < total:
        print(f"WARNING: only {len(names)} images available for {total} requested")
    idx = 0
    for split, n in counts.items():
        dest = os.path.join(out_root, split)
        os.makedirs(dest, exist_ok=True)
        for name in names[idx : idx + n]:
            shutil.copy2(os.path.join(src_dir, name), os.path.join(dest, name))
        print(f"  {split}: {min(n, max(0, len(names)-idx))} images")
        idx += n


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--out_root", default="data/clean")
    p.add_argument("--cache_dir", default="data/coco_cache")
    p.add_argument("--coco_split", default="val2017", choices=list(COCO_URLS))
    p.add_argument("--num_train", type=int, default=2000)
    p.add_argument("--num_val", type=int, default=200)
    p.add_argument("--num_test", type=int, default=100)
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--from_dir", default=None,
                   help="split a local folder instead of downloading")
    args = p.parse_args()

    if args.from_dir:
        src = args.from_dir
    else:
        try:
            src = download_and_extract(args.coco_split, args.cache_dir)
        except Exception as e:
            print(f"ERROR: download failed ({e}). In air-gapped environments "
                  f"use --from_dir with a local image folder.")
            sys.exit(1)
    split_images(
        src, args.out_root,
        {"train": args.num_train, "val": args.num_val, "test": args.num_test},
        args.seed,
    )
    print("done.")


if __name__ == "__main__":
    main()
