#!/usr/bin/env python3
"""Optional cloud fine-tuning: package pairs + submit a remote training job.

Equivalent of the reference's scripts/train_with_replicate.py (:38-162):
zips the input/gt pairs for a task, then submits a fine-tune job to a remote
training endpoint. Network access and credentials are optional — the
packaging step always works locally, and submission is gated on
REPLICATE_API_TOKEN (same env var as the reference, train_with_replicate.py:91).

Without a token (or in air-gapped environments) use --zip_only: the archive
plus its manifest.json is everything a remote TPU worker needs to run
`scripts/train_<task>.py` on the unpacked data.
"""
import argparse
import json
import os
import sys
import zipfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from image_restoration_and_enhancement_tpu.tasks.registry import TASKS


def package_pairs(task: str, data_root: str, out_zip: str, split: str = "train") -> dict:
    spec = TASKS[task]
    base = os.path.join(data_root, spec.pair_dir, split)
    kinds = ["input", "gt"] + (["mask"] if spec.uses_mask else [])
    count = 0
    with zipfile.ZipFile(out_zip, "w", zipfile.ZIP_DEFLATED) as z:
        for kind in kinds:
            d = os.path.join(base, kind)
            if not os.path.isdir(d):
                raise FileNotFoundError(d)
            for name in sorted(os.listdir(d)):
                z.write(os.path.join(d, name), arcname=f"{kind}/{name}")
                count += 1
        manifest = {
            "task": task,
            "split": split,
            "kinds": kinds,
            "num_files": count,
            "train_script": f"scripts/train_{spec.model_dir}.py",
        }
        z.writestr("manifest.json", json.dumps(manifest, indent=2))
    return manifest


def submit_job(zip_path: str, manifest: dict, endpoint: str) -> None:
    token = os.environ.get("REPLICATE_API_TOKEN")
    if not token:
        raise SystemExit(
            "REPLICATE_API_TOKEN not set. The archive is ready at "
            f"{zip_path}; upload it to your training service manually or "
            "re-run with the token set."
        )
    import requests

    with open(zip_path, "rb") as f:
        resp = requests.post(
            endpoint,
            headers={"Authorization": f"Bearer {token}"},
            files={"data": f},
            data={"manifest": json.dumps(manifest)},
            timeout=300,
        )
    resp.raise_for_status()
    print("job submitted:", resp.json())


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--task", default="denoise", choices=list(TASKS))
    p.add_argument("--data_root", default="data/pairs")
    p.add_argument("--out_zip", default=None)
    p.add_argument("--endpoint", default="https://api.replicate.com/v1/trainings")
    p.add_argument("--zip_only", action="store_true")
    args = p.parse_args()

    out_zip = args.out_zip or f"outputs/cloud_{args.task}_train.zip"
    os.makedirs(os.path.dirname(out_zip), exist_ok=True)
    manifest = package_pairs(args.task, args.data_root, out_zip)
    print(f"packaged {manifest['num_files']} files -> {out_zip}")
    if not args.zip_only:
        submit_job(out_zip, manifest, args.endpoint)


if __name__ == "__main__":
    main()
