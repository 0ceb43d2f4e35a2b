#!/usr/bin/env python3
"""Host-side BatchLoader throughput: native C++ preprocessing on vs off.

VERDICT r3 #6: `native/` must either earn its place in the data hot path
with a measured host-time win on a real 256px train epoch, or be capped.
This measures, on the 1-core host the chain trains on:

  1. decode-only floor (PIL open+convert -> u8 array): the part no
     preprocessing backend can change
  2. the shipping PairDataset.__getitem__ path
  3. the same path with IRET_NATIVE_NORM=0 (numpy normalize fallback)

and reports items/s plus the preprocess-only (item - decode) cost per
sample. Pure CPU — never touches the TPU relay.
"""
import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--data_root", default="data/pairs")
    p.add_argument("--task", default="denoise")
    p.add_argument("--split", default="train")
    p.add_argument("--image_size", type=int, default=256)
    p.add_argument("--n", type=int, default=512)
    p.add_argument("--batch_size", type=int, default=8)
    args = p.parse_args()

    from image_restoration_and_enhancement_tpu.data.datasets import (
        BatchLoader, PairDataset, _load_rgb,
    )

    ds = PairDataset(args.task, args.data_root, args.split, args.image_size,
                     max_samples=args.n)
    n = len(ds)

    # 1. decode floor
    t0 = time.perf_counter()
    for inp_path, gt_path, _ in ds.items:
        _load_rgb(inp_path)
        _load_rgb(gt_path)
    t_decode = time.perf_counter() - t0

    def time_epoch():
        loader = BatchLoader(ds, args.batch_size, shuffle=False, prefetch=False)
        t0 = time.perf_counter()
        for batch in loader.epoch(0):
            pass
        return time.perf_counter() - t0

    results = {}
    # alternate and repeat: the first epoch pays page-cache warmup, so a
    # single A/B ordering is biased — keep the best of two per backend
    for label, env in [("native", None), ("numpy", "0"),
                       ("native2", None), ("numpy2", "0")]:
        if env is None:
            os.environ.pop("IRET_NATIVE_NORM", None)
        else:
            os.environ["IRET_NATIVE_NORM"] = env
        # warm one item (lazy .so build)
        ds[0]
        results[label] = time_epoch()
    os.environ.pop("IRET_NATIVE_NORM", None)

    print(f"samples: {n} (pairs), decode floor: {n / t_decode:.1f} pairs/s "
          f"({1e3 * t_decode / n:.2f} ms/pair)")
    for label, dt in results.items():
        prep = dt - t_decode
        print(f"{label:7s}: {n / dt:.1f} pairs/s total "
              f"({1e3 * dt / n:.2f} ms/pair; preprocess-only "
              f"{1e3 * prep / n:.2f} ms/pair)")
    results = {"native": min(results["native"], results["native2"]),
               "numpy": min(results["numpy"], results["numpy2"])}
    speedup = results["numpy"] / results["native"]
    prep_np = results["numpy"] - t_decode
    prep_nat = results["native"] - t_decode
    print(f"native vs numpy: {speedup:.3f}x end-to-end; preprocess-only "
          f"{prep_np / max(prep_nat, 1e-9):.2f}x")


if __name__ == "__main__":
    main()
