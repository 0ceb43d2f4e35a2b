#!/usr/bin/env python3
"""Parse the stage-3 conv-kernel tile sweep (scripts/run_ab_queue3.sh output)
and print the winning env config for an end-to-end A/B, one VAR=VALUE per
line, e.g.:

    IRET_CONV_KERNEL=1
    IRET_CONV_KERNEL_HW=64,32
    IRET_CONV_TILE_M=512
    IRET_CONV_TILE_N=256

Selection: for each (tile_m, tile_n) block, sum the pallas-vs-XLA time
saved over the shapes where pallas wins (speedup > 1.02 — below that the
e2e effect drowns in relay noise). Pick the tile config with the largest
total saving; the HW gate lists the heights of its winning shapes.
Prints nothing (exit 1) if no config wins anywhere.
"""
import re
import sys

RESULT_RE = re.compile(
    r"^(\w+?)_(\d+)px_c\d+\S*:\s+xla\s+([\d.]+)ms\s+[\d.]+\s+TOPS\s+\|\s+"
    r"pallas\s+([\d.]+)ms\s+[\d.]+\s+TOPS\s+\|\s+speedup\s+([\d.]+)x"
)
TILE_RE = re.compile(r"^--- conv kernel tile_m=(\d+) tile_n=(\d+)")


def main():
    path = sys.argv[1] if len(sys.argv) > 1 else "/tmp/ab_results.txt"
    with open(path) as f:
        lines = f.read().splitlines()

    configs = {}  # (tm, tn) -> list of (height, xla_ms, pallas_ms)
    cur = None
    for ln in lines:
        m = TILE_RE.match(ln)
        if m:
            cur = (int(m.group(1)), int(m.group(2)))
            configs.setdefault(cur, [])
            continue
        m = RESULT_RE.match(ln.strip())
        if m and cur is not None:
            _, px, xla_ms, pl_ms, _ = m.groups()
            configs[cur].append((int(px), float(xla_ms), float(pl_ms)))

    best, best_saving, best_hw = None, 0.0, []
    for cfg, rows in configs.items():
        saving, hw = 0.0, []
        for px, xla_ms, pl_ms in rows:
            if xla_ms / pl_ms > 1.02:
                saving += xla_ms - pl_ms
                hw.append(px)
        if saving > best_saving:
            best, best_saving, best_hw = cfg, saving, sorted(set(hw), reverse=True)

    if best is None:
        print("# no tile config beats XLA on any shape", file=sys.stderr)
        sys.exit(1)
    print("IRET_CONV_KERNEL=1")
    print("IRET_CONV_KERNEL_HW=" + ",".join(str(h) for h in best_hw))
    print(f"IRET_CONV_TILE_M={best[0]}")
    print(f"IRET_CONV_TILE_N={best[1]}")


if __name__ == "__main__":
    main()
