#!/usr/bin/env python3
"""Quantify layout-change / copy traffic in a dumped HLO text.

Finds (a) explicit copy/transpose ops, (b) kLoop fusions whose root is a
copy/transpose/bitcast-with-layout-change, sums their byte volume, and
groups by the op_name metadata so the model component responsible is
visible. Operates on /tmp/img2img_hlo.txt (see dump_hlo.py).
"""
import collections
import re
import sys

DT_BYTES = {"bf16": 2, "f32": 4, "f16": 2, "s32": 4, "u32": 4, "s8": 1, "u8": 1,
            "pred": 1, "s64": 8, "u64": 8, "f64": 8}

SHAPE_RE = re.compile(r"(\w+)\[([\d,]*)\]\{([\d,]+)")


def tensor_bytes(text):
    m = SHAPE_RE.search(text)
    if not m:
        return 0, None
    dt, dims, layout = m.groups()
    n = 1
    for d in dims.split(","):
        if d:
            n *= int(d)
    return n * DT_BYTES.get(dt, 4), layout


def main():
    path = sys.argv[1] if len(sys.argv) > 1 else "/tmp/img2img_hlo.txt"
    txt = open(path).read()
    lines = txt.splitlines()

    # collect fusion computation bodies: name -> list of op lines
    comps = {}
    cur = None
    for ln in lines:
        m = re.match(r"%(\S+) \(", ln)
        if ln.startswith("%fused_") or ln.startswith("%bitcast_fusion") or ln.startswith("%copy_fusion"):
            m2 = re.match(r"%([\w\.\-]+)", ln)
            cur = m2.group(1)
            comps[cur] = []
        elif cur is not None:
            if ln.strip() == "}":
                cur = None
            else:
                comps[cur].append(ln)

    # classify each fusion computation: is it a pure copy/transpose/convert?
    pure_copy_comps = {}
    for name, body in comps.items():
        real = [b for b in body if "parameter(" not in b and " = " in b]
        if not real:
            continue
        kinds = set()
        for b in real:
            m2 = re.search(r" = \S+ (\w+)\(", b)
            if m2:
                kinds.add(m2.group(1))
        if kinds <= {"copy", "transpose", "bitcast", "convert", "reshape", "broadcast"}:
            root = real[-1]
            nbytes, layout = tensor_bytes(root)
            meta = ""
            for b in reversed(real):
                mm = re.search(r'op_name="([^"]*)"', b)
                if mm:
                    meta = mm.group(1)
                    break
            pure_copy_comps[name] = (nbytes, kinds, meta)

    # walk the main computation: explicit copies + fusions calling pure-copy
    # comps. Ops inside the while-body computation execute once per sampler
    # step — weight them by STEPS (default 20) for true traffic.
    steps = int(sys.argv[2]) if len(sys.argv) > 2 else 20
    by_src = collections.Counter()
    by_kind = collections.Counter()
    total = 0
    n_ops = 0
    for ln in lines:
        m = re.search(r" = \S+ (copy|transpose)\(", ln)
        nbytes = 0
        tag = None
        meta_fallback = ""
        if m:
            nbytes, _ = tensor_bytes(ln)
            tag = m.group(1)
        else:
            m2 = re.search(r"fusion\(.*calls=%([\w\.\-]+)", ln)
            if m2 and m2.group(1) in pure_copy_comps:
                nbytes, kinds, meta_fallback = pure_copy_comps[m2.group(1)]
                tag = "relayout-fusion:" + ",".join(sorted(kinds))
        if not tag or nbytes < 1 << 20:
            continue
        if "while/body" in ln or "while/body" in meta_fallback:
            nbytes *= steps
        src = "?"
        msrc = re.search(r'op_name="([^"]*)"', ln)
        if not msrc and meta_fallback:
            msrc = re.search(r'(.*)', meta_fallback)
        if msrc:
            parts = msrc.group(1).split("/")
            keep = [p for p in parts if not p.startswith(("jit(", "while", "body",
                                                          "closed", "branch", "cond"))]
            src = "/".join(keep[-4:]) if keep else msrc.group(1)[-60:]
        total += nbytes
        n_ops += 1
        by_kind[tag] += nbytes
        by_src[src] += nbytes

    print(f"TOTAL copy/relayout bytes per program execution (>=1MB ops): "
          f"{total/1e9:.2f} GB over {n_ops} ops")
    print("NOTE: ops inside the while body execute once per step (x20).")
    print("\n-- by kind --")
    for k, v in by_kind.most_common():
        print(f"  {v/1e6:10.1f} MB  {k}")
    print("\n-- by source (top 30) --")
    for k, v in by_src.most_common(30):
        print(f"  {v/1e6:10.1f} MB  {k}")


if __name__ == "__main__":
    main()
