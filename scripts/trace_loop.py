#!/usr/bin/env python3
"""Capture a device trace of the img2img loop and aggregate XLA op time.

Writes a perfetto trace via jax.profiler, then parses the trace.json.gz
directly (no tensorboard needed) and prints device time grouped into
categories: attention kernels, convolutions, norm/elementwise fusions,
copies/transposes, etc. Use to find where the 20-step loop's time goes.

Env: TRACE_BATCH (8), TRACE_SIZE (512), TRACE_STEPS (20), TRACE_ATTN.
"""
import collections
import glob
import gzip
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from image_restoration_and_enhancement_tpu import config as C
from image_restoration_and_enhancement_tpu.core import sampling

TRACE_DIR = "/tmp/jax_trace_loop"


def categorize(name: str) -> str:
    n = name.lower()
    if "custom-call" in n or "fused_attention" in n or "pallas" in n:
        return "pallas-attn/custom-call"
    if "convolution" in n or "conv" in n:
        return "convolution"
    if "dot" in n or "einsum" in n or "matmul" in n:
        return "matmul"
    if "transpose" in n or "copy" in n or "reshape" in n or "pad" in n:
        return "copy/transpose/pad"
    if "reduce" in n:
        return "reduce(norm-stats)"
    if "fusion" in n:
        return "elementwise-fusion"
    if "dynamic" in n or "slice" in n or "concatenate" in n or "gather" in n:
        return "slice/concat"
    if "rng" in n or "random" in n:
        return "rng"
    if "all-reduce" in n or "collective" in n:
        return "collective"
    return "other"


def run_and_trace():
    batch = int(os.environ.get("TRACE_BATCH", "8"))
    steps = int(os.environ.get("TRACE_STEPS", "20"))
    size = int(os.environ.get("TRACE_SIZE", "512"))
    attn = os.environ.get("TRACE_ATTN") or None

    modules = sampling.SDModules.create(C.SD15, dtype=jnp.bfloat16,
                                        attention_backend=attn)
    params = sampling.init_params(modules, jax.random.PRNGKey(0), image_size=size)
    params = jax.tree.map(lambda x: x.astype(jnp.bfloat16), params)
    fn = sampling.make_img2img_fn(modules, steps, 1.0, 5.0, sampler="ddim")
    image = jnp.zeros((batch, size, size, 3), jnp.float32)
    ctx = sampling.encode_text(modules, params, jnp.zeros((batch, 77), jnp.int32))
    key = jax.random.PRNGKey(42)

    out = fn(params, image, ctx, ctx, key)  # compile+warm
    _ = float(jnp.mean(out))

    # dump the HLO of the SAME executable so trace fusion names can be
    # categorized by their actual content (fusion numbering is per-compile;
    # a separate dump_hlo.py run does not line up)
    try:
        txt = fn.lower(params, image, ctx, ctx, key).compile().as_text()
        with open("/tmp/trace_loop_hlo.txt", "w") as f:
            f.write(txt)
    except Exception as e:  # noqa: BLE001
        print(f"(hlo dump failed: {e})")

    os.system(f"rm -rf {TRACE_DIR}")
    with jax.profiler.trace(TRACE_DIR):
        out = fn(params, out, ctx, ctx, key)
        _ = float(jnp.mean(out))
    return batch, steps


def build_hlo_category_map(path="/tmp/trace_loop_hlo.txt"):
    """fusion/op name -> category, from the executable's own HLO text.

    A fusion's category comes from its called computation's body ops:
    convolution > dot > exp(softmax) > reduce > copy/transpose > other."""
    if not os.path.exists(path):
        return {}
    with open(path) as f:
        txt = f.read()
    import re as _re
    # computation name -> body text
    comps = {}
    for m in _re.finditer(r"^%?([\w.\-]+) \([^)]*\) -> [^{]+\{(.*?)^\}",
                          txt, _re.M | _re.S):
        comps[m.group(1)] = m.group(2)
    name_cat = {}
    for m in _re.finditer(
            r"%([\w.\-]+) = [^\n]*? fusion\(([^)]*)\)[^\n]*?calls=%([\w.\-]+)",
            txt):
        name, _, comp = m.groups()
        body = comps.get(comp, "")
        if " convolution(" in body or "%convolution" in body:
            cat = "conv(+fused-epilogue)"
        elif "dot(" in body:
            cat = "matmul(+fused-epilogue)"
        elif "exponential(" in body:
            cat = "softmax/exp"
        elif "round-nearest" in body or ("convert" in body and "s8" in body):
            cat = "quantize"
        elif "reduce(" in body or "reduce-window" in body:
            cat = "reduce(stats/absmax)"
        elif "transpose(" in body or "copy(" in body:
            cat = "copy/transpose"
        else:
            cat = "elementwise"
        name_cat[name] = cat
    # non-fusion standalone ops
    for m in _re.finditer(r"%([\w.\-]+) = [^\n]*? (convolution|dot|copy|"
                          r"transpose|reduce|exponential)\(", txt):
        name, op = m.groups()
        name_cat.setdefault(name, {
            "convolution": "conv(+fused-epilogue)", "dot": "matmul(+fused-epilogue)",
            "copy": "copy/transpose", "transpose": "copy/transpose",
            "reduce": "reduce(stats/absmax)", "exponential": "softmax/exp",
        }[op])
    return name_cat


def analyze(batch, steps):
    paths = glob.glob(f"{TRACE_DIR}/**/*.trace.json.gz", recursive=True)
    if not paths:
        print("no trace found under", TRACE_DIR)
        return
    with gzip.open(sorted(paths)[-1], "rt") as f:
        trace = json.load(f)
    events = trace.get("traceEvents", [])

    # find TPU device op tracks: pid/tid whose thread names look like XLA Ops
    tpu_pids = set()
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pname = e.get("args", {}).get("name", "")
            if "TPU" in pname or "/device:" in pname.lower():
                tpu_pids.add(e["pid"])
    op_tids = set()
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "thread_name":
            tname = e.get("args", {}).get("name", "")
            if e.get("pid") in tpu_pids and ("XLA Op" in tname or "Ops" in tname
                                             or "Steps" not in tname):
                op_tids.add((e["pid"], e["tid"]))

    hlo_cat = build_hlo_category_map()

    cat_time = collections.Counter()
    op_time = collections.Counter()
    total = 0.0
    for e in events:
        if e.get("ph") != "X" or e.get("pid") not in tpu_pids:
            continue
        tname_key = (e.get("pid"), e.get("tid"))
        if op_tids and tname_key not in op_tids:
            continue
        dur = e.get("dur", 0) / 1e6  # us -> s
        name = e.get("name", "")
        if not name or name.startswith("Steps"):
            continue
        if name.startswith("jit_") or name.startswith("while") or \
                name.startswith("body") or name.startswith("condition"):
            continue  # parent spans double-count their children
        cat = hlo_cat.get(name.lstrip("%")) or categorize(name)
        cat_time[cat] += dur
        op_time[name] += dur
        total += dur

    print(f"\n=== device op time by HLO content, one img2img call "
          f"(batch {batch}, {steps} steps; parent spans excluded) ===")
    for cat, t in cat_time.most_common():
        print(f"{cat:28s} {t*1e3:9.2f} ms  {100*t/max(total,1e-9):5.1f}%")
    print(f"{'TOTAL':28s} {total*1e3:9.2f} ms")
    print("\n--- top 30 ops ---")
    for name, t in op_time.most_common(30):
        print(f"{t*1e3:9.2f} ms  [{hlo_cat.get(name.lstrip('%'), '?'):>22s}] "
              f"{name[:80]}")


if __name__ == "__main__":
    b, s = run_and_trace()
    analyze(b, s)
