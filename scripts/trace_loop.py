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

    # TRACE_QUANT mirrors bench.py's BENCH_QUANT (default int8_static, the
    # shipping serving path); "none" traces the bf16 program.
    quant_env = os.environ.get(
        "TRACE_QUANT", os.environ.get("IRET_QUANT", "int8_static"))
    if quant_env and quant_env != "none":
        os.environ["IRET_QUANT"] = quant_env
    else:
        os.environ.pop("IRET_QUANT", None)

    modules = sampling.SDModules.create(C.SD15, dtype=jnp.bfloat16,
                                        attention_backend=attn)
    params = sampling.init_params(modules, jax.random.PRNGKey(0), image_size=size)
    params = jax.tree.map(lambda x: x.astype(jnp.bfloat16), params)
    image = jnp.zeros((batch, size, size, 3), jnp.float32)
    ctx = sampling.encode_text(modules, params, jnp.zeros((batch, 77), jnp.int32))
    key = jax.random.PRNGKey(42)

    if quant_env == "int8_static":
        from image_restoration_and_enhancement_tpu.ops import quant
        calib = sampling.make_calib_img2img_fn(modules, steps, 1.0, 5.0,
                                               sampler="ddim")
        _, stats = calib(params, image, ctx, ctx, key)
        quant.load_static_table({k: float(v) for k, v in stats.items()})

    fn = sampling.make_img2img_fn(modules, steps, 1.0, 5.0, sampler="ddim")

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


def _shape_numel(s):
    dims = s.split("[", 1)[1].split("]", 1)[0]
    n = 1
    for d in dims.split(","):
        d = d.strip()
        if d:
            n *= int(d)
    return n


def _prod(xs):
    n = 1
    for x in xs:
        n *= x
    return n


def _body_flops(body):
    """Logical MAC-FLOPs of the conv/dot ops inside one fusion body."""
    import re as _re
    fl = 0
    # convolution: FLOPs = 2 * out_elems * filter_elems / out_channels
    for m in _re.finditer(
            r"= (\S+?\[[\d,]*\])\S* convolution\((%[\w.\-]+), (%[\w.\-]+)\)"
            r".*?dim_labels=\S*?_(\w+?)->", body):
        out_s, _, rhs_name, flabels = m.groups()
        rm = _re.search(_re.escape(rhs_name) + r" = (\S+?\[[\d,]*\])", body)
        if not rm:
            continue
        dims = [int(d) for d in
                rm.group(1).split("[", 1)[1].split("]", 1)[0].split(",") if d]
        o_pos = flabels.index("o") if "o" in flabels else len(dims) - 1
        co = dims[o_pos] if o_pos < len(dims) else 1
        fl += 2 * _shape_numel(out_s) * (_prod(dims) // max(co, 1))
    # dot: FLOPs = 2 * out_elems * contracted extent
    for m in _re.finditer(
            r"= (\S+?\[[\d,]*\])\S* dot\((%[\w.\-]+), (%[\w.\-]+)\), "
            r"[^\n]*?lhs_contracting_dims=\{([\d,]*)\}", body):
        out_s, lhs_name, _, cdims = m.groups()
        lm = _re.search(_re.escape(lhs_name) + r" = (\S+?\[[\d,]*\])", body)
        if not lm:
            continue
        ldims = [int(d) for d in
                 lm.group(1).split("[", 1)[1].split("]", 1)[0].split(",") if d]
        k = 1
        for ci in cdims.split(","):
            ci = ci.strip()
            if ci:
                k *= ldims[int(ci)]
        fl += 2 * _shape_numel(out_s) * k
    return fl


def build_hlo_category_map(path="/tmp/trace_loop_hlo.txt"):
    """fusion/op name -> (category, flops), from the executable's own HLO.

    Category from the called computation's body ops (convolution > dot >
    exp > quantize > reduce > copy > other), with one level of nested
    fusions spliced in (XLA's attention mega-fusions keep the QK dot in an
    inner fused computation). flops = logical conv/dot MAC count inside the
    fusion (0 if none), for achieved-TOPS reporting."""
    if not os.path.exists(path):
        return {}
    with open(path) as f:
        txt = f.read()
    import re as _re
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
        inner = ""
        for im in _re.finditer(r"calls=%([\w.\-]+)", body):
            inner += comps.get(im.group(1), "")
        full = body + inner
        if " convolution(" in full or "%convolution" in full:
            cat = "conv(+fused-epilogue)"
        elif "dot(" in full:
            cat = "matmul(+fused-epilogue)"
        elif "exponential(" in full:
            cat = "softmax/exp"
        elif "round-nearest" in full or ("convert" in full and "s8" in full):
            cat = "quantize"
        elif "reduce(" in full or "reduce-window" in full:
            cat = "reduce(stats/absmax)"
        elif "transpose(" in full or "copy(" in full:
            cat = "copy/transpose"
        else:
            cat = "elementwise"
        name_cat[name] = (cat, _body_flops(full))
    for m in _re.finditer(r"%([\w.\-]+) = [^\n]*? (convolution|dot|copy|"
                          r"transpose|reduce|exponential)\(", txt):
        name, op = m.groups()
        name_cat.setdefault(name, ({
            "convolution": "conv(+fused-epilogue)",
            "dot": "matmul(+fused-epilogue)",
            "copy": "copy/transpose",
            "transpose": "copy/transpose",
            "reduce": "reduce(stats/absmax)",
            "exponential": "softmax/exp",
        }[op], 0))
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
        ent = hlo_cat.get(name.lstrip("%"))
        cat = ent[0] if ent else categorize(name)
        cat_time[cat] += dur
        op_time[name] += dur
        total += dur

    print(f"\n=== device op time by HLO content, one img2img call "
          f"(batch {batch}, {steps} steps; parent spans excluded) ===")
    for cat, t in cat_time.most_common():
        print(f"{cat:28s} {t*1e3:9.2f} ms  {100*t/max(total,1e-9):5.1f}%")
    print(f"{'TOTAL':28s} {total*1e3:9.2f} ms")
    print("\n--- top 30 ops (tops = logical conv/dot FLOPs / time; "
          "each op is summed over its loop occurrences) ---")
    n_occur = collections.Counter()
    for e in events:
        if e.get("ph") == "X" and e.get("name") in op_time:
            n_occur[e["name"]] += 1
    for name, t in op_time.most_common(30):
        ent = hlo_cat.get(name.lstrip("%"))
        cat, fl = ent if ent else ("?", 0)
        tops = ""
        if fl and t > 0:
            occ = max(n_occur[name], 1)
            tops = f" {fl*occ/t/1e12:6.1f} T(fl)op/s"
        print(f"{t*1e3:9.2f} ms x{n_occur[name]:<3d} [{cat:>22s}]{tops} "
              f"{name[:70]}")


if __name__ == "__main__":
    b, s = run_and_trace()
    analyze(b, s)
