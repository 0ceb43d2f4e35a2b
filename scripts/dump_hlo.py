#!/usr/bin/env python3
"""Dump the optimized HLO of the img2img program and summarize the named
fusions that the trace shows as hot (pass names as argv, e.g.
`dump_hlo.py fusion.5310 fusion.5308`). Writes full HLO text to
/tmp/img2img_hlo.txt for ad-hoc inspection."""
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from image_restoration_and_enhancement_tpu import config as C
from image_restoration_and_enhancement_tpu.core import sampling


def main():
    batch = int(os.environ.get("TRACE_BATCH", "8"))
    steps = int(os.environ.get("TRACE_STEPS", "20"))
    size = int(os.environ.get("TRACE_SIZE", "512"))

    modules = sampling.SDModules.create(C.SD15, dtype=jnp.bfloat16)
    params = sampling.init_params(modules, jax.random.PRNGKey(0), image_size=size)
    params = jax.tree.map(lambda x: x.astype(jnp.bfloat16), params)
    fn = sampling.make_img2img_fn(modules, steps, 1.0, 5.0, sampler="ddim")
    image = jnp.zeros((batch, size, size, 3), jnp.float32)
    ctx = sampling.encode_text(modules, params, jnp.zeros((batch, 77), jnp.int32))
    key = jax.random.PRNGKey(42)

    compiled = jax.jit(fn).lower(params, image, ctx, ctx, key).compile()
    txt = compiled.as_text()
    with open("/tmp/img2img_hlo.txt", "w") as f:
        f.write(txt)
    print(f"HLO dumped: {len(txt)/1e6:.1f} MB -> /tmp/img2img_hlo.txt")

    names = sys.argv[1:]
    if not names:
        return
    # index fusion definitions: "name = fusion(...), kind=..., calls=comp"
    for nm in names:
        pat = re.compile(rf"%?{re.escape(nm)} = \S+ fusion\((.*?)\), kind=(\S+?),.*calls=%?([\w\.\-]+)")
        m = pat.search(txt)
        if not m:
            print(f"\n### {nm}: not found")
            continue
        kind, comp = m.group(2), m.group(3)
        print(f"\n### {nm}  kind={kind} comp={comp}")
        # print the called computation body (first 60 lines)
        cpat = re.compile(rf"^%?{re.escape(comp)} .*?\{{(.*?)^\}}", re.S | re.M)
        cm = cpat.search(txt)
        if cm:
            body = cm.group(1).strip().splitlines()
            # summarize: count op kinds and shapes
            import collections
            ops = collections.Counter()
            for line in body:
                mm = re.search(r"= (\S+?)[\s\(]", line.strip())
                shape = re.search(r"= (\S+)\[", line.strip())
                if mm:
                    ops[mm.group(1).split("[")[0]] += 1
            print("   ops:", dict(ops.most_common(12)))
            print("   lines:", len(body))
            for line in body[:8]:
                print("   |", line.strip()[:150])
            if len(body) > 8:
                print("   | ...")
                for line in body[-4:]:
                    print("   |", line.strip()[:150])


if __name__ == "__main__":
    main()
