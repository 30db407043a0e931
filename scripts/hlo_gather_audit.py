"""Audit the gather ops inside the COMPOSED pixel-decoder HLO (round 5).

Round-4 open item (ROADMAP): composed deformable gathers run ~84M rows/s
while identical synthetic shapes run ~230-550M. Hypothesis list:
  (a) the gather's kCustom fusion carries extra consumers (weighted
      reduce / selector matmuls fused in) so the measured "gather" time
      includes VPU work and/or the fusion de-pipelines the gather;
  (b) the concat+roll wide-map build fuses INTO the gather fusion, so
      each row fetch reads 4 discontiguous d-wide segments instead of one
      contiguous 4d row;
  (c) operand layout assigned by layout assignment differs from the
      synthetic case.

This script compiles pix fwd (B=1 wide, B=2 flat) and pix fwd+bwd (B=2)
for the real TPU and prints, for every fusion containing a gather:
  - fusion kind, output shape(s), operand shapes
  - whether the fusion also contains concatenate/roll (slice+pad) ops
  - whether it contains dots/reduces (extra consumers)
  - the gather's operand source (parameter vs computed inside fusion)

Usage: PYTHONPATH=/root/.axon_site:/root/repo python scripts/hlo_gather_audit.py [b] [fwd|grad]
"""
from __future__ import annotations

import re
import sys

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from iuvl_tpu.models.xdecoder.model import SysLearner, SysLearnerConfig


def _gsum(tree):
    tot = jnp.float32(0.0)
    for v in jax.tree_util.tree_leaves(tree):
        tot = tot + v.astype(jnp.float32).mean()
    return tot


def main():
    b = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    mode = sys.argv[2] if len(sys.argv) > 2 else "grad"
    cfg = SysLearnerConfig(
        sam_size="base", img_size=1024, dtype="bfloat16", attn_impl="auto",
        msdeform_impl="auto", remat=True,
    )
    model = SysLearner(cfg=cfg)
    img0 = jnp.zeros((1, cfg.img_size, cfg.img_size, 3), jnp.float32)
    text0 = jnp.zeros((134, cfg.syslearner_dim), jnp.float32)
    params = jax.jit(
        lambda r: model.init(r, img0, text0, method=SysLearner.warmup)
    )(jax.random.PRNGKey(0))

    rs = np.random.RandomState(0)
    bf = jnp.bfloat16
    g4 = cfg.img_size // 4
    fpn = {
        "res2": jnp.asarray(rs.randn(b, g4, g4, 128), bf),
        "res3": jnp.asarray(rs.randn(b, g4 // 2, g4 // 2, 256), bf),
        "res4": jnp.asarray(rs.randn(b, g4 // 4, g4 // 4, 512), bf),
        "res5": jnp.asarray(rs.randn(b, g4 // 8, g4 // 8, 1024), bf),
    }

    def pix_sum(params, fpn):
        mf, ms = model.apply(
            params, fpn, method=lambda m, f: m.pixel_decoder(f))
        return _gsum((mf, ms))

    if mode == "grad":
        fn = lambda p, f: _gsum(jax.grad(pix_sum)(p, f))
    else:
        fn = pix_sum

    lowered = jax.jit(fn).lower(params, fpn)
    compiled = lowered.compile()
    txt = compiled.as_text()
    with open(f"/tmp/pix_{mode}_b{b}.hlo", "w") as f:
        f.write(txt)
    print(f"HLO written to /tmp/pix_{mode}_b{b}.hlo ({len(txt)} chars)")

    # --- parse fusions containing gathers -------------------------------
    # Split into computations.
    comps = re.split(r"\n(?=(?:ENTRY\s+)?%?[\w.-]+ \([^)]*\) -> )", txt)
    by_name = {}
    for c in comps:
        m = re.match(r"(?:ENTRY\s+)?%?([\w.-]+) \(", c)
        if m:
            by_name[m.group(1)] = c

    # find fusion instructions in the entry/top computations that call a
    # computation containing a gather
    gather_comps = {n for n, c in by_name.items() if "gather(" in c}
    print(f"{len(gather_comps)} computations contain gather()")
    for n in sorted(gather_comps):
        c = by_name[n]
        ops = re.findall(r"= ([\w.]+)\(", c)
        from collections import Counter
        cnt = Counter(o.split(".")[0] for o in ops)
        interesting = {k: v for k, v in cnt.items() if k in (
            "gather", "concatenate", "dot", "reduce", "slice", "pad",
            "dynamic-slice", "multiply", "add", "convert", "scatter",
            "transpose", "reshape", "copy", "broadcast", "iota")}
        # gather shapes
        gshapes = re.findall(r"(\S+) = \S*gather\(([^)]*)\)", c)
        gl = [g[0] for g in gshapes][:3]
        print(f"--- {n}: {dict(interesting)}")
        for ln in c.splitlines():
            if "gather(" in ln and "=" in ln:
                print("    " + ln.strip()[:240])

    # where are these computations called from (fusion kind)?
    print("\n=== fusion call sites ===")
    for ln in txt.splitlines():
        if "fusion(" in ln and any(f"calls={cn}" in ln or f"calls=%{cn}" in ln
                                   for cn in gather_comps):
            print(ln.strip()[:300])


if __name__ == "__main__":
    main()
