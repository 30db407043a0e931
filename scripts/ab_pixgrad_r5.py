"""Round-5 composed pix_grad A/B: sorted d_value scatter (msdeform) x
remat_group (pixel decoder) x xla_tpu_scoped_vmem_limit_kib.

Round-4 baseline: 1117 ms (BENCH/ROADMAP). Measured here on the r4 code:
default 1096.6, scoped48M 930.8, scoped64M 941.5, scoped96M 1080.0 —
the scheduler can keep the backward re-gather operands in scoped VMEM
(the 3x "composed-vs-synthetic gather gap" was exactly this: HBM-operand
gathers run 85M rows/s, VMEM-operand ones 313M; see
scripts/bench_dv_scatter.py + the fusion.48/49 S(1) diff in the HLO).

Usage: PYTHONPATH=/root/.axon_site:/root/repo python scripts/ab_pixgrad_r5.py \
           rg2:49152 rg2:default rg1:49152 rg3:49152
"""
from __future__ import annotations

import dataclasses
import sys
import time

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
    b = 2
    base_cfg = SysLearnerConfig(
        sam_size="base", img_size=1024, dtype="bfloat16", attn_impl="auto",
        msdeform_impl="auto", remat=True,
    )
    rs = np.random.RandomState(0)
    bf = jnp.bfloat16
    g4 = 256
    fpn = {
        "res2": jnp.asarray(rs.randn(b, g4, g4, 128), bf),
        "res3": jnp.asarray(rs.randn(b, g4 // 2, g4 // 2, 256), bf),
        "res4": jnp.asarray(rs.randn(b, g4 // 4, g4 // 4, 512), bf),
        "res5": jnp.asarray(rs.randn(b, g4 // 8, g4 // 8, 1024), bf),
    }
    params_cache = {}

    def run_case(rg: int, scoped, trace: bool = False):
        cfg = dataclasses.replace(base_cfg, remat_group=rg)
        model = SysLearner(cfg=cfg)
        if "p" not in params_cache:
            img0 = jnp.zeros((1, 1024, 1024, 3), jnp.float32)
            text0 = jnp.zeros((134, cfg.syslearner_dim), jnp.float32)
            params_cache["p"] = jax.jit(
                lambda r: model.init(r, img0, text0, method=SysLearner.warmup)
            )(jax.random.PRNGKey(0))
        params = params_cache["p"]

        def pix_sum(params, fpn):
            mf, ms = model.apply(
                params, fpn, method=lambda m, f: m.pixel_decoder(f))
            return _gsum((mf, ms))

        def gradsum(c, p, f):
            f2 = jax.tree_util.tree_map(lambda t: t + c.astype(t.dtype) * 0, f)
            return _gsum(jax.grad(pix_sum)(p, f2))

        copts = (None if scoped == "default"
                 else {"xla_tpu_scoped_vmem_limit_kib": int(scoped)})

        def chain(iters):
            def run(*a):
                def body(carry, _):
                    return gradsum(carry, *a), None
                o, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=iters)
                return o
            return jax.jit(run, compiler_options=copts)

        r1, r3 = chain(1), chain(3)
        t0 = time.time()
        float(r1(params, fpn)); float(r3(params, fpn))
        best = float("inf")
        for _ in range(3):
            a = time.perf_counter(); float(r1(params, fpn)); t1 = time.perf_counter() - a
            a = time.perf_counter(); float(r3(params, fpn)); t3 = time.perf_counter() - a
            best = min(best, (t3 - t1) / 2.0)
        print(f"rg{rg}:{scoped}: {best*1e3:.1f} ms (compile {time.time()-t0:.0f}s)",
              flush=True)
        if trace:
            jax.profiler.start_trace("/tmp/jaxtrace")
            float(r1(params, fpn))
            jax.profiler.stop_trace()
            print("traced", flush=True)

    for case in sys.argv[1:]:
        trace = case.endswith(":trace")
        case = case.removesuffix(":trace")
        rg, scoped = case.split(":")
        run_case(int(rg.removeprefix("rg")), scoped, trace)


if __name__ == "__main__":
    main()
