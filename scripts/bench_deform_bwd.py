"""Deformable gather-core backward decomposition (round-4 training attack).

The train step's model-bwd (~1.25 s of the 2.25 s step at B=2 1024^2) is
suspected to be dominated by the pixel decoder's deformable-gather VJPs:
per layer the backward re-gathers tap rows (for d_loc / d_attn) and
scatter-adds into the value map (for d_value). This bench isolates, for the
production shapes (6 layers x 3 levels, B=2, Lq=21504, heads=8, P=4, bf16):

  fwd         the wide gather core forward
  grad_all    full VJP wrt (value, loc, attn)
  grad_noval  VJP with value stop-gradded  (re-gather paths only, no scatter)
  grad_val    VJP wrt value only           (scatter path only)

Usage: PYTHONPATH=/root/.axon_site:/root/repo python scripts/bench_deform_bwd.py
"""
from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from iuvl_tpu.ops.msdeform import ms_deform_attn_core

B, NH, D, P = 2, 8, 64, 4
SHAPES = ((32, 32), (64, 64), (128, 128))
S = sum(h * w for h, w in SHAPES)
LQ = S


def make_inputs(seed=0):
    rs = np.random.RandomState(seed)
    value = jnp.asarray(rs.randn(B, S, NH, D), jnp.bfloat16)
    loc = jnp.asarray(rs.rand(B, LQ, NH, len(SHAPES), P, 2), jnp.float32)
    attn = jax.nn.softmax(
        jnp.asarray(rs.randn(B, LQ, NH, len(SHAPES) * P), jnp.float32), -1
    ).reshape(B, LQ, NH, len(SHAPES), P)
    return value, loc, attn


def core(value, loc, attn, impl="wide"):
    out = ms_deform_attn_core(value, SHAPES, loc, attn, impl=impl)
    return out.astype(jnp.float32).sum()


def _gsum(tree):
    tot = jnp.float32(0.0)
    for v in jax.tree_util.tree_leaves(tree):
        tot = tot + v.astype(jnp.float32).sum()
    return tot


def chain(fn, iters):
    """Chained-scan timing (block_until_ready is unreliable over the axon
    tunnel — force completion with a scalar host fetch, difference K vs 1
    chained iterations to cancel dispatch RTT)."""
    def run(value, loc, attn):
        def body(carry, _):
            return fn(value + carry * 0, loc, attn), None
        out, _ = jax.lax.scan(body, jnp.bfloat16(0), None, length=iters)
        return out.astype(jnp.float32)
    return jax.jit(run)


def timed_diff(run1, runk, args, k_minus_1, repeats=3):
    float(run1(*args)); float(runk(*args))
    b1 = bk = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter(); float(run1(*args)); b1 = min(b1, time.perf_counter() - t0)
        t0 = time.perf_counter(); float(runk(*args)); bk = min(bk, time.perf_counter() - t0)
    return (bk - b1) / k_minus_1


def main():
    value, loc, attn = make_inputs()
    nlayers = 6  # the pixel decoder runs 6 of these

    cases = {
        "fwd": lambda v, l, a: core(v, l, a).astype(jnp.bfloat16),
        "grad_all": lambda v, l, a: _gsum(
            jax.grad(core, argnums=(0, 1, 2))(v, l, a)).astype(jnp.bfloat16),
        "grad_noval": lambda v, l, a: _gsum(jax.grad(
            lambda vv, ll, aa: core(jax.lax.stop_gradient(vv), ll, aa),
            argnums=(1, 2))(v, l, a)).astype(jnp.bfloat16),
        "grad_val": lambda v, l, a: _gsum(jax.grad(
            lambda vv, ll, aa: core(vv, jax.lax.stop_gradient(ll),
                                    jax.lax.stop_gradient(aa)),
            argnums=(0,))(v, l, a)).astype(jnp.bfloat16),
    }
    for name, fn in cases.items():
        t = timed_diff(chain(fn, 1), chain(fn, 4), (value, loc, attn), 3.0)
        print(f"{name}: {t*1e3:.2f} ms/layer-equiv -> x{nlayers} = "
              f"{t*1e3*nlayers:.1f} ms", flush=True)


if __name__ == "__main__":
    main()
