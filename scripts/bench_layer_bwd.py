"""Deformable encoder LAYER backward bisection (round-4 training attack).

profile_model_parts measured the composed pixel decoder at 1633 ms fwd+bwd
(B=2) = ~272 ms/layer, while the bare gather core measures 126 ms/layer
(bench_deform_bwd) — ~146 ms/layer unaccounted. This bench grads ONE
DeformableEncoderLayer (with the production remat policy) and strips pieces
to find the jump:

  core        bare ms_deform_attn_core (reference point)
  attn        MSDeformAttn module (adds value/offset/attn/output Dense)
  layer       full DeformableEncoderLayer (adds LN + FFN)

Usage: PYTHONPATH=/root/.axon_site:/root/repo python scripts/bench_layer_bwd.py [cases]
"""
from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from iuvl_tpu.models.xdecoder.pixel_decoder import (
    DeformableEncoderLayer, MSDeformAttn, encoder_reference_points,
)
from iuvl_tpu.ops.msdeform import ms_deform_attn_core

B, NH, D, P, C = 2, 8, 64, 4, 512
SHAPES = ((32, 32), (64, 64), (128, 128))
S = sum(h * w for h, w in SHAPES)


def _gsum(tree):
    tot = jnp.float32(0.0)
    for v in jax.tree_util.tree_leaves(tree):
        tot = tot + v.astype(jnp.float32).sum()
    return tot


def chain(fn, iters):
    def run(*args):
        def body(carry, _):
            return fn(carry, *args), None
        out, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=iters)
        return out
    return jax.jit(run)


def timed_diff(run1, runk, args, k_minus_1, repeats=3):
    float(run1(*args)); float(runk(*args))
    b1 = bk = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter(); float(run1(*args)); b1 = min(b1, time.perf_counter() - t0)
        t0 = time.perf_counter(); float(runk(*args)); bk = min(bk, time.perf_counter() - t0)
    return (bk - b1) / k_minus_1


def main():
    rs = np.random.RandomState(0)
    src = jnp.asarray(rs.randn(B, S, C) * 0.1, jnp.bfloat16)
    pos = jnp.asarray(rs.randn(1, S, C) * 0.1, jnp.bfloat16)
    pos = jnp.broadcast_to(pos, (B, S, C))
    ref = jnp.broadcast_to(encoder_reference_points(SHAPES)[None],
                           (B, S, len(SHAPES), 2))
    value = jnp.asarray(rs.randn(B, S, NH, D), jnp.bfloat16)
    loc = jnp.asarray(rs.rand(B, S, NH, len(SHAPES), P, 2), jnp.float32)
    aw = jax.nn.softmax(
        jnp.asarray(rs.randn(B, S, NH, len(SHAPES) * P), jnp.float32), -1
    ).reshape(B, S, NH, len(SHAPES), P)

    attn_mod = MSDeformAttn(d_model=C, n_levels=3, n_heads=NH, n_points=P,
                            dtype=jnp.bfloat16, impl="auto")
    layer_mod = DeformableEncoderLayer(
        d_model=C, d_ffn=1024, n_levels=3, n_heads=NH, n_points=P,
        dtype=jnp.bfloat16, impl="auto")
    ap = attn_mod.init(jax.random.PRNGKey(0), src + pos, ref, src, SHAPES)
    lp = layer_mod.init(jax.random.PRNGKey(0), src, pos, ref, SHAPES)

    remat_layer = jax.checkpoint(
        lambda p, s: layer_mod.apply(p, s, pos, ref, SHAPES),
        policy=jax.checkpoint_policies.save_only_these_names(
            "deform_core", "deform_value", "deform_loc", "deform_attn"),
    )
    remat_attn = jax.checkpoint(
        lambda p, s: attn_mod.apply(p, s + pos, ref, s, SHAPES),
        policy=jax.checkpoint_policies.save_only_these_names(
            "deform_core", "deform_value", "deform_loc", "deform_attn"),
    )

    def core_fn(v, l, a):
        return ms_deform_attn_core(v, SHAPES, l, a, impl="wide").astype(
            jnp.float32).sum()

    plain_attn = lambda p, s: attn_mod.apply(p, s + pos, ref, s, SHAPES)
    allsave_attn = jax.checkpoint(
        plain_attn, policy=jax.checkpoint_policies.everything_saveable)

    cases = {
        "core_grad": (lambda c, v, l, a: _gsum(
            jax.grad(core_fn, argnums=(0, 1, 2))(v + c.astype(v.dtype) * 0, l, a)),
            (value, loc, aw)),
        "attn_grad_noremat": (lambda c, p, s: _gsum(jax.grad(
            lambda pp, ss: plain_attn(pp, ss).astype(jnp.float32).sum(),
            argnums=(0, 1))(p, s + c.astype(s.dtype) * 0)), (ap, src)),
        "attn_grad_allsave": (lambda c, p, s: _gsum(jax.grad(
            lambda pp, ss: allsave_attn(pp, ss).astype(jnp.float32).sum(),
            argnums=(0, 1))(p, s + c.astype(s.dtype) * 0)), (ap, src)),
        # stop-grad bisection of the +70 ms no-remat glue: which cotangent
        # chain is expensive? (loc kills offsets-Dense + x/y/wslot VJPs;
        # attn kills softmax + attn-Dense; value kills scatter + value_proj)
        "attn_sg_loc": (lambda c, p, s: _gsum(jax.grad(
            lambda pp, ss: attn_mod.apply(
                pp, ss + pos, ref, ss, SHAPES, sg="loc"
            ).astype(jnp.float32).sum(),
            argnums=(0, 1))(p, s + c.astype(s.dtype) * 0)), (ap, src)),
        "attn_sg_attn": (lambda c, p, s: _gsum(jax.grad(
            lambda pp, ss: attn_mod.apply(
                pp, ss + pos, ref, ss, SHAPES, sg="attn"
            ).astype(jnp.float32).sum(),
            argnums=(0, 1))(p, s + c.astype(s.dtype) * 0)), (ap, src)),
        "attn_sg_value": (lambda c, p, s: _gsum(jax.grad(
            lambda pp, ss: attn_mod.apply(
                pp, ss + pos, ref, ss, SHAPES, sg="value"
            ).astype(jnp.float32).sum(),
            argnums=(0, 1))(p, s + c.astype(s.dtype) * 0)), (ap, src)),
        "attn_grad": (lambda c, p, s: _gsum(jax.grad(
            lambda pp, ss: remat_attn(pp, ss).astype(jnp.float32).sum(),
            argnums=(0, 1))(p, s + c.astype(s.dtype) * 0)), (ap, src)),
        "layer_grad": (lambda c, p, s: _gsum(jax.grad(
            lambda pp, ss: remat_layer(pp, ss).astype(jnp.float32).sum(),
            argnums=(0, 1))(p, s + c.astype(s.dtype) * 0)), (lp, src)),
        "layer_fwd": (lambda c, p, s: layer_mod.apply(
            p, s + c.astype(s.dtype) * 0, pos, ref, SHAPES).astype(
                jnp.float32).sum(), (lp, src)),
    }
    only = sys.argv[1].split(",") if len(sys.argv) > 1 else None
    for name, (f, args) in cases.items():
        if only and name not in only:
            continue
        t0 = time.time()
        t = timed_diff(chain(f, 1), chain(f, 4), args, 3.0)
        print(f"{name}: {t*1e3:.1f} ms  (compile {time.time()-t0:.0f}s)",
              flush=True)


if __name__ == "__main__":
    main()
