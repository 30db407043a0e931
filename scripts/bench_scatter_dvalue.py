"""d_value scatter alternatives under REALISTIC deformable locality.

bench_layer_bwd's stop-grad bisection: the d_value cotangent chain costs
~100 ms/layer while the same chain on UNIFORM-random locations costs
~10 ms — the deformable sampling locations are reference-point-local, so
the XLA scatter-add sees heavy index collisions (every query of every level
samples res5's 1024 cells near its own reference -> ~300 colliding updates
per hot cell) and serializes.

Candidates, per level, for d_v4[cell, :] += contrib[row, :] at idx[row]:

  xla       jnp.zeros.at[idx].add(contrib)             (the current VJP)
  sort      argsort(idx) -> gather payload -> segment_sum(sorted)
  shard     K independent scatters into K map copies -> tree-add
  matmul    one-hot matmul per index chunk (res5-sized maps only)

Usage: PYTHONPATH=... python scripts/bench_scatter_dvalue.py [cases]
"""
from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

B, NH, D, P = 2, 8, 64, 4
SHAPES = ((32, 32), (64, 64), (128, 128))
S = sum(h * w for h, w in SHAPES)
LQ = S
WID = 4 * D  # wide-row payload (4 taps packed)


def make_local_indices(seed=0):
    """Per level: flat (B*NH*LQ*P,) cell indices with deformable locality
    (reference point + compass-init-scale offsets), plus payload rows."""
    rs = np.random.RandomState(seed)
    from iuvl_tpu.models.xdecoder.pixel_decoder import encoder_reference_points

    ref = np.asarray(encoder_reference_points(SHAPES))  # (S, L, 2)
    out = []
    for lvl, (h, w) in enumerate(SHAPES):
        # offsets ~ compass init: magnitude p+1 pixels, all directions
        offs = rs.randn(LQ, NH, P, 2) * (np.arange(P)[None, None, :, None] + 1)
        xy = ref[:, lvl][:, None, None, :] * [w, h] - 0.5 + offs
        x0 = np.clip(np.floor(xy[..., 0]), 0, w - 1).astype(np.int64)
        y0 = np.clip(np.floor(xy[..., 1]), 0, h - 1).astype(np.int64)
        cell = y0 * w + x0  # (LQ, NH, P)
        cell = np.broadcast_to(cell[None], (B, LQ, NH, P))
        base = (
            np.arange(B)[:, None, None, None] * (NH * h * w)
            + np.arange(NH)[None, None, :, None] * (h * w)
        )
        flat = (cell + base).transpose(0, 2, 1, 3).reshape(-1)  # b,nh,q,p
        out.append((jnp.asarray(flat, jnp.int32), h * w))
    payload = jnp.asarray(rs.randn(B * NH * LQ * P, WID), jnp.float32)
    return out, payload


def chain(fn, iters, *args):
    def run(*a):
        def body(carry, _):
            return fn(carry, *a), None
        o, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=iters)
        return o
    return jax.jit(run)


def timed_diff(run1, runk, args, k_minus_1, repeats=3):
    float(run1(*args)); float(runk(*args))
    b1 = bk = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter(); float(run1(*args)); b1 = min(b1, time.perf_counter() - t0)
        t0 = time.perf_counter(); float(runk(*args)); bk = min(bk, time.perf_counter() - t0)
    return (bk - b1) / k_minus_1


def scatter_xla(idx, hw, contrib):
    return jnp.zeros((B * NH * hw, WID), contrib.dtype).at[idx].add(contrib)


def scatter_sort(idx, hw, contrib):
    order = jnp.argsort(idx)
    si = jnp.take(idx, order)
    sc = jnp.take(contrib, order, axis=0)
    return jax.ops.segment_sum(
        sc, si, num_segments=B * NH * hw, indices_are_sorted=True)


def scatter_shard(idx, hw, contrib, k=8):
    n = idx.shape[0]
    per = n // k
    maps = []
    for i in range(k):
        sl = slice(i * per, (i + 1) * per if i < k - 1 else n)
        maps.append(
            jnp.zeros((B * NH * hw, WID), contrib.dtype)
            .at[idx[sl]].add(contrib[sl])
        )
    out = maps[0]
    for m in maps[1:]:
        out = out + m
    return out


def main():
    per_level, payload = make_local_indices()
    cases = {}
    for name, fn in (("xla", scatter_xla), ("sort", scatter_sort),
                     ("shard", scatter_shard)):
        def mk(fn):
            def f(c, payload):
                tot = jnp.float32(0.0)
                pc = payload + c
                for idx, hw in per_level:
                    tot = tot + fn(idx, hw, pc).sum()
                return tot
            return f
        cases[name] = mk(fn)
    # Per-level xla scatter cost (which level's collisions dominate?)
    for lvl in range(len(SHAPES)):
        def mk_lvl(lvl):
            def f(c, payload):
                idx, hw = per_level[lvl]
                return scatter_xla(idx, hw, payload + c).sum()
            return f
        cases[f"xla_l{lvl}"] = mk_lvl(lvl)

    # Level-dependent sharding: collisions scale with (queries / cells),
    # so shard the coarse levels harder; map-copy traffic stays bounded
    # because coarse maps are small.
    def f_shard_tuned(c, payload):
        tot = jnp.float32(0.0)
        pc = payload + c
        for (idx, hw), k in zip(per_level, (32, 8, 1)):
            fn = scatter_xla if k == 1 else (
                lambda i, h, p, k=k: scatter_shard(i, h, p, k=k))
            tot = tot + fn(idx, hw, pc).sum()
        return tot
    cases["shard_tuned"] = f_shard_tuned

    only = sys.argv[1].split(",") if len(sys.argv) > 1 else None
    for name, f in cases.items():
        if only and name not in only:
            continue
        t0 = time.time()
        t = timed_diff(chain(f, 1), chain(f, 4), (payload,), 3.0)
        print(f"{name}: {t*1e3:.1f} ms per 3-level layer  "
              f"(compile {time.time()-t0:.0f}s)", flush=True)


if __name__ == "__main__":
    main()
