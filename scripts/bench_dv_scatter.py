"""Round-5 isolation bench: the pixel-decoder backward's d_value scatter
and the composed-vs-synthetic gather-rate gap (VERDICT r5 item 1).

Trace facts (scripts/trace_pix_grad.py, B=2 1024^2, pix_grad = 1123 ms):
  - d_value scatter machinery ~590 ms (52%!): 36 scatter sets (6 layers x
    3 levels x 2 images), each = sort 0.65 + permute ~1.7 + scatter custom
    fusion 7-11.5 ms + f32 converts.
  - value gathers (fwd + bwd re-gather): 72 x bf16[688128,256] = 263 ms
    (~3.6 ms avg; res3 ones 8.1 ms = 85M rows/s).

Questions this bench answers ON CHIP:
  g1. gather, REDUCE-consumer (what bench_gather_bsplit measured — the
      reduce can fuse into the gather fusion, never writing 352 MB out).
  g2. gather, MATERIALIZED output (optimization_barrier before the reduce
      — what the composed program actually does).
      If g2 >> g1, the round-4 "3x composed-vs-synthetic gap" was a
      measurement artifact of the reduce-fused bench, and the composed
      gathers already run at the materialized-output speed of light.
  s1. scatter baseline: zeros(hw,256).at[idx].add(contrib) f32 (composed).
  s2. scatter with PRE-SORTED indices+rows (sort outside the timed body).
  s3. s2 via jax.lax.scatter-add with indices_are_sorted=True.
  s4. d-wide: 4 scatters of (R,64) at slot-shifted indices into (hw,64)
      (fold-free; 4x rows, 1/4 width).
  s5. unique-cell upper bound: scatter hw rows (the theoretical win of a
      perfect segment-sum: one write per cell).

Usage: PYTHONPATH=/root/.axon_site:/root/repo python scripts/bench_dv_scatter.py [cases]
"""
from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

NH, D, P = 8, 64, 4
WID = 4 * D


def real_indices(level_hw, all_shapes=((128, 128), (64, 64), (32, 32))):
    """Reconstruct the EXACT flat-gather indices of the composed program at
    init: reference points = per-level center rasters (all 21504 queries),
    offsets = compass bias (sampling_offsets kernel is zero-init), top-left
    wide index per (head, query, point), head-major row order."""
    h, w = level_hw
    refs = []
    for hh, ww in all_shapes:
        ys = (np.arange(hh) + 0.5) / hh
        xs = (np.arange(ww) + 0.5) / ww
        gx, gy = np.meshgrid(xs, ys)
        refs.append(np.stack([gx.ravel(), gy.ravel()], -1))
    ref = np.concatenate(refs, 0)  # (21504, 2) normalized
    thetas = np.arange(NH) * (2 * np.pi / NH)
    grid = np.stack([np.cos(thetas), np.sin(thetas)], -1)
    grid = grid / np.abs(grid).max(-1, keepdims=True)  # (NH, 2)
    pts = grid[:, None, :] * (np.arange(P)[None, :, None] + 1)  # (NH, P, 2)
    # locations = ref + offs / (w, h); pixel = loc * (w, h) - 0.5
    x = ref[None, :, None, 0] * w + pts[:, None, :, 0] - 0.5  # (NH, LQ, P)
    y = ref[None, :, None, 1] * h + pts[:, None, :, 1] - 0.5
    x0c = np.clip(np.floor(x), 0, w - 1)
    y0c = np.clip(np.floor(y), 0, h - 1)
    idx = (y0c * w + x0c).astype(np.int64)
    base = np.arange(NH)[:, None, None] * (h * w)
    return (idx + base).reshape(-1).astype(np.int32)  # (NH*LQ*P,)


def chain(fn, iters):
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


def main():
    only = sys.argv[1].split(",") if len(sys.argv) > 1 else None
    rs = np.random.RandomState(0)
    shapes = {"res3": (128, 128), "res4": (64, 64), "res5": (32, 32)}
    for lname, (h, w) in shapes.items():
        hw = h * w
        idx = jnp.asarray(real_indices((h, w)))
        r = idx.shape[0]
        vmap = jnp.asarray(rs.randn(NH * hw, WID), jnp.bfloat16)
        contrib = jnp.asarray(rs.randn(r, WID), jnp.float32)
        contrib_bf = contrib.astype(jnp.bfloat16)
        # pre-sorted copies (sort cost excluded — the composed program pays
        # 0.65 ms for it already)
        order = jnp.argsort(idx)
        idx_s = idx[order]
        contrib_s = contrib[order]

        def g_reduce(c, ix, vm, ct, cts, ixs):
            g = jnp.take(vm + c.astype(jnp.bfloat16), ix, axis=0, mode="clip")
            return g.astype(jnp.float32).sum()

        def g_mat(c, ix, vm, ct, cts, ixs):
            g = jnp.take(vm + c.astype(jnp.bfloat16), ix, axis=0, mode="clip")
            g = jax.lax.optimization_barrier(g)
            return g.astype(jnp.float32).sum()

        def s_base(c, ix, vm, ct, cts, ixs):
            o = jnp.zeros((NH * hw, WID), jnp.float32).at[ix].add(ct + c)
            return o.sum()

        def s_sorted(c, ix, vm, ct, cts, ixs):
            o = jnp.zeros((NH * hw, WID), jnp.float32).at[ixs].add(cts + c)
            return o.sum()

        def s_sorted_hint(c, ix, vm, ct, cts, ixs):
            o = jnp.zeros((NH * hw, WID), jnp.float32).at[ixs].add(
                cts + c, indices_are_sorted=True)
            return o.sum()

        def s_bf16(c, ix, vm, ct, cts, ixs):
            o = jnp.zeros((NH * hw, WID), jnp.bfloat16).at[ix].add(
                (ct + c).astype(jnp.bfloat16))
            return o.astype(jnp.float32).sum()

        def s_dwide(c, ix, vm, ct, cts, ixs):
            tot = jnp.float32(0.0)
            for s, shift in enumerate((0, 1, w, w + 1)):
                o = jnp.zeros((NH * hw, D), jnp.float32).at[ix + shift].add(
                    ct[:, s * D:(s + 1) * D] + c, mode="drop")
                tot = tot + o.sum()
            return tot

        def s_unique(c, ix, vm, ct, cts, ixs):
            # theoretical target: one row per destination cell
            o = jnp.zeros((NH * hw, WID), jnp.float32).at[
                jnp.arange(NH * hw, dtype=jnp.int32)].add(
                ct[:NH * hw] + c, indices_are_sorted=True, unique_indices=True)
            return o.sum()

        cases = dict(g_reduce=g_reduce, g_mat=g_mat, s_base=s_base,
                     s_sorted=s_sorted, s_sorted_hint=s_sorted_hint,
                     s_bf16=s_bf16, s_dwide=s_dwide, s_unique=s_unique)
        args = (idx, vmap, contrib, contrib_s, idx_s)
        for name, f in cases.items():
            if only and name not in only:
                continue
            t0 = time.time()
            t = timed_diff(chain(f, 1), chain(f, 4), args, 3.0)
            rate = r / t / 1e6
            print(f"{lname} {name}: {t*1e3:.2f} ms ({rate:.0f}M rows/s) "
                  f"(compile {time.time()-t0:.0f}s)", flush=True)


if __name__ == "__main__" and "extra" not in sys.argv:
    main()


def extra_cases():
    """s_sort_full: the full replacement pipeline (sort + permute + hinted
    scatter) timed end-to-end; s_pair: one pairwise pre-merge round of the
    sorted rows before the scatter (halves scatter rows for one stream)."""
    rs = np.random.RandomState(0)
    shapes = {"res3": (128, 128), "res4": (64, 64), "res5": (32, 32)}
    for lname, (h, w) in shapes.items():
        hw = h * w
        idx = jnp.asarray(real_indices((h, w)))
        r = idx.shape[0]
        contrib = jnp.asarray(rs.randn(r, WID), jnp.float32)

        def s_sort_full(c, ix, ct):
            order = jnp.argsort(ix)
            ixs = ix[order]
            cts = ct[order] + c
            o = jnp.zeros((NH * hw, WID), jnp.float32).at[ixs].add(
                cts, indices_are_sorted=True)
            return o.sum()

        def s_pair(c, ix, ct):
            order = jnp.argsort(ix)
            ixs = ix[order]
            cts = ct[order] + c
            i2 = ixs.reshape(-1, 2)
            c2 = cts.reshape(-1, 2, WID)
            same = (i2[:, 0] == i2[:, 1])
            merged = jnp.where(same[:, None],
                               c2[:, 0] + c2[:, 1], c2[:, 0])
            second = jnp.where(same[:, None], 0.0, c2[:, 1])
            o = jnp.zeros((NH * hw, WID), jnp.float32)
            o = o.at[i2[:, 0]].add(merged, indices_are_sorted=True)
            o = o.at[i2[:, 1]].add(second, indices_are_sorted=True)
            return o.sum()

        for name, f in dict(s_sort_full=s_sort_full, s_pair=s_pair).items():
            t0 = time.time()
            t = timed_diff(chain(f, 1), chain(f, 4), (idx, contrib), 3.0)
            print(f"{lname} {name}: {t*1e3:.2f} ms ({r/t/1e6:.0f}M rows/s) "
                  f"(compile {time.time()-t0:.0f}s)", flush=True)


if __name__ == "__main__" and "extra" in sys.argv:
    extra_cases()
