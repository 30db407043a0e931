"""Criterion pred-sample backward scatter alternatives (round 4).

The device trace of the composed criterion grad shows its largest single
item is the VJP scatter of the loss-path point_sample: (40, 12544) points,
4-wide f32 tap rows, into the (40, 65793, 4) wide table — 20.4 ms per
layer x 10 layers = 204 ms at 25M rows/s (narrow rows, row-rate bound).

Candidates for  acc[n, idx[n, p], :] += rows[n, p, :]:

  xla        zeros.at[].add on the flattened (40*65793, 4) table (current)
  sortseg    per-map sort by cell + segment_sum(sorted)
  taps4      4 scalar scatter-adds into the flat (40*65536,) map
  widerow    pack the 4 taps with a (P, 128)-wide payload: scatter 128-wide
             rows (125x fewer bytes wasted? no - just measures row-width
             sensitivity of the scatter unit)
  pallas     VMEM-accumulator kernel, one map per grid step, serial rows

Usage: PYTHONPATH=... python scripts/bench_crit_scatter.py [cases]
"""
from __future__ import annotations

import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

N, P, H, W = 40, 12544, 256, 256
SPAN = H * W + W + 1


def make(seed=0):
    rs = np.random.RandomState(seed)
    # importance-sampled points cluster near mask boundaries: emulate with
    # clustered rows (mix of uniform + gaussian blobs)
    cell = np.clip(
        (rs.rand(N, P) * H * W * 0.5
         + rs.randn(N, P) * 5000 + H * W * 0.25).astype(np.int64),
        0, H * W - 1,
    )
    rows = rs.randn(N, P, 4).astype(np.float32)
    return jnp.asarray(cell, jnp.int32), jnp.asarray(rows)


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


def scat_xla(cell, rows):
    base = jnp.arange(N, dtype=jnp.int32)[:, None] * SPAN
    flat = (cell + base).reshape(-1)
    acc = jnp.zeros((N * SPAN, 4), jnp.float32)
    return acc.at[flat].add(rows.reshape(-1, 4)).sum()


def scat_sortseg(cell, rows):
    base = jnp.arange(N, dtype=jnp.int32)[:, None] * SPAN
    flat = (cell + base).reshape(-1)
    order = jnp.argsort(flat)
    si = jnp.take(flat, order)
    sr = jnp.take(rows.reshape(-1, 4), order, axis=0)
    acc = jax.ops.segment_sum(sr, si, num_segments=N * SPAN,
                              indices_are_sorted=True)
    return acc.sum()


def scat_taps4(cell, rows):
    base = jnp.arange(N, dtype=jnp.int32)[:, None] * (H * W)
    flat = (cell + base).reshape(-1)
    tot = jnp.float32(0.0)
    for k in range(4):
        acc = jnp.zeros((N * H * W,), jnp.float32)
        tot = tot + acc.at[flat].add(rows[..., k].reshape(-1)).sum()
    return tot


def _pallas_scat_kernel(cell_ref, rows_ref, acc_ref):
    acc_ref[...] = jnp.zeros_like(acc_ref)

    def body(i, _):
        c = cell_ref[0, 0, i]
        acc_ref[0, pl.ds(c, 1), :] += rows_ref[0, pl.ds(i, 1), :]
        return 0

    jax.lax.fori_loop(0, cell_ref.shape[2], body, 0)


def scat_pallas(cell, rows):
    rows_p = jnp.pad(rows, ((0, 0), (0, 0), (0, 124)))  # lane-pad to 128
    out = pl.pallas_call(
        _pallas_scat_kernel,
        grid=(N,),
        in_specs=[
            pl.BlockSpec((1, 1, P), lambda i: (i, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, P, 128), lambda i: (i, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, SPAN + 7, 128), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((N, SPAN + 7, 128), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
    )(cell.reshape(N, 1, P), rows_p)
    return out[..., :4].sum()


def main():
    cell, rows = make()
    cases = {
        "xla": lambda c, i, r: scat_xla(i, r + c),
        "sortseg": lambda c, i, r: scat_sortseg(i, r + c),
        "taps4": lambda c, i, r: scat_taps4(i, r + c),
        "pallas": lambda c, i, r: scat_pallas(i, r + c),
    }
    only = sys.argv[1].split(",") if len(sys.argv) > 1 else None
    for name, f in cases.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            t = timed_diff(chain(f, 1), chain(f, 4), (cell, rows), 3.0)
            print(f"{name}: {t*1e3:.2f} ms  (compile {time.time()-t0:.0f}s)",
                  flush=True)
        except Exception as e:
            print(f"{name}: FAILED {type(e).__name__}: {str(e)[:200]}",
                  flush=True)


if __name__ == "__main__":
    main()
