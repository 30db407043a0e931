"""Gather row-count vs row-width tradeoff for the deformable core.

The 'wide' impl gathers one 512B row (4 taps x 64ch bf16) per
(query, head, level, point) — row-rate bound at ~186M rows/s, i.e. only
~96 GB/s of effective HBM bandwidth. If the rate holds (or degrades
sub-linearly) at wider rows, gathering ALL heads' channels at each head's
location (8x wider rows: 4 taps x 512ch = 4096B, discarding the 7/8 that
belongs to other heads' channel slices) cuts the row count 8x at the same
total bytes — converting an issue-rate-bound gather into a
bandwidth-bound one.

Shapes: res3 at 1024^2 (HW=16384), Lq=21504 queries, P=4 points, 8 heads.
Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/bench_gather_width.py
"""
from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def chain(fn, iters):
    def run(*args):
        def body(carry, _):
            return fn(carry, *args), None
        out, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=iters)
        return out
    return jax.jit(run)


def timed_diff(run1, runk, args, k_minus_1: float, repeats: int = 3):
    float(run1(*args)); float(runk(*args))
    b1 = bk = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter(); float(run1(*args)); b1 = min(b1, time.perf_counter() - t0)
        t0 = time.perf_counter(); float(runk(*args)); bk = min(bk, time.perf_counter() - t0)
    return (bk - b1) / k_minus_1


def main():
    hw, lq, p, nh = 16384, 21504, 4, 8
    rs = np.random.RandomState(0)
    # (lanes, rows, width): current wide = 8 lanes x lq*p rows x 256 lanes;
    # head-wide = 1 lane x lq*p rows x 2048 lanes; plus half/quarter steps.
    cases = [
        ("wide (8x256)", nh, lq * p, 256),
        ("2-head (4x512)", nh // 2, lq * p, 512),
        ("4-head (2x1024)", nh // 4, lq * p, 1024),
        ("headwide (1x2048)", 1, lq * p, 2048),
    ]
    for name, lanes, rows, width in cases:
        v = jnp.asarray(rs.rand(lanes, hw, width), jnp.bfloat16)
        idx = jnp.asarray(rs.randint(0, hw, (lanes, rows, 1)), jnp.int32)

        def f(c, v, idx):
            out = jnp.take_along_axis(v, idx + (c * 1e-12).astype(jnp.int32),
                                      axis=1)
            return out.astype(jnp.float32).mean()

        t = timed_diff(chain(f, 1), chain(f, 5), (v, idx), 4.0)
        nrows = lanes * rows
        gb = nrows * width * 2 / 1e9
        print(f"{name}: {t*1e3:7.2f} ms  {nrows/t/1e6:7.1f}M rows/s  "
              f"{gb/t:6.1f} GB/s", flush=True)


if __name__ == "__main__":
    main()
