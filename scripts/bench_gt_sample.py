"""gt point_sample variants at 1024^2 (the criterion's per-layer 12.9 ms).

Hypothesis: at 1024^2 the 4-tap wide stack is fused back into the gather
by XLA (no materialization), so the gather degrades to 4 rows/point —
measured 12.9 ms/layer vs the ~2.7 ms 1-row floor at 186M rows/s.
Variants:
  cur        current point_sample (take_along_axis on fused wide)
  barrier    optimization_barrier(wide) before the gather (force 4-wide rows)
  flat       flat 2-D reshape gather at 1024^2 (forces materialization too)
  *_bf16     same with the map cast to bf16 (binary gt: exact)
  table10    prebuilt wide table shared by 10 back-to-back samples
             (simulates cross-layer CSE: per-layer cost = gather only)

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/bench_gt_sample.py
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


def build_wide(masks):
    n, h, w = masks.shape
    flat = masks.reshape(n, h * w)
    pad = w + 1
    span = h * w + w + 1
    padded = jnp.pad(flat, ((0, 0), (pad, pad)))
    wide = jnp.stack(
        [padded[:, off : off + span] for off in (0, 1, w, w + 1)], axis=-1
    )
    return wide, pad, span


def sample_from_wide(wide, pad, span, h, w, coords, barrier=False, flat2d=False):
    n = wide.shape[0]
    x = coords[..., 0] * w - 0.5
    y = coords[..., 1] * h - 0.5
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    fx = x - x0
    fy = y - y0
    base = y0.astype(jnp.int32) * w + x0.astype(jnp.int32) + pad
    base = jnp.clip(base, 0, span - 1)
    if barrier:
        wide = jax.lax.optimization_barrier(wide)
    if flat2d:
        rows = base + jnp.arange(n, dtype=jnp.int32)[:, None] * span
        g4 = jnp.take(wide.reshape(n * span, 4), rows.reshape(-1), axis=0)
        g4 = g4.reshape(n, coords.shape[1], 4)
    else:
        g4 = jnp.take_along_axis(wide, base[:, :, None], axis=1)
    out = jnp.zeros(coords.shape[:-1], wide.dtype)
    for k, (dy, dx) in enumerate(((0, 0), (0, 1), (1, 0), (1, 1))):
        wgt = ((1 - fy) if dy == 0 else fy) * ((1 - fx) if dx == 0 else fx)
        xi = x0 + dx
        yi = y0 + dy
        valid = (xi >= 0) & (xi <= w - 1) & (yi >= 0) & (yi <= h - 1)
        out = out + g4[..., k] * (wgt * valid.astype(wide.dtype)).astype(wide.dtype)
    return out


def main():
    from iuvl_tpu.ops.point_sample import point_sample

    n, h, w, p = 40, 1024, 1024, 12544
    rs = np.random.RandomState(0)
    tgt_f32 = jnp.asarray(rs.rand(n, h, w) > 0.7, jnp.float32)
    tgt_bf16 = tgt_f32.astype(jnp.bfloat16)
    coords = jnp.asarray(rs.rand(n, p, 2), jnp.float32)

    def cur(c, tgt, coords):
        return point_sample(tgt + c * 1e-12, coords).astype(jnp.float32).mean()

    def mk(barrier, flat2d):
        def f(c, tgt, coords):
            wide, pad, span = build_wide(tgt + c.astype(tgt.dtype) * 1e-12)
            o = sample_from_wide(wide, pad, span, h, w, coords,
                                 barrier=barrier, flat2d=flat2d)
            return o.astype(jnp.float32).mean()
        return f

    def table10(c, tgt, coords):
        wide, pad, span = build_wide(tgt + c.astype(tgt.dtype) * 1e-12)
        wide = jax.lax.optimization_barrier(wide)
        tot = jnp.float32(0.0)
        for i in range(10):
            o = sample_from_wide(wide, pad, span, h, w,
                                 jnp.roll(coords, i, axis=1))
            tot = tot + o.astype(jnp.float32).mean()
        return tot

    for name, fn, tgt in [
        ("cur_f32", cur, tgt_f32),
        ("cur_bf16", cur, tgt_bf16),
        ("barrier_f32", mk(True, False), tgt_f32),
        ("barrier_bf16", mk(True, False), tgt_bf16),
        ("flat_f32", mk(False, True), tgt_f32),
        ("flat_bf16", mk(False, True), tgt_bf16),
        ("table10_bf16", table10, tgt_bf16),
    ]:
        tt = timed_diff(chain(fn, 1), chain(fn, 3), (tgt, coords), 2.0)
        per = tt / 10 if name.startswith("table10") else tt
        print(f"{name}: {tt*1e3:7.2f} ms" +
              (f"  ({per*1e3:.2f} ms/sample)" if name.startswith("table10") else ""),
              flush=True)


if __name__ == "__main__":
    main()
