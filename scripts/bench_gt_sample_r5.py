"""Round-5 gt-side point-sample bench (VERDICT r5 item 3).

The criterion samples the BINARY gt masks (stop-gradient side) at 12544
uncertainty coords per (image, target) per decoder layer — ~60 ms total at
B=2 1024^2 across the 10 supervision layers (ROADMAP r4 still-open).

Variants at the real shape (N = B*T = 40 masks of 1024^2, P = 12544):
  cur       : point_sample as shipped (f32 wide stack, batched gather)
  bf16      : gt map cast to bf16 BEFORE the wide stack (binary values are
              exact in bf16; tap weights stay f32) — halves gather bytes
              with NO barrier / NO cross-layer table (the r4 negative came
              from the optimization_barrier breaking CSE, not the dtype)
  flat      : force the flat 2-D gather path at 1024^2 (row index folds
              the mask id) in f32
  flat_bf16 : flat path on the bf16 stack
  unroll    : per-mask python unroll (40 small gathers from ~4 MB
              operands — each fits scoped VMEM; tests the fusion.48/49
              VMEM-operand effect at criterion scale)

Each case runs the SAME math (4-tap wide gather + f32 weights) and is
oracle-checked against `cur` before timing.

Usage: PYTHONPATH=/root/.axon_site:/root/repo python scripts/bench_gt_sample_r5.py
"""
from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from iuvl_tpu.ops.point_sample import point_sample

N, H, W, P = 40, 1024, 1024, 12544


def wide_stack(flat, w, dtype):
    pad = w + 1
    span = flat.shape[1] + w + 1
    padded = jnp.pad(flat.astype(dtype), ((0, 0), (pad, pad)))
    return jnp.stack(
        [padded[:, off: off + span] for off in (0, 1, w, w + 1)], axis=-1
    ), pad, span


def sample_variant(masks, coords, mode):
    if mode == "cur":
        return point_sample(masks, coords)
    n, h, w = masks.shape
    x = coords[..., 0] * w - 0.5
    y = coords[..., 1] * h - 0.5
    x0, y0 = jnp.floor(x), jnp.floor(y)
    fx, fy = x - x0, y - y0
    dtype = jnp.bfloat16 if "bf16" in mode else jnp.float32
    wide, pad, span = wide_stack(masks.reshape(n, h * w), w, dtype)
    base = jnp.clip(
        y0.astype(jnp.int32) * w + x0.astype(jnp.int32) + pad, 0, span - 1)
    if mode in ("flat", "flat_bf16"):
        rows = base + jnp.arange(n, dtype=jnp.int32)[:, None] * span
        g4 = jnp.take(wide.reshape(n * span, 4), rows.reshape(-1), axis=0)
        g4 = g4.reshape(n, P, 4)
    elif mode == "unroll":
        g4 = jnp.stack([
            jnp.take(wide[i], base[i], axis=0) for i in range(n)
        ])
    else:  # bf16 batched
        g4 = jnp.take_along_axis(wide, base[:, :, None], axis=1)
    g4 = g4.astype(jnp.float32)
    out = jnp.zeros(coords.shape[:-1], jnp.float32)
    for k, (dy, dx, wgt) in enumerate((
        (0, 0, (1 - fy) * (1 - fx)), (0, 1, (1 - fy) * fx),
        (1, 0, fy * (1 - fx)), (1, 1, fy * fx),
    )):
        xi, yi = x0 + dx, y0 + dy
        valid = (xi >= 0) & (xi <= w - 1) & (yi >= 0) & (yi <= h - 1)
        out = out + g4[..., k] * (wgt * valid.astype(jnp.float32))
    return out


def main():
    rs = np.random.RandomState(0)
    masks = jnp.asarray(rs.rand(N, H, W) > 0.7, jnp.float32)
    coords = jnp.asarray(rs.rand(N, P, 2), jnp.float32)

    ref = np.asarray(sample_variant(masks, coords, "cur"))
    modes = ["cur", "bf16", "flat", "flat_bf16", "unroll"]
    only = sys.argv[1].split(",") if len(sys.argv) > 1 else None
    for mode in modes:
        if only and mode not in only:
            continue
        got = np.asarray(jax.jit(
            lambda m, c, _mode=mode: sample_variant(m, c, _mode))(masks, coords))
        err = np.abs(got - ref).max()
        assert err < 1e-5, (mode, err)  # binary gt: bf16 store is exact

        def fn(c, m, cc, _mode=mode):
            return sample_variant(m, cc + c * 0, _mode).sum()

        def chain(iters):
            def run(m, cc):
                def body(carry, _):
                    return fn(carry, m, cc), None
                o, _ = jax.lax.scan(
                    body, jnp.float32(0.0), None, length=iters)
                return o
            return jax.jit(run)

        r1, r4v = chain(1), chain(4)
        t0 = time.time()
        float(r1(masks, coords)); float(r4v(masks, coords))
        best = float("inf")
        for _ in range(3):
            a = time.perf_counter(); float(r1(masks, coords)); t1 = time.perf_counter() - a
            a = time.perf_counter(); float(r4v(masks, coords)); t4 = time.perf_counter() - a
            best = min(best, (t4 - t1) / 3.0)
        print(f"{mode}: {best*1e3:.2f} ms (err {err:.1e}, compile "
              f"{time.time()-t0:.0f}s)", flush=True)


if __name__ == "__main__":
    main()
