"""Microbench: TPU gather strategies for msdeform (res3-like shapes).

Hypothesis: the HLO gather path is row-rate bound (~123M rows/s measured in
round 1), so packing the 4 bilinear taps into ONE row of a shifted-concat
value map (4x fewer rows, 4x wider rows) should approach a 4x win.
Timing: chained-scan differencing (axon block_until_ready is unreliable).
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/iuvl_jax_cache")


def timeit(fn, *args, iters=20):
    out = fn(*args)
    jax.tree.leaves(out)[0].block_until_ready()
    _ = float(jnp.asarray(jax.tree.leaves(out)[0]).sum())  # host fetch
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    _ = float(jnp.asarray(jax.tree.leaves(out)[0]).sum())
    return (time.perf_counter() - t0) / iters


def main():
    # res3 at 1024^2: HW=16384, heads=8, d=64, Lq=21504, P=4
    hw, nh, d, lq, p = 16384, 8, 64, 21504, 4
    b = 1
    rs = np.random.RandomState(0)
    for dtype in (jnp.float32, jnp.bfloat16):
        v = jnp.asarray(rs.rand(b, nh, hw, d), dtype)
        idx = jnp.asarray(rs.randint(0, hw, (b, nh, lq * p, 1)), jnp.int32)

        @jax.jit
        def tap4(v, idx):
            # 4 gathers of (lq*p) rows each (round-1 baseline shape)
            out = 0.0
            for k in range(4):
                out = out + jnp.take_along_axis(
                    v, jnp.minimum(idx + k, hw - 1), axis=2
                )
            return out

        t = timeit(tap4, v, idx)
        rows = 4 * b * nh * lq * p
        print(f"tap4   {dtype.__name__}: {t*1e3:8.2f} ms  "
              f"{rows/t/1e6:7.1f}M rows/s")

        v4 = jnp.concatenate(
            [v, jnp.roll(v, -1, 2), jnp.roll(v, -128, 2),
             jnp.roll(v, -129, 2)], -1,
        )

        @jax.jit
        def wide(v4, idx):
            return jnp.take_along_axis(v4, idx, axis=2)

        t = timeit(wide, v4, idx)
        rows = b * nh * lq * p
        print(f"wide4d {dtype.__name__}: {t*1e3:8.2f} ms  "
              f"{rows/t/1e6:7.1f}M rows/s  (incl. NO concat build)")

        @jax.jit
        def wide_with_build(v, idx):
            v4 = jnp.concatenate(
                [v, jnp.roll(v, -1, 2), jnp.roll(v, -128, 2),
                 jnp.roll(v, -129, 2)], -1,
            )
            return jnp.take_along_axis(v4, idx, axis=2)

        t = timeit(wide_with_build, v, idx)
        print(f"wide+b {dtype.__name__}: {t*1e3:8.2f} ms  (incl. concat build)")

        # row width sweep: how does rate scale with d?
        for dd in (64, 128, 256, 512):
            vv = jnp.asarray(rs.rand(b, nh, hw, dd), dtype)

            @jax.jit
            def g(vv, idx):
                return jnp.take_along_axis(vv, idx, axis=2)

            t = timeit(g, vv, idx)
            rows = b * nh * lq * p
            print(f"  d={dd:4d} {dtype.__name__}: {t*1e3:8.2f} ms  "
                  f"{rows/t/1e6:7.1f}M rows/s  "
                  f"{rows*dd*v.dtype.itemsize/t/1e9:6.1f} GB/s")


if __name__ == "__main__":
    main()
