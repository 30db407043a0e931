"""Scaling probe for the scanned-operand gather anomaly: operand xs of
length L, one 688k-row gather per step. If ms grows linearly in L at
~240M rows/s the fast path is real; if it flattens it's a timing artifact."""
import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def timed_diff(run1, runk, args, k_minus_1):
    float(run1(*args)); float(runk(*args))
    b1 = bk = float("inf")
    for _ in range(3):
        t0 = time.perf_counter(); float(run1(*args))
        b1 = min(b1, time.perf_counter() - t0)
        t0 = time.perf_counter(); float(runk(*args))
        bk = min(bk, time.perf_counter() - t0)
    return (bk - b1) / k_minus_1


def main():
    nh, d, p, lq, hw = 8, 64, 4, 21504, 128 * 128
    rs = np.random.RandomState(0)
    n_idx = nh * lq * p
    for L in (1, 2, 3, 4, 8):
        v = jnp.asarray(rs.rand(L, nh * hw, 4 * d), jnp.bfloat16)
        idx = jnp.asarray(rs.randint(0, nh * hw, (L, n_idx)), jnp.int32)

        def inner(v, idx, carry):
            def body(c, inp):
                vv, ii = inp
                g = jnp.take(vv, ii + (carry * 0).astype(jnp.int32), axis=0,
                             mode="clip")
                return c + g.astype(jnp.float32).mean(), None
            out, _ = jax.lax.scan(body, jnp.float32(0.0), (v, idx))
            return out

        def chain(v, idx, iters):
            def body(carry, _):
                return inner(v, idx, carry), None
            out, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=iters)
            return out

        r1 = jax.jit(lambda v, i: chain(v, i, 1))
        rk = jax.jit(lambda v, i: chain(v, i, 9))
        ms = timed_diff(r1, rk, (v, idx), 8.0) * 1e3
        rows = L * n_idx
        print(json.dumps({"L": L, "ms": round(ms, 2),
                          "ms_per_step": round(ms / L, 2),
                          "Mrows_s": round(rows / ms / 1e3, 1)}), flush=True)


if __name__ == "__main__":
    main()
