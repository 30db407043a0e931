"""Does chunking ONE big gather into a scan of smaller gathers beat the
single flat gather? (b=1, res3-like msdeform shapes, bf16)."""
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
    v4 = jnp.asarray(rs.rand(nh * hw, 4 * d), jnp.bfloat16)
    n_idx = nh * lq * p  # 688128
    idx = jnp.asarray(rs.randint(0, nh * hw, (n_idx,)), jnp.int32)

    def make(fn):
        def chain(v4, idx, iters):
            def body(carry, _):
                return fn(v4, idx, carry), None
            out, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=iters)
            return out
        return (jax.jit(lambda v, i: chain(v, i, 1)),
                jax.jit(lambda v, i: chain(v, i, 9)))

    def flat(v4, idx, carry):
        g = jnp.take(v4, idx + (carry * 0).astype(jnp.int32), axis=0,
                     mode="clip")
        return g.astype(jnp.float32).mean()

    r1, rk = make(flat)
    ms = timed_diff(r1, rk, (v4, idx), 8.0) * 1e3
    print(json.dumps({"variant": "flat", "ms": round(ms, 2),
                      "Mrows_s": round(n_idx / ms / 1e3, 1)}), flush=True)

    for chunks in (2, 4, 8, 16, 32):
        idx_c = idx.reshape(chunks, n_idx // chunks)

        def chunked(v4, idx_c, carry, chunks=chunks):
            def body(c, i):
                g = jnp.take(v4, i + (carry * 0).astype(jnp.int32), axis=0,
                             mode="clip")
                return c + g.astype(jnp.float32).mean(), None
            out, _ = jax.lax.scan(body, jnp.float32(0.0), idx_c)
            return out

        r1, rk = make(chunked)
        ms = timed_diff(r1, rk, (v4, idx_c), 8.0) * 1e3
        print(json.dumps({"variant": f"scan{chunks}", "ms": round(ms, 2),
                          "Mrows_s": round(n_idx / ms / 1e3, 1)}), flush=True)


if __name__ == "__main__":
    main()
