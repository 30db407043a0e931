"""Hypothesis: a gather whose operand arrives as a lax.scan xs slice runs
~3x faster (operand staged on-chip?) than the same gather on a plain
operand. Reproduce at b=1 with identical shapes, plus sensitivity to
operand size (res3 full map = 64 MB bf16)."""
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


def make(fn):
    def chain(v, idx, iters):
        def body(carry, _):
            return fn(v, idx, carry), None
        out, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=iters)
        return out
    return (jax.jit(lambda v, i: chain(v, i, 1)),
            jax.jit(lambda v, i: chain(v, i, 9)))


def main():
    nh, d, p, lq, hw = 8, 64, 4, 21504, 128 * 128
    rs = np.random.RandomState(0)
    n_idx = nh * lq * p

    v1 = jnp.asarray(rs.rand(1, nh * hw, 4 * d), jnp.bfloat16)
    idx1 = jnp.asarray(rs.randint(0, nh * hw, (1, n_idx)), jnp.int32)

    def xs_scan(v, idx, carry):
        def body(c, inp):
            vv, ii = inp
            g = jnp.take(vv, ii + (carry * 0).astype(jnp.int32), axis=0,
                         mode="clip")
            return c + g.astype(jnp.float32).mean(), None
        out, _ = jax.lax.scan(body, jnp.float32(0.0), (v, idx))
        return out

    r1, rk = make(xs_scan)
    ms = timed_diff(r1, rk, (v1, idx1), 8.0) * 1e3
    print(json.dumps({"variant": "xs_scan_len1", "ms": round(ms, 2),
                      "Mrows_s": round(n_idx / ms / 1e3, 1)}), flush=True)

    # Same but operand passed plain (baseline repeated for sanity).
    v0 = v1[0]
    idx0 = idx1[0]

    def flat(v, idx, carry):
        g = jnp.take(v, idx + (carry * 0).astype(jnp.int32), axis=0,
                     mode="clip")
        return g.astype(jnp.float32).mean()

    r1, rk = make(flat)
    ms = timed_diff(r1, rk, (v0, idx0), 8.0) * 1e3
    print(json.dumps({"variant": "flat", "ms": round(ms, 2),
                      "Mrows_s": round(n_idx / ms / 1e3, 1)}), flush=True)

    # Dynamic-slice the operand inside the jit (no scan) — does a copied
    # operand alone trigger the fast path?
    def sliced(v, idx, carry):
        vv = jax.lax.dynamic_slice_in_dim(
            v, (carry * 0).astype(jnp.int32), 1, 0)[0]
        g = jnp.take(vv, idx, axis=0, mode="clip")
        return g.astype(jnp.float32).mean()

    r1, rk = make(sliced)
    ms = timed_diff(r1, rk, (v1, idx0), 8.0) * 1e3
    print(json.dumps({"variant": "dyn_sliced", "ms": round(ms, 2),
                      "Mrows_s": round(n_idx / ms / 1e3, 1)}), flush=True)


if __name__ == "__main__":
    main()
