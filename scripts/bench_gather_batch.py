"""Why does the msdeform flat 2-D gather double per-image cost at batch 2?

Times the exact _bilinear_gather_wide flat-gather form (jnp.take on a
(b*nh*hw, 4d) operand) at b=1 and b=2, plus a b=2 variant that scans two
b=1 gathers (same rows, smaller operand per gather)."""
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
    nh, d, p = 8, 64, 4
    lq = 21504
    rs = np.random.RandomState(0)
    for hw_name, hw in (("res3", 128 * 128), ("res4", 64 * 64)):
        for b in (1, 2):
            v4 = jnp.asarray(rs.rand(b * nh * hw, 4 * d), jnp.bfloat16)
            flat_idx = jnp.asarray(
                rs.randint(0, b * nh * hw, (b * nh * lq * p,)), jnp.int32)

            def one(v4, idx, carry):
                g = jnp.take(v4, idx + (carry * 0).astype(jnp.int32),
                             axis=0, mode="clip")
                return g.astype(jnp.float32).mean()

            def chain(v4, idx, iters):
                def body(carry, _):
                    return one(v4, idx, carry), None
                out, _ = jax.lax.scan(
                    body, jnp.float32(0.0), None, length=iters)
                return out

            r1 = jax.jit(lambda v, i: chain(v, i, 1))
            rk = jax.jit(lambda v, i: chain(v, i, 9))
            ms = timed_diff(r1, rk, (v4, flat_idx), 8.0) * 1e3
            rows = b * nh * lq * p
            print(json.dumps({
                "level": hw_name, "b": b, "ms": round(ms, 2),
                "Mrows_s": round(rows / ms / 1e3, 1),
                "ms_per_img": round(ms / b, 2),
            }), flush=True)

        # b=2 as two scanned b=1 gathers over a (2, nh*hw, 4d) operand.
        v4s = jnp.asarray(rs.rand(2, nh * hw, 4 * d), jnp.bfloat16)
        idxs = jnp.asarray(
            rs.randint(0, nh * hw, (2, nh * lq * p)), jnp.int32)

        def one_scan(v4s, idxs, carry):
            def body(c, inp):
                v, i = inp
                g = jnp.take(v, i + (carry * 0).astype(jnp.int32),
                             axis=0, mode="clip")
                return c + g.astype(jnp.float32).mean(), None
            out, _ = jax.lax.scan(body, jnp.float32(0.0), (v4s, idxs))
            return out

        def chain2(v4s, idxs, iters):
            def body(carry, _):
                return one_scan(v4s, idxs, carry), None
            out, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=iters)
            return out

        r1 = jax.jit(lambda v, i: chain2(v, i, 1))
        rk = jax.jit(lambda v, i: chain2(v, i, 9))
        ms = timed_diff(r1, rk, (v4s, idxs), 8.0) * 1e3
        print(json.dumps({
            "level": hw_name, "b": "2-scanned", "ms": round(ms, 2),
            "ms_per_img": round(ms / 2, 2),
        }), flush=True)


if __name__ == "__main__":
    main()
