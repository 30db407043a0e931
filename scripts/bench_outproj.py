"""Out-projection formulations for the global block's (b, heads, n, d)
attention output — the relayout+matmul piece measured at 0.794 ms/block
(scripts/profile_global_block.py), now the largest global-block component.

Variants:
  xpose    transpose(0,2,1,3).reshape(b,n,C) @ Wo            (current)
  einsum   einsum('bhnd,hdc->bnc', o, Wo3)                   (no explicit T)
  dotgen   dot_general contracting {h,d} in one dot
  pad128   from the kernel's padded (b,h,n,128) output with zero-padded Wo
           (skips the [..., :64] slice relayout the serving path pays)

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/bench_outproj.py
"""
from __future__ import annotations

import time

import jax
import jax.numpy as jnp


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
    dt = jnp.bfloat16
    heads, d, c, n = 12, 64, 768, 4096
    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 4)
    o = jax.random.normal(ks[0], (1, heads, n, d), dt)
    op = jnp.pad(o, ((0, 0), (0, 0), (0, 0), (0, 64)))
    wo = jax.random.normal(ks[1], (c, c), jnp.float32) * 0.02
    bo = jnp.zeros((c,), jnp.float32)
    wo3 = wo.reshape(heads, d, c)
    wo3p = jnp.pad(wo3, ((0, 0), (0, 64), (0, 0)))

    def xpose(carry, o_):
        y = (o_ + carry.astype(dt) * 1e-12).transpose(0, 2, 1, 3).reshape(1, n, c)
        y = y @ wo.astype(dt) + bo.astype(dt)
        return y.mean().astype(jnp.float32)

    def einsum(carry, o_):
        y = jnp.einsum("bhnd,hdc->bnc", o_ + carry.astype(dt) * 1e-12,
                       wo3.astype(dt)) + bo.astype(dt)
        return y.mean().astype(jnp.float32)

    def dotgen(carry, o_):
        y = jax.lax.dot_general(
            o_ + carry.astype(dt) * 1e-12, wo3.astype(dt),
            (((1, 3), (0, 1)), ((), ())))  # (b, n, c)
        return (y + bo.astype(dt)).mean().astype(jnp.float32)

    def pad128(carry, o_):
        y = jnp.einsum("bhnd,hdc->bnc", o_ + carry.astype(dt) * 1e-12,
                       wo3p.astype(dt)) + bo.astype(dt)
        return y.mean().astype(jnp.float32)

    def pad128_slice(carry, o_):
        y = (o_ + carry.astype(dt) * 1e-12)[..., :d]
        y = y.transpose(0, 2, 1, 3).reshape(1, n, c) @ wo.astype(dt) + bo.astype(dt)
        return y.mean().astype(jnp.float32)

    for name, fn, args in [
        ("xpose", xpose, (o,)),
        ("einsum", einsum, (o,)),
        ("dotgen", dotgen, (o,)),
        ("pad128", pad128, (op,)),
        ("pad128_slice+xpose", pad128_slice, (op,)),
    ]:
        t = timed_diff(chain(fn, 1), chain(fn, 9), args, 8.0)
        print(f"{name}: {t*1e3:.3f} ms")


if __name__ == "__main__":
    main()
