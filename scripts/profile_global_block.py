"""Global-attention block component breakdown (chained-scan differencing).

The encoder is now dominated by the 4 global blocks (~1.67 ms each at
1024^2 bf16 vs 0.26 ms windowed, scripts/profile_encode.py). This times
the pieces of one global block in isolation to find the residual:

  ln1        LayerNorm fp32 + bf16 cast
  qkv+split  qkv matmul + (b, heads, n, d) relayouts
  augment    rel_h/rel_w fp32 einsums + one-hot concats (augment_qk_rel_pos)
  flash      the Pallas flash kernel on pre-augmented q/k
  proj       out transpose/reshape + output projection
  tail       fused block-tail kernel (residual+LN2+MLP+residual)

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/profile_global_block.py
"""
from __future__ import annotations

import time

import jax
import jax.numpy as jnp

from iuvl_tpu.ops.rel_pos_attention import augment_qk_rel_pos
from iuvl_tpu.ops.pallas.flash_attention import flash_attention
from iuvl_tpu.ops.pallas.mlp_block import block_tail


def timed_diff(run1, runk, args, k_minus_1: float, repeats: int = 3):
    float(run1(*args)); float(runk(*args))
    b1 = bk = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter(); float(run1(*args)); b1 = min(b1, time.perf_counter() - t0)
        t0 = time.perf_counter(); float(runk(*args)); bk = min(bk, time.perf_counter() - t0)
    return (bk - b1) / k_minus_1


def chain(fn, iters):
    def run(*args):
        def body(carry, _):
            return fn(carry, *args), None
        out, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=iters)
        return out
    return jax.jit(run)


def main():
    dt = jnp.bfloat16
    heads, d, c, n = 12, 64, 768, 4096
    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 12)
    x = jax.random.normal(ks[0], (1, n, c), dt)
    wqkv = jax.random.normal(ks[1], (c, 3 * c), jnp.float32) * 0.02
    bqkv = jnp.zeros((3 * c,), jnp.float32)
    wo = jax.random.normal(ks[2], (c, c), jnp.float32) * 0.02
    bo = jnp.zeros((c,), jnp.float32)
    rph = jax.random.normal(ks[3], (127, d), jnp.float32) * 0.02
    rpw = jax.random.normal(ks[4], (127, d), jnp.float32) * 0.02
    q = jax.random.normal(ks[5], (1, heads, n, d), dt)
    k = jax.random.normal(ks[6], (1, heads, n, d), dt)
    v = jax.random.normal(ks[7], (1, heads, n, d), dt)
    qa = jax.random.normal(ks[8], (1, heads, n, d + 128), dt)
    ka = jax.random.normal(ks[9], (1, heads, n, d + 128), dt)
    sc = jnp.ones((c,), jnp.float32)
    bi = jnp.zeros((c,), jnp.float32)
    w1 = jax.random.normal(ks[10], (c, 4 * c), jnp.float32) * 0.02
    b1 = jnp.zeros((4 * c,), jnp.float32)
    w2 = jax.random.normal(ks[11], (4 * c, c), jnp.float32) * 0.02
    b2 = jnp.zeros((c,), jnp.float32)

    def ln1(carry, x):
        xf = (x + carry.astype(dt) * 1e-12).astype(jnp.float32)
        mu = xf.mean(-1, keepdims=True)
        var = jnp.maximum((xf * xf).mean(-1, keepdims=True) - mu * mu, 0.0)
        y = ((xf - mu) * jax.lax.rsqrt(var + 1e-6)).astype(dt)
        return y.mean().astype(jnp.float32)

    def qkv_split(carry, x):
        qkv = (x + carry.astype(dt) * 1e-12) @ wqkv.astype(dt) + bqkv.astype(dt)
        qkv = qkv.reshape(1, n, 3, heads, d)
        q_, k_, v_ = jnp.moveaxis(qkv, 2, 0)
        q_, k_, v_ = (t.transpose(0, 2, 1, 3) for t in (q_, k_, v_))
        return (q_.mean() + k_.mean() + v_.mean()).astype(jnp.float32)

    def augment(carry, q, k):
        qa_, ka_ = augment_qk_rel_pos(
            q + carry.astype(dt) * 1e-12, k, rph, rpw, (64, 64))
        return (qa_.mean() + ka_.mean()).astype(jnp.float32)

    def flash(carry, qa, ka, v):
        o = flash_attention(qa + carry.astype(dt) * 1e-12, ka, v,
                            softmax_scale=1.0, block_q=2048, block_k=1024)
        return o.mean().astype(jnp.float32)

    def proj(carry, v, x):
        o = (v + carry.astype(dt) * 1e-12).transpose(0, 2, 1, 3).reshape(1, n, c)
        o = o @ wo.astype(dt) + bo.astype(dt)
        return o.mean().astype(jnp.float32)

    def tail(carry, x):
        o = block_tail((x + carry.astype(dt) * 1e-12).reshape(n, c),
                       x.reshape(n, c), sc, bi, w1, b1, w2, b2)
        return o.mean().astype(jnp.float32)

    for name, fn, args in [
        ("ln1", ln1, (x,)),
        ("qkv+split", qkv_split, (x,)),
        ("augment", augment, (q, k)),
        ("flash", flash, (qa, ka, v)),
        ("proj", proj, (v, x)),
        ("tail", tail, (x,)),
    ]:
        t = timed_diff(chain(fn, 1), chain(fn, 9), args, 8.0)
        print(f"{name}: {t*1e3:.3f} ms")


if __name__ == "__main__":
    main()
