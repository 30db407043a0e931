"""Microbenchmark the SAM mask-decoder decode chunk piece by piece on TPU.

Timing protocol: each piece is wrapped in a lax.scan chained by a scalar
carry (data dependency serializes iterations inside ONE device program) and
forced with a host scalar fetch; per-iter time = (t_K - t_1) / (K - 1).
This is required — over the axon tunnel, block_until_ready on queued
dispatches does not reflect true device time (measured 5861 "TFLOP/s").
"""
from __future__ import annotations

import time

import jax
import jax.numpy as jnp

from iuvl_tpu.models.sam.mask_decoder import TwoWayTransformer

B, HW, C, T = 256, 4096, 256, 7
DT = jnp.bfloat16
K = 9


def chain_time(fn, *args, k=K, repeats=3):
    """fn(carry, *args) -> scalar contribution. Returns per-iter ms."""
    def run(iters):
        def prog(*args):
            def body(carry, _):
                return carry + fn(carry, *args), None
            out, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=iters)
            return out
        return jax.jit(prog)

    r1, rk = run(1), run(k)
    float(r1(*args)); float(rk(*args))
    b1 = bk = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter(); float(r1(*args)); b1 = min(b1, time.perf_counter() - t0)
        t0 = time.perf_counter(); float(rk(*args)); bk = min(bk, time.perf_counter() - t0)
    return (bk - b1) / (k - 1) * 1e3


def main():
    rng = jax.random.PRNGKey(0)
    keys = jax.random.normal(rng, (B, HW, C), DT)
    tokens = jax.random.normal(rng, (B, T, C), DT)

    # A. full two-way transformer
    tw = TwoWayTransformer(dtype=DT)
    img = keys.reshape(B, 64, 64, C)
    params = tw.init(rng, img[:1, :8, :8], img[:1, :8, :8], tokens[:1])
    def f_tw(carry, params, img, tokens):
        q, kk = tw.apply(params, img + carry * 1e-12, img, tokens)
        return q.mean().astype(jnp.float32) + kk.mean().astype(jnp.float32)
    print(f"A two-way transformer: {chain_time(f_tw, params, img, tokens):.2f} ms")

    # B. Dense 256->128 over keys
    w = jax.random.normal(rng, (C, 128), DT)
    def f_proj(carry, x, w):
        return ((x + carry * 1e-12) @ w).mean().astype(jnp.float32)
    print(f"B proj keys->128: {chain_time(f_proj, keys, w):.3f} ms")

    # C. fp32 layernorm over keys
    def f_ln(carry, x):
        xf = (x + carry * 1e-12).astype(jnp.float32)
        mu = xf.mean(-1, keepdims=True)
        va = ((xf - mu) ** 2).mean(-1, keepdims=True)
        y = (xf - mu) * jax.lax.rsqrt(va + 1e-5)
        return y.astype(x.dtype).mean().astype(jnp.float32)
    print(f"C fp32 LN keys: {chain_time(f_ln, keys):.3f} ms")

    # D. t2i attention core
    qp = jax.random.normal(rng, (B, 8, T, 16), DT)
    kp = jax.random.normal(rng, (B, 8, HW, 16), DT)
    vp = jax.random.normal(rng, (B, 8, HW, 16), DT)
    def attn_core(carry, qp, kp, vp):
        a = jnp.einsum("bhqd,bhkd->bhqk", qp + carry * 1e-12, kp,
                       preferred_element_type=jnp.float32)
        a = jax.nn.softmax(a, -1).astype(vp.dtype)
        return jnp.einsum("bhqk,bhkd->bhqd", a, vp).mean().astype(jnp.float32)
    print(f"D t2i attn core: {chain_time(attn_core, qp, kp, vp):.3f} ms")

    # E. i2t attention core
    qp2 = jax.random.normal(rng, (B, 8, HW, 16), DT)
    kp2 = jax.random.normal(rng, (B, 8, T, 16), DT)
    vp2 = jax.random.normal(rng, (B, 8, T, 16), DT)
    print(f"E i2t attn core: {chain_time(attn_core, qp2, kp2, vp2):.3f} ms")

    # F. upscale deconvs + masks einsum
    wd1 = jax.random.normal(rng, (2, 2, C, 64), DT)
    wd2 = jax.random.normal(rng, (2, 2, 64, 32), DT)
    hyper = jax.random.normal(rng, (B, 4, 32), DT)
    def f_ups(carry, x, wd1, wd2, hyper):
        x = x.reshape(B, 64, 64, C) + carry.astype(x.dtype) * 1e-12
        y = jax.lax.conv_transpose(x, wd1, (2, 2), "VALID",
                                   dimension_numbers=("NHWC", "HWIO", "NHWC"))
        y = jax.nn.gelu(y)
        y = jax.lax.conv_transpose(y, wd2, (2, 2), "VALID",
                                   dimension_numbers=("NHWC", "HWIO", "NHWC"))
        y = jax.nn.gelu(y)
        m = jnp.einsum("bmc,bhwc->bmhw", hyper, y,
                       preferred_element_type=jnp.float32)
        return m.mean()
    print(f"F deconvs+masks: {chain_time(f_ups, keys, wd1, wd2, hyper):.2f} ms")

    # G. broadcast emb + add dense
    emb1 = jax.random.normal(rng, (1, 64, 64, C), DT)
    dense = jax.random.normal(rng, (B, 64, 64, C), DT)
    def f_bc(carry, e, d):
        return (jnp.broadcast_to(e + carry * 1e-12, d.shape) + d).mean().astype(jnp.float32)
    print(f"G tile+add: {chain_time(f_bc, emb1, dense):.3f} ms")


if __name__ == "__main__":
    main()
