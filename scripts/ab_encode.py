"""Clean full-encoder timing (chained-scan differencing). Run solo."""
from __future__ import annotations

import time

import jax
import jax.numpy as jnp

from iuvl_tpu.models.sam.build import Sam, SamConfig


def chain(fn, iters):
    def run(*args):
        def body(carry, _):
            return fn(carry, *args), None
        out, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=iters)
        return out
    return jax.jit(run)


def main():
    import sys
    impl = sys.argv[1] if len(sys.argv) > 1 else "auto"
    cfg = SamConfig(dtype="bfloat16", attn_impl=impl)
    model = Sam(cfg=cfg)
    img0 = jnp.zeros((1, 1024, 1024, 3), jnp.float32)
    pts1 = jnp.zeros((1, 1, 2), jnp.float32)
    lab1 = jnp.ones((1, 1), jnp.int32)
    params = jax.jit(lambda r: model.init(r, img0, pts1, lab1))(
        jax.random.PRNGKey(0))
    img = jax.random.uniform(jax.random.PRNGKey(1), (1, 1024, 1024, 3)) * 255

    def f(carry, params, img):
        normalized = model.apply(params, img + carry * 1e-12,
                                 method=Sam.normalize)
        emb, _ = model.apply(params, normalized, method=Sam.encode_image)
        return emb.mean().astype(jnp.float32)

    run1, runk = chain(f, 1), chain(f, 9)
    float(run1(params, img)); float(runk(params, img))
    b1 = bk = float("inf")
    for _ in range(5):
        t0 = time.perf_counter(); float(run1(params, img))
        b1 = min(b1, time.perf_counter() - t0)
        t0 = time.perf_counter(); float(runk(params, img))
        bk = min(bk, time.perf_counter() - t0)
    print(f"encode[{impl}]: {(bk - b1) / 8 * 1e3:.2f} ms")


if __name__ == "__main__":
    main()
