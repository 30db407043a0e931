"""Whole-chunk fused decode vs the per-op fused kernels on the real chip.

Times the 256-prompt decode chunk (masks only, the serving consumer) for
twoway_impl in {auto (per-op Pallas kernels), chunk (decode_chunk kernel)}
with chained-scan differencing. Run:
  env PYTHONPATH=/root/.axon_site:/root/repo python scripts/profile_chunk.py
"""
from __future__ import annotations

import time

import jax
import jax.numpy as jnp

from iuvl_tpu.models.sam.build import Sam, SamConfig


def timed_diff(run1, runk, args, k_minus_1: float, repeats: int = 3):
    float(run1(*args))
    float(runk(*args))
    best1 = bestk = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        float(run1(*args))
        best1 = min(best1, time.perf_counter() - t0)
        t0 = time.perf_counter()
        float(runk(*args))
        bestk = min(bestk, time.perf_counter() - t0)
    return (bestk - best1) / k_minus_1


def chain(fn, iters):
    def run(*args):
        def body(carry, _):
            return fn(carry, *args), None
        out, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=iters)
        return out
    return jax.jit(run)


def main():
    chunk = 256
    cfg0 = SamConfig(dtype="bfloat16", attn_impl="auto")
    model0 = Sam(cfg=cfg0)

    images0 = jnp.zeros((1, 1024, 1024, 3), jnp.float32)
    pts1 = jnp.zeros((1, 1, 2), jnp.float32)
    lab1 = jnp.ones((1, 1), jnp.int32)
    params = jax.jit(lambda rng: model0.init(rng, images0, pts1, lab1))(
        jax.random.PRNGKey(0)
    )
    img = jax.random.uniform(jax.random.PRNGKey(1), (1, 1024, 1024, 3)) * 255
    pts = jax.random.uniform(jax.random.PRNGKey(2), (chunk, 1, 2)) * 1024
    labs = jnp.ones((chunk, 1), jnp.int32)

    normalized = jax.jit(lambda p, i: model0.apply(p, i, method=Sam.normalize))(
        params, img
    )
    emb, _ = jax.jit(lambda p, i: model0.apply(p, i, method=Sam.encode_image))(
        params, normalized
    )
    emb = jax.block_until_ready(emb)

    for impl in ("auto", "chunk"):
        model = Sam(cfg=SamConfig(dtype="bfloat16", attn_impl="auto",
                                  twoway_impl=impl))

        def dec_step(carry, params, emb, pts, labs):
            masks = model.apply(
                params, emb + carry.astype(emb.dtype) * 1e-12,
                points=pts, labels=labs,
                method=Sam.decode_from_embedding,
            )["masks"]
            return carry + masks.astype(jnp.float32).mean()

        t = timed_diff(
            chain(dec_step, 1), chain(dec_step, 9),
            (params, emb, pts, labs), 8.0,
        )
        print(f"decode[{impl}]: {t*1e3:.2f} ms/chunk "
              f"({chunk / t:.0f} masks/s decode-only)", flush=True)


if __name__ == "__main__":
    main()
