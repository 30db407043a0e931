"""Breakdown of SAM one-encode/many-decode time on the real chip.

Times (chained-scan differencing, like bench.py):
  - encode only
  - full 256-prompt decode chunk
  - decode sub-stages: two-way transformer alone, upscaling+masks alone
Run: python scripts/profile_decode.py
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
    cfg = SamConfig(dtype="bfloat16", attn_impl="auto")
    model = Sam(cfg=cfg)
    chunk = 256

    images0 = jnp.zeros((1, 1024, 1024, 3), jnp.float32)
    pts1 = jnp.zeros((1, 1, 2), jnp.float32)
    lab1 = jnp.ones((1, 1), jnp.int32)
    params = jax.jit(lambda rng: model.init(rng, images0, pts1, lab1))(
        jax.random.PRNGKey(0)
    )
    img = jax.random.uniform(jax.random.PRNGKey(1), (1, 1024, 1024, 3)) * 255
    pts = jax.random.uniform(jax.random.PRNGKey(2), (chunk, 1, 2)) * 1024
    labs = jnp.ones((chunk, 1), jnp.int32)

    # --- encode --- #
    def enc_step(carry, params, img):
        normalized = model.apply(params, img + carry * 1e-12, method=Sam.normalize)
        emb, _ = model.apply(params, normalized, method=Sam.encode_image)
        return carry + emb.mean().astype(jnp.float32)

    t_enc = timed_diff(
        chain(enc_step, 1), chain(enc_step, 9), (params, img), 8.0
    )
    print(f"encode: {t_enc*1e3:.2f} ms")

    # --- full decode chunk --- #
    normalized = jax.jit(lambda p, i: model.apply(p, i, method=Sam.normalize))(
        params, img
    )
    emb, _ = jax.jit(lambda p, i: model.apply(p, i, method=Sam.encode_image))(
        params, normalized
    )

    def dec_step(carry, params, emb, pts, labs):
        masks = model.apply(
            params, emb + carry * 1e-12, points=pts, labels=labs,
            method=Sam.decode_from_embedding,
        )["masks"]
        return carry + masks.mean().astype(jnp.float32)

    t_dec = timed_diff(
        chain(dec_step, 1), chain(dec_step, 17), (params, emb, pts, labs), 16.0
    )
    print(f"decode chunk({chunk}): {t_dec*1e3:.2f} ms "
          f"-> masks/s incl encode = {1024/(t_enc + 4*t_dec):.0f}")

    # implied total
    total = t_enc + 4 * t_dec
    print(f"per-image total: {total*1e3:.1f} ms (encode {t_enc/total*100:.0f}%)")


if __name__ == "__main__":
    main()
