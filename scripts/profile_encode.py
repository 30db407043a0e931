"""Encoder breakdown on TPU: windowed vs global blocks, necks.
Chained-scan differencing per profile_decode.py."""
from __future__ import annotations

import time

import jax
import jax.numpy as jnp

from iuvl_tpu.models.sam.build import Sam, SamConfig
from iuvl_tpu.models.sam import image_encoder as ie


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
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 64, 64, 768), dt)

    for name, wsize, impl in [
        ("windowed block (xla)", 14, "xla"),
        ("windowed block (auto)", 14, "auto"),
        ("global block (auto)", 0, "auto"),
        ("global block (xla)", 0, "xla"),
    ]:
        blk = ie.Block(dim=768, num_heads=12, window_size=wsize,
                       input_size=(64, 64), dtype=dt, attn_impl=impl)
        params = blk.init(jax.random.PRNGKey(1), x[:, :16, :16])

        def f(carry, params, x):
            return blk.apply(params, x + carry.astype(dt) * 1e-12).mean().astype(jnp.float32)

        t = timed_diff(chain(f, 1), chain(f, 9), (params, x), 8.0)
        print(f"{name}: {t*1e3:.2f} ms  (x12 blocks would be {t*12*1e3:.1f})")

    # full encoder
    cfg = SamConfig(dtype="bfloat16", attn_impl="auto")
    model = Sam(cfg=cfg)
    img0 = jnp.zeros((1, 1024, 1024, 3), jnp.float32)
    pts1 = jnp.zeros((1, 1, 2), jnp.float32)
    lab1 = jnp.ones((1, 1), jnp.int32)
    params = jax.jit(lambda r: model.init(r, img0, pts1, lab1))(jax.random.PRNGKey(0))
    img = jax.random.uniform(jax.random.PRNGKey(1), (1, 1024, 1024, 3)) * 255

    def enc(carry, params, img):
        normalized = model.apply(params, img + carry * 1e-12, method=Sam.normalize)
        emb, fpn = model.apply(params, normalized, method=Sam.encode_image)
        return carry + emb.mean().astype(jnp.float32)

    t = timed_diff(chain(enc, 1), chain(enc, 9), (params, img), 8.0)
    print(f"full encode (emb+fpn): {t*1e3:.2f} ms")

    def enc_emb_only(carry, params, img):
        normalized = model.apply(params, img + carry * 1e-12, method=Sam.normalize)
        emb, fpn = model.apply(params, normalized, method=Sam.encode_image)
        # consume only emb; XLA drops the FPN necks
        return carry + emb.mean().astype(jnp.float32)

    # vit trunk only: monkey-free measurement via sam_neck DCE is same as
    # above (fpn unused). Compare with fpn consumed:
    def enc_all(carry, params, img):
        normalized = model.apply(params, img + carry * 1e-12, method=Sam.normalize)
        emb, fpn = model.apply(params, normalized, method=Sam.encode_image)
        extra = sum(v.mean().astype(jnp.float32) for v in fpn.values())
        return carry + emb.mean().astype(jnp.float32) + extra

    t2 = timed_diff(chain(enc_all, 1), chain(enc_all, 9), (params, img), 8.0)
    print(f"full encode + fpn consumed: {t2*1e3:.2f} ms")


if __name__ == "__main__":
    main()
