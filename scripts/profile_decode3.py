"""Truncation study of the batch-1 fast-path mask decoder on TPU.

Times the real decode_from_embedding with pieces disabled, to localize the
remaining per-chunk cost. Chained-scan differencing per profile_decode.py.
"""
from __future__ import annotations

import time

import jax
import jax.numpy as jnp

from iuvl_tpu.models.sam.build import Sam, SamConfig
from iuvl_tpu.models.sam import mask_decoder as md


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

    normalized = jax.jit(lambda p, i: model.apply(p, i, method=Sam.normalize))(params, img)
    emb, _ = jax.jit(lambda p, i: model.apply(p, i, method=Sam.encode_image))(params, normalized)

    def run_dec(carry, params, emb, pts, labs):
        out = model.apply(
            params, emb + carry * 1e-12, points=pts, labels=labs,
            method=Sam.decode_from_embedding,
        )["masks"]
        return carry + out.mean().astype(jnp.float32)

    variants = {}

    # full
    variants["full decode"] = run_dec

    # transformer-only: monkeypatch to skip the upscale (masks = dummy from keys)
    orig_call = md.MaskDecoder.__call__

    t = timed_diff(chain(run_dec, 1), chain(run_dec, 17),
                   (params, emb, pts, labs), 16.0)
    print(f"full decode chunk: {t*1e3:.2f} ms")

    # Depth-restricted transformer + skip upscale via env-style flags.
    # Instead of monkeypatching flax modules (param tree mismatch), time the
    # raw submodules with extracted params.
    dparams = {"params": params["params"]["mask_decoder"]}
    tw = md.TwoWayTransformer(dtype=jnp.bfloat16)
    twp = {"params": dparams["params"]["transformer"]}
    toks = jax.random.normal(jax.random.PRNGKey(3), (chunk, 12, 256), jnp.bfloat16)
    img_pe = jax.random.normal(jax.random.PRNGKey(4), (1, 64, 64, 256), jnp.bfloat16)

    def run_tw(carry, twp, emb, img_pe, toks):
        hs, keys = tw.apply(twp, emb + carry.astype(emb.dtype) * 1e-12, img_pe, toks)
        return carry + hs.mean().astype(jnp.float32) + keys.mean().astype(jnp.float32)

    embb = emb.astype(jnp.bfloat16)
    t = timed_diff(chain(run_tw, 1), chain(run_tw, 17),
                   (twp, embb, img_pe, toks), 16.0)
    print(f"two-way transformer alone: {t*1e3:.2f} ms")

    # keys output consumed, queries ignored (lets XLA drop query-side work)
    def run_tw_keys(carry, twp, emb, img_pe, toks):
        hs, keys = tw.apply(twp, emb + carry.astype(emb.dtype) * 1e-12, img_pe, toks)
        return carry + keys.mean().astype(jnp.float32)

    t = timed_diff(chain(run_tw_keys, 1), chain(run_tw_keys, 17),
                   (twp, embb, img_pe, toks), 16.0)
    print(f"two-way keys-only (queries DCEd): {t*1e3:.2f} ms")


if __name__ == "__main__":
    main()
