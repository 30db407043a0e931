"""Windowed-attention sublayer breakdown on TPU (chained-scan differencing).

Locates where the ~0.5 ms/block of non-FLOP time goes in the SAM ViT
windowed blocks (8 of 12 blocks at 1024^2): LN, partition, qkv, rel-pos
augment, attention core, proj, unpartition, MLP — each timed standalone and
cumulatively, so the fused-kernel design targets the measured overhead
rather than the guessed one.
"""
from __future__ import annotations

import functools
import time

import jax
import jax.numpy as jnp

from iuvl_tpu.models.sam import image_encoder as ie
from iuvl_tpu.ops.rel_pos_attention import augment_qk_rel_pos, rel_pos_attention


def timed(fn, args, iters=24, repeats=3):
    def chain(n):
        def run(*a):
            def body(carry, _):
                return fn(carry, *a), None
            out, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=n)
            return out
        return jax.jit(run)
    r1, rk = chain(1), chain(iters)
    float(r1(*args)); float(rk(*args))
    b1 = bk = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter(); float(r1(*args)); b1 = min(b1, time.perf_counter() - t0)
        t0 = time.perf_counter(); float(rk(*args)); bk = min(bk, time.perf_counter() - t0)
    return (bk - b1) / (iters - 1)


def main():
    dt = jnp.bfloat16
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (1, 64, 64, 768), dt)
    w = 14
    nh, hd = 12, 64
    wqkv = jax.random.normal(key, (768, 2304), dt) * 0.02
    wproj = jax.random.normal(key, (768, 768), dt) * 0.02
    w1 = jax.random.normal(key, (768, 3072), dt) * 0.02
    w2 = jax.random.normal(key, (3072, 768), dt) * 0.02
    rel_h = jax.random.normal(key, (2 * w - 1, hd), jnp.float32) * 0.02
    rel_w = jax.random.normal(key, (2 * w - 1, hd), jnp.float32) * 0.02

    def inject(carry, t):
        return t + carry.astype(t.dtype) * 1e-12

    def ln(carry, x):
        y = ie.LayerNorm2d()(inject(carry, x)) if False else None
        return y

    # --- pieces ---
    def f_ln(carry, x):
        xf = inject(carry, x).astype(jnp.float32)
        m = xf.mean(-1, keepdims=True)
        v = ((xf - m) ** 2).mean(-1, keepdims=True)
        return (((xf - m) * jax.lax.rsqrt(v + 1e-6)).astype(dt)).mean().astype(jnp.float32)

    def partition(x):
        y, pad_hw = ie.window_partition(x, w)
        return y, pad_hw

    def f_partition(carry, x):
        y, _ = partition(inject(carry, x))
        return y.mean().astype(jnp.float32)

    def f_qkv(carry, x):
        y, _ = partition(inject(carry, x))
        q = y.reshape(25, w * w, 768) @ wqkv
        return q.mean().astype(jnp.float32)

    def heads(t):  # (25, 196, 768) -> (25, 12, 196, 64)
        return t.reshape(25, w * w, nh, hd).transpose(0, 2, 1, 3)

    def f_attn(carry, x):
        y, _ = partition(inject(carry, x))
        qkv = (y.reshape(25, w * w, 768) @ wqkv).reshape(25, w * w, 3, nh, hd)
        q, k, v = (qkv[:, :, i].transpose(0, 2, 1, 3) for i in range(3))
        o = rel_pos_attention(q, k, v, rel_h, rel_w, (w, w), impl="xla")
        return o.mean().astype(jnp.float32)

    def f_attn_proj(carry, x):
        y, pad_hw = partition(inject(carry, x))
        qkv = (y.reshape(25, w * w, 768) @ wqkv).reshape(25, w * w, 3, nh, hd)
        q, k, v = (qkv[:, :, i].transpose(0, 2, 1, 3) for i in range(3))
        o = rel_pos_attention(q, k, v, rel_h, rel_w, (w, w), impl="xla")
        o = o.transpose(0, 2, 1, 3).reshape(25, w, w, 768) @ wproj
        o = ie.window_unpartition(o.reshape(25, w, w, 768), w, pad_hw, (64, 64))
        return o.mean().astype(jnp.float32)

    def f_mlp(carry, x):
        y = inject(carry, x)
        y = y.reshape(1, 4096, 768)
        return (ie.gelu(y @ w1) @ w2).mean().astype(jnp.float32)

    def f_attn_noaug(carry, x):
        # attention core WITHOUT rel-pos augmentation (plain sdpa)
        y, _ = partition(inject(carry, x))
        qkv = (y.reshape(25, w * w, 768) @ wqkv).reshape(25, w * w, 3, nh, hd)
        q, k, v = (qkv[:, :, i].transpose(0, 2, 1, 3) for i in range(3))
        s = jnp.einsum("bnqd,bnkd->bnqk", q * hd ** -0.5, k,
                       preferred_element_type=jnp.float32)
        p = jax.nn.softmax(s, -1).astype(dt)
        o = jnp.einsum("bnqk,bnkd->bnqd", p, v)
        return o.mean().astype(jnp.float32)

    def f_aug_only(carry, x):
        y, _ = partition(inject(carry, x))
        qkv = (y.reshape(25, w * w, 768) @ wqkv).reshape(25, w * w, 3, nh, hd)
        q, k, v = (qkv[:, :, i].transpose(0, 2, 1, 3) for i in range(3))
        qa, ka = augment_qk_rel_pos(q, k, rel_h, rel_w, (w, w))
        return (qa.mean() + ka.mean()).astype(jnp.float32)

    blk = ie.Block(dim=768, num_heads=12, window_size=w, input_size=(64, 64),
                   dtype=dt, attn_impl="xla")
    params = blk.init(jax.random.PRNGKey(1), x[:, :16, :16])

    def f_block(carry, x):
        return blk.apply(params, inject(carry, x)).mean().astype(jnp.float32)

    for name, f in [
        ("full block", f_block),
        ("ln only", f_ln),
        ("ln+partition", f_partition),
        ("+qkv", f_qkv),
        ("+heads+rel-pos attn", f_attn),
        ("+proj+unpartition", f_attn_proj),
        ("attn core plain (no rel-pos)", f_attn_noaug),
        ("qkv+heads+augment only", f_aug_only),
        ("mlp only", f_mlp),
    ]:
        t = timed(f, (x,))
        print(f"{name}: {t*1e3:.3f} ms")


if __name__ == "__main__":
    main()
