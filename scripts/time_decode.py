"""Time ONE full 256-prompt decode chunk (chained-scan differencing)."""
from __future__ import annotations
import time
import jax
import jax.numpy as jnp
from iuvl_tpu.models.sam.build import Sam, SamConfig


def main():
    cfg = SamConfig(dtype="bfloat16", attn_impl="auto")
    model = Sam(cfg=cfg)
    chunk = 256
    img0 = jnp.zeros((1, 1024, 1024, 3), jnp.float32)
    p = jax.jit(lambda r: model.init(r, img0, jnp.zeros((1, 1, 2)),
                                     jnp.ones((1, 1), jnp.int32)))(
        jax.random.PRNGKey(0))
    emb, _ = jax.jit(lambda p, i: model.apply(
        p, model.apply(p, i, method=Sam.normalize), method=Sam.encode_image))(
        p, jax.random.uniform(jax.random.PRNGKey(1), (1, 1024, 1024, 3)) * 255)
    pts = jax.random.uniform(jax.random.PRNGKey(2), (chunk, 1, 2)) * 1024
    labs = jnp.ones((chunk, 1), jnp.int32)

    def dec(c, p, emb, pts, labs):
        out = model.apply(p, emb + c * 1e-12, points=pts, labels=labs,
                          method=Sam.decode_from_embedding)["masks"]
        return c + out.mean().astype(jnp.float32)

    def chain(iters):
        def run(p, emb, pts, labs):
            def body(c, _):
                return dec(c, p, emb, pts, labs), None
            out, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=iters)
            return out
        return jax.jit(run)

    run1, runk = chain(1), chain(17)
    args = (p, emb, pts, labs)
    float(run1(*args)); float(runk(*args))
    b1 = bk = float("inf")
    for _ in range(5):
        t0 = time.perf_counter(); float(run1(*args))
        b1 = min(b1, time.perf_counter() - t0)
        t0 = time.perf_counter(); float(runk(*args))
        bk = min(bk, time.perf_counter() - t0)
    print(f"full decode chunk: {(bk - b1) / 16 * 1e3:.2f} ms", flush=True)


if __name__ == "__main__":
    main()
