"""Locate the batch>1 cliff in evaluate_seg: time the SAM encode, the
encode_interactive prefix (encode + pixel decoder), and full evaluate_seg
at batch 1 vs 2 with the chained-diff protocol.

NOTE: params must be jit ARGUMENTS — closing over them bakes ~90M weights
into the HLO as constants and the axon remote-compile endpoint rejects the
payload (HTTP 413)."""
import json
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
from iuvl_tpu.models.xdecoder.model import SysLearner, SysLearnerConfig


def timed_diff(run1, runk, args, k_minus_1):
    float(run1(*args)); float(runk(*args))
    b1 = bk = float("inf")
    for _ in range(3):
        t0 = time.perf_counter(); float(run1(*args))
        b1 = min(b1, time.perf_counter() - t0)
        t0 = time.perf_counter(); float(runk(*args))
        bk = min(bk, time.perf_counter() - t0)
    return (bk - b1) / k_minus_1


def main():
    cfg = SysLearnerConfig(
        sam_size="base", img_size=1024, dtype="bfloat16", attn_impl="auto",
        msdeform_impl="auto",
    )
    model = SysLearner(cfg=cfg)
    images0 = jnp.zeros((1, 1024, 1024, 3), jnp.float32)
    text = jnp.zeros((134, cfg.syslearner_dim), jnp.float32)
    params = jax.jit(
        lambda r: model.init(r, images0, text, method=SysLearner.warmup)
    )(jax.random.PRNGKey(0))

    def enc_only(p, i):
        emb, _fpn = model.apply(p, i, method=SysLearner.encode_image)
        return emb.mean().astype(jnp.float32)

    def enc_pix(p, i):
        sam_emb, mf, ms = model.apply(
            p, i, method=SysLearner.encode_interactive)
        return (sam_emb.mean() + mf.mean()).astype(jnp.float32)

    def full(p, i):
        cls_, pred = model.apply(
            p, i, text, method=SysLearner.evaluate_seg)
        return pred.mean().astype(jnp.float32)

    def chain(fn, p, img, iters):
        def body(carry, _):
            out = fn(p, img + carry * 1e-12)
            return out, None
        final, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=iters)
        return final

    for bs in (1, 2):
        img = jax.random.uniform(
            jax.random.PRNGKey(1), (bs, 1024, 1024, 3)) * 255
        for name, fn in (("encode", enc_only), ("enc+pixdec", enc_pix),
                         ("evaluate_seg", full)):
            r1 = jax.jit(lambda p, i, f=fn: chain(f, p, i, 1))
            rk = jax.jit(lambda p, i, f=fn: chain(f, p, i, 9))
            ms = timed_diff(r1, rk, (params, img), 8.0) * 1e3
            print(json.dumps({"batch": bs, "part": name,
                              "ms_per_call": round(ms, 2),
                              "ms_per_img": round(ms / bs, 2)}), flush=True)


if __name__ == "__main__":
    main()
