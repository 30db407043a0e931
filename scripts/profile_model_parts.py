"""Per-component train-step breakdown (fwd and fwd+bwd) on the real chip.

Isolates the four stages of the seg train step, each as its own jitted
program on fixed random inputs (chained-scan differencing protocol like
scripts/profile_train_parts.py):

  enc   SysLearner.encode_image (patch embed + 12 ViT blocks + necks + FPN)
  pix   DeformablePixelDecoder on fixed FPN features
  dec   UnifiedDecoder (task='seg') on fixed pixel-decoder products
  crit  SegCriterion on fixed head outputs (grad wrt outputs)

Usage: PYTHONPATH=/root/.axon_site:/root/repo \
           python scripts/profile_model_parts.py [batch]
"""
from __future__ import annotations

import dataclasses
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from iuvl_tpu.losses.criterion import CriterionConfig, SegCriterion, SegTargets
from iuvl_tpu.losses.matcher import set_matcher_impl
from iuvl_tpu.models.xdecoder.model import SysLearner, SysLearnerConfig
from iuvl_tpu.train.train_step import split_seg_outputs


def timed_diff(run1, runk, args, k_minus_1: float, repeats: int = 3):
    float(run1(*args)); float(runk(*args))
    b1 = bk = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter(); float(run1(*args)); b1 = min(b1, time.perf_counter() - t0)
        t0 = time.perf_counter(); float(runk(*args)); bk = min(bk, time.perf_counter() - t0)
    return (bk - b1) / k_minus_1


def _gsum(tree):
    tot = jnp.float32(0.0)
    for v in jax.tree_util.tree_leaves(tree):
        tot = tot + v.astype(jnp.float32).mean()
    return tot


def main():
    b = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    n_classes = 133
    t_max = 20
    match_points = 12544
    copts = {"xla_tpu_scoped_vmem_limit_kib": 24576}

    set_matcher_impl("auto")
    cfg = SysLearnerConfig(
        sam_size="base", img_size=1024, dtype="bfloat16", attn_impl="auto",
        msdeform_impl="auto", remat=True,
    )
    model = SysLearner(cfg=cfg)
    img0 = jnp.zeros((1, cfg.img_size, cfg.img_size, 3), jnp.float32)
    text0 = jnp.zeros((n_classes + 1, cfg.syslearner_dim), jnp.float32)
    params = jax.jit(
        lambda r: model.init(r, img0, text0, method=SysLearner.warmup)
    )(jax.random.PRNGKey(0))
    criterion = SegCriterion(CriterionConfig(num_classes=n_classes))

    rs = np.random.RandomState(0)
    images = jnp.asarray(rs.rand(b, cfg.img_size, cfg.img_size, 3) * 255,
                         jnp.float32)
    text_emb = jnp.asarray(rs.randn(n_classes + 1, cfg.syslearner_dim),
                           jnp.float32)
    targets = SegTargets(
        labels=jnp.asarray(rs.randint(0, n_classes, (b, t_max)), jnp.int32),
        masks=jnp.asarray(rs.rand(b, t_max, cfg.img_size, cfg.img_size) > 0.7,
                          jnp.float32),
        valid=jnp.asarray(rs.rand(b, t_max) > 0.3),
    )

    bf = jnp.bfloat16
    g4 = cfg.img_size // 4
    fpn_fixed = {
        "res2": jnp.asarray(rs.randn(b, g4, g4, 128), bf),
        "res3": jnp.asarray(rs.randn(b, g4 // 2, g4 // 2, 256), bf),
        "res4": jnp.asarray(rs.randn(b, g4 // 4, g4 // 4, 512), bf),
        "res5": jnp.asarray(rs.randn(b, g4 // 8, g4 // 8, 1024), bf),
    }
    ms_fixed = [
        jnp.asarray(rs.randn(b, g4 // 8, g4 // 8, 512), bf),
        jnp.asarray(rs.randn(b, g4 // 4, g4 // 4, 512), bf),
        jnp.asarray(rs.randn(b, g4 // 2, g4 // 2, 512), bf),
    ]
    mf_fixed = jnp.asarray(rs.randn(b, g4, g4, 512), bf)

    # Fixed head outputs for the criterion stage.
    def head_only(params, fpn):
        return model.apply(
            params, fpn, text_emb, "seg",
            method=lambda m, f, t, task: m._head(f, t, task, training=True))
    outputs_fixed = jax.jit(head_only)(params, fpn_fixed)
    outputs_fixed = jax.tree_util.tree_map(lambda x: x, outputs_fixed)

    def enc_sum(params, images):
        se, fpn = model.apply(params, images, method=SysLearner.encode_image)
        return _gsum((se, fpn))

    def pix_sum(params, fpn):
        mf, ms = model.apply(
            params, fpn, method=lambda m, f: m.pixel_decoder(f))
        return _gsum((mf, ms))

    def dec_sum(params, ms, mf):
        out = model.apply(
            params, ms, mf,
            method=lambda m, a, c: m.predictor(
                a, c, text_embeddings=text_emb,
                logit_scale=jnp.float32(4.6), task="seg", training=True))
        return _gsum([v for v in jax.tree_util.tree_leaves(out)
                      if v is not None])

    def crit_sum(outputs):
        obj, _ = split_seg_outputs(outputs, model.cfg.num_queries)
        losses = criterion(jax.random.PRNGKey(7), obj, targets,
                           match_points=match_points)
        return sum(losses.values()).astype(jnp.float32)

    def chain(fn, iters):
        def run(*args):
            def body(carry, _):
                return fn(carry, *args), None
            out, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=iters)
            return out
        return jax.jit(run, compiler_options=copts)

    cases = {
        "enc_fwd": (lambda c, p: enc_sum(p, images + c * 1e-12), (params,)),
        "enc_grad": (lambda c, p: _gsum(jax.grad(enc_sum)(
            p, images + c * 1e-12)), (params,)),
        "pix_fwd": (lambda c, p, f: pix_sum(
            p, jax.tree_util.tree_map(lambda t: t + c.astype(t.dtype) * 0, f)),
            (params, fpn_fixed)),
        "pix_grad": (lambda c, p, f: _gsum(jax.grad(pix_sum)(
            p, jax.tree_util.tree_map(
                lambda t: t + c.astype(t.dtype) * 0, f))),
            (params, fpn_fixed)),
        "dec_fwd": (lambda c, p: dec_sum(
            p, [t + c.astype(t.dtype) * 0 for t in ms_fixed], mf_fixed),
            (params,)),
        "dec_grad": (lambda c, p: _gsum(jax.grad(dec_sum)(
            p, [t + c.astype(t.dtype) * 0 for t in ms_fixed], mf_fixed)),
            (params,)),
        "pix_grad_noremat": (lambda c, p, f: _gsum(jax.grad(
            lambda pp, ff: _gsum(SysLearner(cfg=dataclasses.replace(
                cfg, remat=False)).apply(
                    pp, ff, method=lambda m, x: m.pixel_decoder(x))))(
            p, jax.tree_util.tree_map(
                lambda t: t + c.astype(t.dtype) * 0, f))),
            (params, fpn_fixed)),
        "crit_fwd": (lambda c, o: crit_sum(
            jax.tree_util.tree_map(
                lambda t: t + c.astype(t.dtype) * 0 if t is not None else None,
                o)), (outputs_fixed,)),
        "crit_grad": (lambda c, o: _gsum(jax.grad(crit_sum)(
            jax.tree_util.tree_map(
                lambda t: t + c.astype(t.dtype) * 0 if t is not None else None,
                o))), (outputs_fixed,)),
    }
    only = sys.argv[2].split(",") if len(sys.argv) > 2 else None
    for name, (f, args) in cases.items():
        if only and name not in only:
            continue
        t0 = time.time()
        t = timed_diff(chain(f, 1), chain(f, 3), args, 2.0)
        print(f"{name}: {t*1e3:.1f} ms  (compile {time.time()-t0:.0f}s)",
              flush=True)


if __name__ == "__main__":
    main()
