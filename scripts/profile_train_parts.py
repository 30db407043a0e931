"""Train-step component breakdown on the real chip (chained-scan protocol).

Times, at the profile_train.py config (B=2, 1024^2, bf16, remat, auction
matcher):

  model_fwd   forward_seg only (sum of outputs consumed)
  loss_fwd    forward_seg + criterion (matcher + all losses), no grad
  model_grad  grad of sum(forward_seg outputs) — model fwd+bwd, no criterion
  full_grad   value_and_grad(loss_fn) — the train step minus the optimizer

so criterion-fwd = loss_fwd - model_fwd, model-bwd = model_grad - model_fwd,
criterion-bwd+interactions = full_grad - model_grad - (loss_fwd - model_fwd).

Usage: PYTHONPATH=/root/.axon_site:/root/repo python scripts/profile_train_parts.py [batch]
"""
from __future__ import annotations

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


def main():
    b = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    n_classes = 133
    t_max = 20
    match_points = 12544
    copts = {"xla_tpu_scoped_vmem_limit_kib": 24576}

    set_matcher_impl("auto")  # auto = jv on TPU
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

    def out_sum(params, images):
        outputs = model.apply(params, images, text_emb,
                              method=type(model).forward_seg)
        obj, _ = split_seg_outputs(outputs, model.cfg.num_queries)
        tot = jnp.float32(0.0)
        for v in jax.tree_util.tree_leaves(obj):
            tot = tot + v.astype(jnp.float32).mean()
        return tot

    def loss_val(params, images, rng):
        outputs = model.apply(params, images, text_emb,
                              method=type(model).forward_seg)
        obj, _ = split_seg_outputs(outputs, model.cfg.num_queries)
        losses = criterion(rng, obj, targets, match_points=match_points)
        return sum(losses.values()).astype(jnp.float32)

    def _gsum(tree):
        tot = jnp.float32(0.0)
        for v in jax.tree_util.tree_leaves(tree):
            tot = tot + v.astype(jnp.float32).mean()
        return tot

    def chain(fn, iters):
        def run(*args):
            def body(carry, _):
                return fn(carry, *args), None
            out, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=iters)
            return out
        return jax.jit(run, compiler_options=copts)

    cases = {
        "model_fwd": lambda c, p, i: out_sum(p, i + c * 1e-12),
        "loss_fwd": lambda c, p, i: loss_val(
            p, i + c * 1e-12, jax.random.fold_in(jax.random.PRNGKey(7), 0)),
        "model_grad": lambda c, p, i: _gsum(jax.grad(out_sum)(
            p, i + c * 1e-12)),
        "full_grad": lambda c, p, i: _gsum(jax.grad(loss_val)(
            p, i + c * 1e-12,
            jax.random.fold_in(jax.random.PRNGKey(7), 0))),
    }
    only = sys.argv[2].split(",") if len(sys.argv) > 2 else None
    for name, f in cases.items():
        if only and name not in only:
            continue
        t0 = time.time()
        t = timed_diff(chain(f, 1), chain(f, 3), (params, images), 2.0)
        print(f"{name}: {t*1e3:.1f} ms  (compile {time.time()-t0:.0f}s)",
              flush=True)


if __name__ == "__main__":
    main()
