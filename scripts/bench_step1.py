"""Standalone step1 full-train-step bench (forward + criterion + backward +
adamw at the reference's B=2/chip 1024^2 shape) with env knobs, mirroring
bench.py's step1 section:

  IUVL_SCOPED_VMEM_KIB   xla_tpu_scoped_vmem_limit_kib (default 49152 —
                         round-5 A/B: the scheduler keeps backward
                         re-gather operands in scoped VMEM, see
                         scripts/ab_pixgrad_r5.py)
  IUVL_SORTED_DV_SCATTER  opt-in sorted d_value scatter (default off)

Usage: PYTHONPATH=/root/.axon_site:/root/repo python scripts/bench_step1.py
Prints one JSON line {"step1_train_images_per_sec_per_chip": ..., ...}.
"""
from __future__ import annotations

import json
import os
import sys
import time


def run_step1_bench(batch: int = 2):
    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from iuvl_tpu.losses.criterion import (
        CriterionConfig, SegCriterion, SegTargets,
    )
    from iuvl_tpu.losses.matcher import set_matcher_impl
    from iuvl_tpu.models.xdecoder.model import SysLearner, SysLearnerConfig
    from iuvl_tpu.train.optimizer import build_optimizer
    from iuvl_tpu.train.train_step import TrainState, split_seg_outputs

    set_matcher_impl("auto")  # jv on TPU
    bt, t_max, n_cls = batch, 20, 133
    cfg = SysLearnerConfig(
        sam_size="base", img_size=1024, dtype="bfloat16",
        attn_impl="auto", msdeform_impl="auto", remat=True,
    )
    model = SysLearner(cfg=cfg)
    images0 = jnp.zeros((1, 1024, 1024, 3), jnp.float32)
    text0 = jnp.zeros((n_cls + 1, cfg.syslearner_dim), jnp.float32)
    params = jax.jit(
        lambda r: model.init(r, images0, text0, method=SysLearner.warmup)
    )(jax.random.PRNGKey(0))
    criterion = SegCriterion(CriterionConfig(num_classes=n_cls))
    tx = build_optimizer(params, base_lr=1e-4, total_steps=1000)
    rs = np.random.RandomState(0)
    images = jnp.asarray(rs.rand(bt, 1024, 1024, 3) * 255, jnp.float32)
    text = jnp.asarray(rs.randn(n_cls + 1, cfg.syslearner_dim), jnp.float32)
    targets = SegTargets(
        labels=jnp.asarray(rs.randint(0, n_cls, (bt, t_max)), jnp.int32),
        masks=jnp.asarray(rs.rand(bt, t_max, 1024, 1024) > 0.7, jnp.float32),
        valid=jnp.asarray(rs.rand(bt, t_max) > 0.3),
    )

    def loss_fn(params, images, rng):
        outputs = model.apply(params, images, text,
                              method=SysLearner.forward_seg)
        obj, _ = split_seg_outputs(outputs, model.cfg.num_queries)
        losses = criterion(rng, obj, targets, match_points=12544)
        return sum(losses.values()), losses

    def one(state, images):
        rng = jax.random.fold_in(jax.random.PRNGKey(7), state.step)
        (total, _), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, images, rng)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        return TrainState(step=state.step + 1,
                          params=optax.apply_updates(state.params, updates),
                          opt_state=opt_state), total

    scoped = int(os.environ.get("IUVL_SCOPED_VMEM_KIB", "49152"))
    step = jax.jit(
        one, donate_argnums=(0,),
        compiler_options={"xla_tpu_scoped_vmem_limit_kib": scoped},
    )
    state = TrainState.create(params, tx)
    del params
    t0 = time.time()
    state, total = step(state, images)
    float(total)
    compile_s = time.time() - t0
    per_step = float("inf")
    for _ in range(4):
        t0 = time.perf_counter()
        state, total = step(state, images)
        float(total)
        per_step = min(per_step, time.perf_counter() - t0)
    return {
        "step1_train_images_per_sec_per_chip": round(bt / per_step, 3),
        "step_ms": round(per_step * 1e3, 1),
        "scoped_vmem_kib": scoped,
        "compile_s": round(compile_s, 0),
    }


if __name__ == "__main__":
    print(json.dumps(run_step1_bench(
        int(sys.argv[1]) if len(sys.argv) > 1 else 2)), flush=True)
