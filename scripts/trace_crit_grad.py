"""Device-trace the composed criterion fwd+bwd (B=2) and dump the raw
trace under /tmp/jaxtrace (same protocol as trace_pix_grad.py)."""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from iuvl_tpu.losses.criterion import CriterionConfig, SegCriterion, SegTargets
from iuvl_tpu.losses.matcher import set_matcher_impl
from iuvl_tpu.models.xdecoder.model import SysLearner, SysLearnerConfig
from iuvl_tpu.train.train_step import split_seg_outputs


def main():
    b, t_max, n_classes = 2, 20, 133
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
    bf = jnp.bfloat16
    g4 = cfg.img_size // 4
    fpn = {
        "res2": jnp.asarray(rs.randn(b, g4, g4, 128), bf),
        "res3": jnp.asarray(rs.randn(b, g4 // 2, g4 // 2, 256), bf),
        "res4": jnp.asarray(rs.randn(b, g4 // 4, g4 // 4, 512), bf),
        "res5": jnp.asarray(rs.randn(b, g4 // 8, g4 // 8, 1024), bf),
    }
    text_emb = jnp.asarray(rs.randn(n_classes + 1, cfg.syslearner_dim),
                           jnp.float32)
    targets = SegTargets(
        labels=jnp.asarray(rs.randint(0, n_classes, (b, t_max)), jnp.int32),
        masks=jnp.asarray(rs.rand(b, t_max, cfg.img_size, cfg.img_size) > 0.7,
                          jnp.float32),
        valid=jnp.asarray(rs.rand(b, t_max) > 0.3),
    )
    outputs = jax.jit(lambda p, f: model.apply(
        p, f, text_emb, "seg",
        method=lambda m, ff, tt, task: m._head(ff, tt, task, training=True)))(
            params, fpn)

    def crit_sum(outputs):
        obj, _ = split_seg_outputs(outputs, model.cfg.num_queries)
        losses = criterion(jax.random.PRNGKey(7), obj, targets,
                           match_points=12544)
        return sum(losses.values()).astype(jnp.float32)

    gfn = jax.jit(lambda o: sum(
        v.astype(jnp.float32).mean() for v in jax.tree_util.tree_leaves(
            jax.grad(crit_sum)(o)) if v is not None))
    outputs = jax.tree_util.tree_map(lambda x: x, outputs)
    float(gfn(outputs))
    jax.profiler.start_trace("/tmp/jaxtrace")
    float(gfn(outputs))
    jax.profiler.stop_trace()
    print("trace done", flush=True)


if __name__ == "__main__":
    main()
