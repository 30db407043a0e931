"""Device-trace the composed pixel-decoder grad and dump top HLO ops.

Usage: PYTHONPATH=/root/.axon_site:/root/repo python scripts/trace_pix_grad.py [case]
Writes the raw trace under /tmp/jaxtrace and prints the hlo_stats table
(top ops by self time) if tensorboard_plugin_profile can parse it.
"""
from __future__ import annotations

import glob
import sys

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from iuvl_tpu.models.xdecoder.model import SysLearner, SysLearnerConfig


def main():
    b = 2
    cfg = SysLearnerConfig(
        sam_size="base", img_size=1024, dtype="bfloat16", attn_impl="auto",
        msdeform_impl="auto", remat=True,
    )
    model = SysLearner(cfg=cfg)
    img0 = jnp.zeros((1, cfg.img_size, cfg.img_size, 3), jnp.float32)
    text0 = jnp.zeros((134, cfg.syslearner_dim), jnp.float32)
    params = jax.jit(
        lambda r: model.init(r, img0, text0, method=SysLearner.warmup)
    )(jax.random.PRNGKey(0))
    rs = np.random.RandomState(0)
    bf = jnp.bfloat16
    g4 = cfg.img_size // 4
    fpn = {
        "res2": jnp.asarray(rs.randn(b, g4, g4, 128), bf),
        "res3": jnp.asarray(rs.randn(b, g4 // 2, g4 // 2, 256), bf),
        "res4": jnp.asarray(rs.randn(b, g4 // 4, g4 // 4, 512), bf),
        "res5": jnp.asarray(rs.randn(b, g4 // 8, g4 // 8, 1024), bf),
    }

    def pix_sum(params, fpn):
        mf, ms = model.apply(params, fpn, method=lambda m, f: m.pixel_decoder(f))
        tot = jnp.float32(0.0)
        for v in jax.tree_util.tree_leaves((mf, ms)):
            tot = tot + v.astype(jnp.float32).mean()
        return tot

    gfn = jax.jit(lambda p, f: sum(
        v.astype(jnp.float32).mean()
        for v in jax.tree_util.tree_leaves(jax.grad(pix_sum)(p, f))))
    float(gfn(params, fpn))  # compile + warm

    jax.profiler.start_trace("/tmp/jaxtrace")
    float(gfn(params, fpn))
    jax.profiler.stop_trace()
    print("trace done", flush=True)

    xs = sorted(glob.glob("/tmp/jaxtrace/**/*.xplane.pb", recursive=True))
    print(xs, flush=True)
    if not xs:
        return
    try:
        from tensorboard_plugin_profile.convert import raw_to_tool_data
        data, _ = raw_to_tool_data.xspace_to_tool_data(
            [xs[-1]], "hlo_stats", {})
        out = "/tmp/hlo_stats.json"
        mode = "wb" if isinstance(data, bytes) else "w"
        with open(out, mode) as f:
            f.write(data)
        print("wrote", out, flush=True)
    except Exception as e:
        print("parse failed:", e, flush=True)


if __name__ == "__main__":
    main()
