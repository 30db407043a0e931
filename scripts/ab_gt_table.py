"""Same-session A/B of the shared-gt-wide-table criterion losses path.

A = gt_table_dtype="bfloat16" (ONE materialized wide table shared by all
10 layers' gt point samples), B = None (per-layer point_sample rebuild,
the round-2 default). Interleaved chained-scan differencing on the
costs+losses phase (no solve), realistic step1 shapes.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/ab_gt_table.py
"""
from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from iuvl_tpu.losses.criterion import CriterionConfig, SegCriterion, SegTargets
from iuvl_tpu.losses.matcher import batched_hungarian


def chain(fn, iters):
    def run(*args):
        def body(carry, _):
            return fn(carry, *args), None
        out, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=iters)
        return out
    return jax.jit(run)


def main():
    b, q, t, k = 2, 100, 20, 134
    hp, wp, hg, wg = 256, 256, 1024, 1024
    n_layers = 10
    rs = np.random.RandomState(0)
    targets = SegTargets(
        labels=jnp.asarray(rs.randint(0, k - 1, (b, t)), jnp.int32),
        masks=jnp.asarray(rs.rand(b, t, hg, wg) > 0.7, jnp.float32),
        valid=jnp.asarray(rs.rand(b, t) > 0.3),
    )
    layers = [
        {"pred_logits": jnp.asarray(rs.randn(b, q, k), jnp.float32),
         "pred_masks": jnp.asarray(rs.randn(b, q, hp, wp), jnp.float32),
         "pred_boxes": None}
        for _ in range(n_layers - 1)
    ]
    outputs = {
        "pred_logits": jnp.asarray(rs.randn(b, q, k), jnp.float32),
        "pred_masks": jnp.asarray(rs.randn(b, q, hp, wp), jnp.float32),
        "pred_boxes": None,
        "aux_outputs": layers,
    }
    rng = jax.random.PRNGKey(7)

    crit_tab = SegCriterion(CriterionConfig(num_classes=k - 1))
    crit_old = SegCriterion(
        CriterionConfig(num_classes=k - 1, gt_table_dtype=None)
    )
    costs_c, _ = crit_tab.collect_costs(rng, outputs, targets)
    assignments = batched_hungarian([jax.lax.stop_gradient(x) for x in costs_c])

    def perturb(tree, c):
        return jax.tree.map(
            lambda x: x + c.astype(x.dtype) * 1e-12
            if isinstance(x, jax.Array) and jnp.issubdtype(x.dtype, jnp.floating)
            else x,
            tree, is_leaf=lambda x: x is None)

    def make(crit):
        def losses_fn(c, outputs):
            _, kept2 = crit.collect_costs(rng, perturb(outputs, c), targets)
            out = crit.losses_from_assignments(kept2, assignments, targets)
            return sum(out.values()).astype(jnp.float32)
        return chain(losses_fn, 1), chain(losses_fn, 3)

    runs = {"table_bf16": make(crit_tab), "rebuild_f32": make(crit_old)}
    # compile + warm everything first
    for r1, rk in runs.values():
        float(r1(outputs)); float(rk(outputs))
    best = {name: float("inf") for name in runs}
    for _ in range(4):  # interleaved A/B
        for name, (r1, rk) in runs.items():
            t0 = time.perf_counter(); float(r1(outputs)); b1 = time.perf_counter() - t0
            t0 = time.perf_counter(); float(rk(outputs)); bk = time.perf_counter() - t0
            best[name] = min(best[name], (bk - b1) / 2.0)
    for name, v in best.items():
        print(f"{name}: {v*1e3:7.1f} ms", flush=True)


if __name__ == "__main__":
    main()
