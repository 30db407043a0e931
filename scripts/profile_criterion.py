"""Criterion component breakdown (chained-scan differencing).

profile_train_parts.py puts the criterion FORWARD at ~1.1 s of the 3.3 s
train step (loss_fwd 1640 ms - model_fwd 540 ms at B=2, 1024^2) — twice
the model forward. This isolates its phases on realistic shapes
(10 layers, Q=100, T=20, 256^2 pred masks, 1024^2 gt masks):

  costs    collect_costs (per-layer match costs, stop-grad)
  solve    batched_hungarian (ONE vmapped auction while_loop)
  losses   losses_from_assignments (labels CE + point-sampled bce/dice)
  full     criterion.__call__

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/profile_criterion.py
"""
from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from iuvl_tpu.losses.criterion import CriterionConfig, SegCriterion, SegTargets
from iuvl_tpu.losses.matcher import batched_hungarian, set_matcher_impl


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
    set_matcher_impl("auction")
    b, q, t, k = 2, 100, 20, 134
    hp, wp = 256, 256  # pred mask resolution (S/4)
    hg, wg = 1024, 1024  # gt resolution
    n_layers = 10
    rs = np.random.RandomState(0)

    criterion = SegCriterion(CriterionConfig(num_classes=k - 1))
    targets = SegTargets(
        labels=jnp.asarray(rs.randint(0, k - 1, (b, t)), jnp.int32),
        masks=jnp.asarray(rs.rand(b, t, hg, wg) > 0.7, jnp.float32),
        valid=jnp.asarray(rs.rand(b, t) > 0.3),
    )
    layers = []
    for i in range(n_layers - 1):
        layers.append({
            "pred_logits": jnp.asarray(rs.randn(b, q, k), jnp.float32),
            "pred_masks": jnp.asarray(rs.randn(b, q, hp, wp), jnp.float32),
            "pred_boxes": None,
        })
    outputs = {
        "pred_logits": jnp.asarray(rs.randn(b, q, k), jnp.float32),
        "pred_masks": jnp.asarray(rs.randn(b, q, hp, wp), jnp.float32),
        "pred_boxes": None,
        "aux_outputs": layers,
    }
    rng = jax.random.PRNGKey(7)

    def perturb(tree, c):
        return jax.tree.map(
            lambda x: x + c.astype(x.dtype) * 1e-12
            if isinstance(x, jax.Array) and jnp.issubdtype(x.dtype, jnp.floating)
            else x,
            tree, is_leaf=lambda x: x is None)

    def costs_fn(c, outputs):
        costs, _ = criterion.collect_costs(rng, perturb(outputs, c), targets)
        return sum(x.sum() for x in costs).astype(jnp.float32)

    costs_c, kept = criterion.collect_costs(rng, outputs, targets)
    costs_c = [jax.lax.stop_gradient(x) for x in costs_c]
    costs_arr = jnp.stack(costs_c)

    def solve_fn(c, costs_arr):
        sols = batched_hungarian(list(costs_arr + c * 1e-12))
        return sum(x.sum() for x in sols).astype(jnp.float32)

    assignments = batched_hungarian(costs_c)

    def losses_fn(c, outputs):
        _, kept2 = criterion.collect_costs(rng, perturb(outputs, c), targets)
        out = criterion.losses_from_assignments(kept2, assignments, targets)
        return sum(out.values()).astype(jnp.float32)

    def full_fn(c, outputs):
        out = criterion(rng, perturb(outputs, c), targets)
        return sum(out.values()).astype(jnp.float32)

    for name, fn, args in [
        ("costs+losses(no solve)", losses_fn, (outputs,)),
        ("costs", costs_fn, (outputs,)),
        ("solve", solve_fn, (costs_arr,)),
        ("full", full_fn, (outputs,)),
    ]:
        t0 = time.time()
        tt = timed_diff(chain(fn, 1), chain(fn, 3), args, 2.0)
        print(f"{name}: {tt*1e3:.1f} ms (compile {time.time()-t0:.0f}s)",
              flush=True)


if __name__ == "__main__":
    main()
