"""Full-size train-step timing on the real chip (chained-scan protocol).

Steady-state step1 seg training step — forward + criterion (device auction
matcher, no host callback) + backward + optimizer update — on SAM ViT-B at
1024^2, bf16 activations / fp32 params, batch per chip as the reference
trains (2 img/GPU, configs/step1.yaml:114 + run:4-14).

K steps run inside one lax.scan carrying TrainState, so the measurement is
the true step-over-step time with no host round-trips; timing differences
a K-iteration program against a 1-iteration program (tunnel-RTT robust,
same protocol as bench.py).

Usage: env PYTHONPATH=/root/.axon_site:/root/repo python scripts/profile_train.py [batch] [remat] [scoped_vmem_kib]

The scoped_vmem_kib option (default 24576) raises XLA's scoped-vmem stack
limit: under remat the forward flash kernel's pipeline buffers are live
concurrently with the fused backward kernels and the default 16 MB stack
overflows by ~3 MB at B=2 @1024^2 (v5e has 128 MB VMEM; 24 MB scoped
leaves ample kernel budget).
"""
from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from iuvl_tpu.losses.criterion import CriterionConfig, SegCriterion, SegTargets
from iuvl_tpu.losses.matcher import set_matcher_impl
from iuvl_tpu.models.xdecoder.model import SysLearner, SysLearnerConfig
from iuvl_tpu.train.optimizer import build_optimizer
from iuvl_tpu.train.train_step import TrainState, make_train_step


def main():
    b = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    remat = (sys.argv[2] != "0") if len(sys.argv) > 2 else True
    vmem_kib = int(sys.argv[3]) if len(sys.argv) > 3 else 24576
    copts = {"xla_tpu_scoped_vmem_limit_kib": vmem_kib} if vmem_kib else None
    t_max = 20
    n_classes = 133
    match_points = 12544

    set_matcher_impl("auto")  # auto = jv on TPU
    cfg = SysLearnerConfig(
        sam_size="base", img_size=1024, dtype="bfloat16", attn_impl="auto",
        msdeform_impl="auto", remat=remat,
    )
    model = SysLearner(cfg=cfg)

    img0 = jnp.zeros((1, cfg.img_size, cfg.img_size, 3), jnp.float32)
    text0 = jnp.zeros((n_classes + 1, cfg.syslearner_dim), jnp.float32)
    t0 = time.time()
    params = jax.jit(
        lambda r: model.init(r, img0, text0, method=SysLearner.warmup)
    )(jax.random.PRNGKey(0))
    params = jax.block_until_ready(params)
    print(f"init: {time.time() - t0:.1f}s", file=sys.stderr)

    criterion = SegCriterion(CriterionConfig(num_classes=n_classes))
    tx = build_optimizer(params, base_lr=1e-4, total_steps=1000)

    rs = np.random.RandomState(0)
    images = jnp.asarray(rs.rand(b, cfg.img_size, cfg.img_size, 3) * 255,
                         jnp.float32)
    text_emb = jnp.asarray(rs.randn(n_classes + 1, cfg.syslearner_dim),
                           jnp.float32)
    masks = (rs.rand(b, t_max, cfg.img_size, cfg.img_size) > 0.7)
    targets = SegTargets(
        labels=jnp.asarray(rs.randint(0, n_classes, (b, t_max)), jnp.int32),
        masks=jnp.asarray(masks, jnp.float32),
        valid=jnp.asarray(rs.rand(b, t_max) > 0.3),
    )

    # unjitted step body; scan below is the single jit boundary
    def step_body(model, criterion, tx):
        import optax

        from iuvl_tpu.train.train_step import split_seg_outputs

        def loss_fn(params, images, text_embeddings, tgts, rng):
            outputs = model.apply(params, images, text_embeddings,
                                  method=type(model).forward_seg)
            obj, _ = split_seg_outputs(outputs, model.cfg.num_queries)
            losses = criterion(rng, obj, tgts, match_points=match_points)
            return sum(losses.values()), losses

        def one(state, images, text_emb, tgts, rng):
            (total, losses), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(state.params, images, text_emb, tgts, rng)
            updates, opt_state = tx.update(grads, state.opt_state, state.params)
            new_params = optax.apply_updates(state.params, updates)
            return TrainState(step=state.step + 1, params=new_params,
                              opt_state=opt_state), total
        return one

    one = step_body(model, criterion, tx)

    def chained(iters):
        def run(state, images, text_emb, targets):
            def body(carry, _):
                st, tot = carry
                rng = jax.random.fold_in(jax.random.PRNGKey(7), st.step)
                st, total = one(st, images + tot * 1e-12, text_emb, targets, rng)
                return (st, total.astype(jnp.float32)), None
            (st, tot), _ = jax.lax.scan(body, (state, jnp.float32(0.0)),
                                        None, length=iters)
            return tot
        return jax.jit(run, compiler_options=copts)

    state = TrainState.create(params, tx)
    run1, runk = chained(1), chained(4)
    t0 = time.time()
    l1 = float(run1(state, images, text_emb, targets))
    print(f"compile+first r1: {time.time() - t0:.1f}s loss={l1:.2f}",
          file=sys.stderr)
    t0 = time.time()
    lk = float(runk(state, images, text_emb, targets))
    print(f"compile+first rk: {time.time() - t0:.1f}s loss={lk:.2f}",
          file=sys.stderr)

    best = float("inf")
    for _ in range(4):
        t0 = time.perf_counter(); float(run1(state, images, text_emb, targets))
        b1 = time.perf_counter() - t0
        t0 = time.perf_counter(); float(runk(state, images, text_emb, targets))
        bk = time.perf_counter() - t0
        best = min(best, (bk - b1) / 3.0)
    print(f"train_step b={b} remat={remat}: {best*1e3:.1f} ms/step "
          f"({b/best:.2f} img/s/chip)")


if __name__ == "__main__":
    main()
