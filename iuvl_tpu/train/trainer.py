"""Default trainer: epoch loop + periodic eval/checkpoint.

Parity target: /root/reference/trainer/default_trainer.py (:118-252) +
utils_trainer.py + xdecoder_trainer.py: epoch loop with loss meters and
periodic (quarter-epoch) checkpoint + eval, AdamW with param-group rules,
full-model grad clipping, WarmupMultiStepLR, checkpoint save/resume.

The distributed runtime is the SPMD mesh (iuvl_tpu.runtime.mesh) — there is
no DDP wrapper, MPI adapter or grad scaler to manage; one jitted train step
(train_step.py) covers forward/backward/update across all devices.
"""

from __future__ import annotations

import logging
import os
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from ..losses.criterion import CriterionConfig, SegCriterion, SegTargets
from ..pipeline import XDecoderPipeline
from ..runtime.checkpoint import CheckpointManager, next_run_dir
from ..runtime.mesh import MeshSpec, create_mesh, maybe_init_distributed
from ..runtime.metrics import LossMeter, Throughput, format_metrics
from .optimizer import build_optimizer
from .train_step import TrainState, make_train_step

logger = logging.getLogger("iuvl_tpu")


class Trainer:
    def __init__(self, cfg: dict):
        self.cfg = cfg
        maybe_init_distributed()
        import math

        model_par = cfg.get("MODEL_PARALLEL", 1)
        n_dev = jax.device_count() // model_par
        batch = cfg.get("BATCH_SIZE", n_dev)
        data_par = math.gcd(n_dev, batch)
        self.mesh = create_mesh(
            MeshSpec(data=data_par, model=model_par),
            devices=jax.devices()[: data_par * model_par],
        )
        self.pipeline = XDecoderPipeline(cfg)
        save_root = cfg.get("SAVE_DIR", "./runs")
        self.run_dir = next_run_dir(save_root)
        self.ckpt = CheckpointManager(os.path.join(self.run_dir, "ckpt"))

    # ------------------------------------------------------------------ #
    def _setup(self):
        cfg = self.cfg
        model, params = self.pipeline.initialize_model()
        solver = cfg.get("SOLVER", {})
        steps_per_epoch = cfg.get("STEPS_PER_EPOCH", 100)
        epochs = solver.get("MAX_NUM_EPOCHS", 10)
        total_steps = steps_per_epoch * epochs
        tx = build_optimizer(
            params,
            base_lr=solver.get("BASE_LR", 1e-4),
            weight_decay=solver.get("WEIGHT_DECAY", 0.05),
            total_steps=total_steps,
            clip_norm=solver.get("CLIP_GRADIENTS", {}).get("CLIP_VALUE", 5.0),
            lr_multipliers=solver.get("LR_MULTIPLIER"),
            warmup_iters=solver.get("WARMUP_ITERS", 10),
            milestones=tuple(solver.get("STEPS", (0.4, 0.8))),
            frozen_substrings=tuple(cfg.get("FIX_PARAM", ())),
        )
        train_name = (cfg.get("DATASETS", {}).get("TRAIN") or ["synthetic_seg"])[0]
        n_classes = len(
            __import__("iuvl_tpu.data.class_names", fromlist=["get_class_names"])
            .get_class_names(train_name)
        ) - 1 if "synthetic" not in train_name else cfg.get("NUM_CLASSES", 10)
        criterion = SegCriterion(
            CriterionConfig(
                num_classes=n_classes,
                eos_coef=cfg.get("NO_OBJECT_WEIGHT", 0.1),
                num_points=cfg.get("TRAIN_NUM_POINTS", 12544),
            )
        )
        match_points = cfg.get("MATCH_POINTS", cfg.get("TRAIN_NUM_POINTS", 12544))
        if cfg.get("LOADER", {}).get("JOINT"):
            from .train_step import make_joint_train_step

            step_fn = make_joint_train_step(
                model, criterion, tx, match_points=match_points
            )
        else:
            step_fn = make_train_step(model, criterion, tx, match_points=match_points)
        return model, params, tx, criterion, step_fn, epochs, steps_per_epoch

    def _shard(self, tree, spec):
        return jax.device_put(tree, NamedSharding(self.mesh, spec))

    # ------------------------------------------------------------------ #
    def train(self) -> dict[str, Any]:
        cfg = self.cfg
        model, params, tx, criterion, step_fn, epochs, steps_per_epoch = self._setup()
        state = self._shard(TrainState.create(params, tx), P())

        # Resume (reference utils_trainer.py:93-115).
        if cfg.get("RESUME") and self.ckpt.latest_step is not None:
            state = self.ckpt.restore(template=state)
            logger.info("resumed from step %s", int(state.step))

        batch_size = cfg.get("BATCH_SIZE", jax.device_count())
        train_name, loader = self.pipeline.get_dataloaders("train", batch_size)
        from ..data.datasets import JointLoader, batched_iterator, build_dataset, prefetch_iterator

        joint = bool(cfg.get("LOADER", {}).get("JOINT"))
        train_names = cfg.get("DATASETS", {}).get("TRAIN") or ["synthetic_seg"]
        vlp_names = [n for n in train_names if "vlp" in n]
        joint = joint and bool(vlp_names)
        if joint:
            vlp_ds = build_dataset(
                vlp_names[0], cfg.get(vlp_names[0].upper(), {}), "train"
            )
            vlp_loader = batched_iterator(
                vlp_ds, cfg.get("VLP_BATCH_SIZE", batch_size), epochs=None
            )
            loader = JointLoader({"seg": loader, "vlp": vlp_loader})
        loader = prefetch_iterator(loader, depth=cfg.get("PREFETCH", 2))
        text_emb = self._shard(
            self.pipeline.class_text_embeddings(state.params, train_name,
                                                is_eval=False)
            if "synthetic" not in train_name
            else jnp.ones((cfg.get("NUM_CLASSES", 10) + 1,
                           self.pipeline.model_config().syslearner_dim),
                          jnp.float32),
            P(),
        )

        meters = LossMeter()
        thru = Throughput()
        rng = jax.random.PRNGKey(cfg.get("SEED", 0))
        log_every = cfg.get("LOG_EVERY", 10)
        eval_every = max(steps_per_epoch // 4, 1)  # quarter-epoch cadence
        last_metrics: dict[str, Any] = {}

        step = int(jax.device_get(state.step))
        for batch in loader:
            if step >= epochs * steps_per_epoch:
                break
            seg_batch = batch["seg"] if joint else batch
            targets = SegTargets(
                labels=self._shard(jnp.asarray(seg_batch["labels"]), P("data")),
                masks=self._shard(jnp.asarray(seg_batch["masks"]), P("data")),
                valid=self._shard(jnp.asarray(seg_batch["valid"]), P("data")),
            )
            images = self._shard(jnp.asarray(seg_batch["image"]), P("data"))
            rng, sub = jax.random.split(rng)
            if joint:
                vb = batch["vlp"]
                vlp_batch = {
                    "images": self._shard(jnp.asarray(vb["image"]), P("data")),
                    "caption_ids": self._shard(
                        jnp.asarray(vb["caption_ids"]), P("data")
                    ),
                    "caption_mask": self._shard(
                        jnp.asarray(vb["caption_mask"]), P("data")
                    ),
                }
                state, metrics = step_fn(
                    state, images, text_emb, targets, vlp_batch, None, sub
                )
            else:
                state, metrics = step_fn(state, images, text_emb, targets, sub)
            step += 1
            meters.update({k: float(v) for k, v in jax.device_get(metrics).items()})
            thru.update(batch_size)
            if step % log_every == 0:
                logger.info(
                    "step %d  img/s %.2f  %s", step, thru.rate(),
                    format_metrics({"loss": meters.averages()["loss_total"]}),
                )
            if step % eval_every == 0:
                self.ckpt.save(step, jax.device_get(state))
                last_metrics = meters.averages()
                meters.reset()
        self.ckpt.save(step, jax.device_get(state), wait=True)
        return {"final_step": step, **(last_metrics or meters.averages())}

    # ------------------------------------------------------------------ #
    def eval(self, max_batches=None) -> dict[str, Any]:
        model, params = self.pipeline.initialize_model()
        if self.cfg.get("RESUME_FROM"):
            mgr = CheckpointManager(self.cfg["RESUME_FROM"])
            restored = mgr.restore()
            if restored is not None:
                params = restored.get("params", params)
        return self.pipeline.evaluate_model(params, max_batches=max_batches)
