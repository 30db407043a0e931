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

import dataclasses
import logging
import os
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from ..losses.criterion import CriterionConfig, SegCriterion, SegTargets
from ..pipeline import XDecoderPipeline
from ..runtime.checkpoint import CheckpointManager, latest_run_dir, next_run_dir
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

        from ..losses.matcher import set_matcher_impl

        # host (scipy callback) | auction (on-device) | auto (device on TPU)
        set_matcher_impl(cfg.get("MATCHER_IMPL", "auto"))

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
        # RESUME continues the latest existing run (a fresh run dir would
        # make ckpt.latest_step always None and silently restart at step 0).
        self.run_dir = (
            latest_run_dir(save_root) if cfg.get("RESUME") else None
        ) or next_run_dir(save_root)
        self.ckpt = CheckpointManager(os.path.join(self.run_dir, "ckpt"))

    # ------------------------------------------------------------------ #
    def _load_pretrained(self, params):
        """WEIGHT + RESUME_FROM pretrained load with fuzzy key alignment
        (reference utils_trainer.load_model + utils/model.py
        align_and_update_state_dicts)."""
        cfg = self.cfg
        if not (cfg.get("WEIGHT") and cfg.get("RESUME_FROM")):
            return params
        from ..runtime.checkpoint import CheckpointManager, align_and_update_params

        restored = CheckpointManager(cfg["RESUME_FROM"]).restore()
        if restored is None:
            logger.warning("WEIGHT load: nothing restorable at %s",
                           cfg["RESUME_FROM"])
            return params
        loaded = restored.get("params", restored)
        params, log = align_and_update_params(params, loaded)
        for line in log[:20]:
            logger.info("weight align: %s", line)
        logger.info("weight align: %d log lines total", len(log))
        return params

    def _setup(self):
        cfg = self.cfg
        model, params = self.pipeline.initialize_model()
        params = self._load_pretrained(params)
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
        # The criterion's class count comes from the SEG stream: skip vlp/
        # instruction names exactly like train() does when picking the
        # seg dataset (a vlp-first TRAIN list would otherwise yield 0).
        train_names = cfg.get("DATASETS", {}).get("TRAIN") or ["synthetic_seg"]
        seg_names = [n for n in train_names if "vlp" not in n]
        train_name = (seg_names or train_names)[0]
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

        def make_step(use_joint: bool):
            if use_joint:
                from .train_step import make_joint_train_step

                return make_joint_train_step(
                    model, criterion, tx, match_points=match_points,
                    language_loss_layers=cfg.get("TOP_LANGUAGE_LAYERS", 10),
                )
            return make_train_step(model, criterion, tx, match_points=match_points)

        return model, params, tx, criterion, make_step, epochs, steps_per_epoch

    def _shard(self, tree, spec):
        return jax.device_put(tree, NamedSharding(self.mesh, spec))

    # ------------------------------------------------------------------ #
    _STEP1_KEYS = (
        "phrase_ids", "phrase_mask", "phrase_valid", "phrase_groups",
        "grounding_ids", "grounding_mask", "grounding_masks",
        "grounding_groups", "grounding_task_weight",
        "spatial_points", "spatial_labels", "spatial_masks", "spatial_valid",
    )

    def _seg_extras_from_batch(self, seg_batch) -> dict | None:
        """Step1 caption/grounding extras (token IDS; the step embeds them
        with live params — reference prepare_targets xdecoder_model.py:
        968-1020)."""
        if "phrase_ids" not in seg_batch:
            return None
        extras = {
            k: self._shard(jnp.asarray(seg_batch[k]), P("data"))
            for k in self._STEP1_KEYS if k in seg_batch
        }
        extras["grounding_target_valid"] = self._shard(
            jnp.asarray(seg_batch["grounding_valid"]), P("data")
        )
        return extras

    def train(self) -> dict[str, Any]:
        cfg = self.cfg
        if cfg.get("Load_LLM"):
            return self.train_llm()
        model, params, tx, criterion, make_step, epochs, steps_per_epoch = self._setup()
        state = self._shard(TrainState.create(params, tx), P())

        # Resume (reference utils_trainer.py:93-115).
        if cfg.get("RESUME") and self.ckpt.latest_step is not None:
            state = self.ckpt.restore(template=state)
            logger.info("resumed from step %s", int(state.step))

        batch_size = cfg.get("BATCH_SIZE", jax.device_count())
        from ..data.datasets import (
            JointLoader, batched_iterator, build_dataset, prefetch_iterator,
        )

        train_names = cfg.get("DATASETS", {}).get("TRAIN") or ["synthetic_seg"]
        vlp_names = [n for n in train_names if "vlp" in n]
        seg_names = [n for n in train_names if n not in vlp_names]
        train_name = (seg_names or train_names)[0]
        seg_ds = build_dataset(train_name, cfg.get(train_name.upper(), {}), "train")
        loader = batched_iterator(seg_ds, batch_size, epochs=None)
        step1_mode = getattr(seg_ds, "step1", None) is not None

        joint = bool(cfg.get("LOADER", {}).get("JOINT")) and bool(vlp_names)
        if joint:
            vlp_ds = build_dataset(
                vlp_names[0], cfg.get(vlp_names[0].upper(), {}), "train"
            )
            vlp_loader = batched_iterator(
                vlp_ds, cfg.get("VLP_BATCH_SIZE", batch_size), epochs=None
            )
            loader = JointLoader({"seg": loader, "vlp": vlp_loader})
        use_joint_step = joint or step1_mode
        if use_joint_step and not joint:
            loader = JointLoader({"seg": loader})
        loader = prefetch_iterator(loader, depth=cfg.get("PREFETCH", 2))
        step_fn = make_step(use_joint_step)

        # Class text: live token ids (text tower trains through the class
        # loss, per-step template sampling — reference forward_seg:336) when
        # the step1 objective is on; static embedding cache otherwise.
        rs = np.random.RandomState(cfg.get("SEED", 0))
        bank = None
        if step1_mode:
            from ..data.step1 import ClassPromptBank
            from ..data.class_names import get_class_names

            names = get_class_names(
                train_name, num_classes=cfg.get("NUM_CLASSES", 10)
            )
            bank = ClassPromptBank(
                names, self.pipeline.tokenizer,
                text_len=cfg.get("TEXT_LEN", 24),
            )
            text_emb = None
        else:
            text_emb = self._shard(
                self.pipeline.class_text_embeddings(state.params, train_name,
                                                    is_eval=False)
                if "synthetic" not in train_name
                else jnp.ones((cfg.get("NUM_CLASSES", 10) + 1,
                               self.pipeline.model_config().syslearner_dim),
                              jnp.float32),
                P(),
            )

        from ..runtime.observability import MetricsLogger, nan_guard, profile_trace

        if cfg.get("DEBUG_NANS"):
            # SURVEY §5 race/NaN guard: fail fast inside the jitted step.
            self._nan_ctx = nan_guard(True)
            self._nan_ctx.__enter__()
        mlog = MetricsLogger(self.run_dir, resume=bool(cfg.get("RESUME")))
        meters = LossMeter()
        pending_metrics: list = []  # device arrays, synced at log boundaries
        thru = Throughput()
        rng = jax.random.PRNGKey(cfg.get("SEED", 0))
        log_every = cfg.get("LOG_EVERY", 10)
        eval_every = max(steps_per_epoch // 4, 1)  # quarter-epoch cadence
        eval_during_train = cfg.get("EVAL_DURING_TRAIN", False)
        last_metrics: dict[str, Any] = {}

        profile_dir = cfg.get("PROFILE_TRACE_DIR")
        profile_steps = cfg.get("PROFILE_STEPS", 3)
        prof_ctx = None

        step = int(jax.device_get(state.step))
        for batch in loader:
            if step >= epochs * steps_per_epoch:
                break
            if profile_dir and prof_ctx is None and step == 1:
                # Trace steps [1, 1+PROFILE_STEPS) — skips the compile step.
                prof_ctx = profile_trace(profile_dir)
                prof_ctx.__enter__()
            if prof_ctx is not None and step >= 1 + profile_steps:
                prof_ctx.__exit__(None, None, None)
                prof_ctx = None
                profile_dir = None
            seg_batch = batch["seg"] if use_joint_step else batch
            targets = SegTargets(
                labels=self._shard(jnp.asarray(seg_batch["labels"]), P("data")),
                masks=self._shard(jnp.asarray(seg_batch["masks"]), P("data")),
                valid=self._shard(jnp.asarray(seg_batch["valid"]), P("data")),
            )
            images = self._shard(jnp.asarray(seg_batch["image"]), P("data"))
            if bank is not None:
                t = bank.sample(rs)
                text_in = {
                    "ids": self._shard(jnp.asarray(t["ids"]), P()),
                    "mask": self._shard(jnp.asarray(t["mask"]), P()),
                }
            else:
                text_in = text_emb
            rng, sub = jax.random.split(rng)
            if use_joint_step:
                vlp_batch = None
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
                seg_extras = self._seg_extras_from_batch(seg_batch)
                state, metrics = step_fn(
                    state, images, text_in, targets, vlp_batch, seg_extras, sub
                )
            else:
                state, metrics = step_fn(state, images, text_in, targets, sub)
            step += 1
            # Hold the device metrics and sync only at the log boundary:
            # a per-step device_get blocks the host on every step's result
            # and defeats the prefetch pipeline (dispatch is async).
            pending_metrics.append(metrics)
            thru.update(batch_size)
            if step % log_every == 0 or step % eval_every == 0:
                for m in jax.device_get(pending_metrics):
                    meters.update({k: float(v) for k, v in m.items()})
                pending_metrics.clear()
            if step % log_every == 0:
                logger.info(
                    "step %d  img/s %.2f  %s", step, thru.rate(),
                    format_metrics({"loss": meters.averages()["loss_total"]}),
                )
                mlog.log(step, {"imgs_per_sec": thru.rate(), **meters.averages()})
            if step % eval_every == 0:
                self.ckpt.save(step, jax.device_get(state))
                last_metrics = meters.averages()
                meters.reset()
                if eval_during_train:
                    # Quarter-epoch eval cadence (reference
                    # default_trainer.py:241-245).
                    self.pipeline._text_cache.clear()
                    results = self.pipeline.evaluate_model(
                        state.params,
                        max_batches=cfg.get("EVAL_MAX_BATCHES"),
                    )
                    mlog.log(step, results)
                    logger.info("eval @%d: %s", step, format_metrics(results))
        if prof_ctx is not None:
            prof_ctx.__exit__(None, None, None)
        for m in jax.device_get(pending_metrics):
            meters.update({k: float(v) for k, v in m.items()})
        pending_metrics.clear()
        self.ckpt.save(step, jax.device_get(state), wait=True)
        mlog.log(step, last_metrics or meters.averages())
        return {"final_step": step, **(last_metrics or meters.averages())}

    # ------------------------------------------------------------------ #
    def train_llm(self) -> dict[str, Any]:
        """Stage-2 instruction tuning (reference forward_llm
        xdecoder_model.py:438-464 + step2_instruction.yaml): conversation
        stream -> embeddings with image slots -> unified head 'llm' features
        through the frozen LLaMA; only non-FIX_PARAM params (the projector)
        train. Tensor-parallel LLM via MODEL_PARALLEL > 1."""
        cfg = self.cfg
        from jax.sharding import NamedSharding

        from ..data.datasets import build_dataset
        from ..models.llm.llama import (
            LlamaConfig, LlamaForCausalLM, llama_param_shardings,
        )
        from ..runtime.observability import MetricsLogger
        from .llm_step import make_llm_train_step, prepare_llm_batch

        model, params = self.pipeline.initialize_model()
        params = self._load_pretrained(params)  # step1 weights into step2
        solver = cfg.get("SOLVER", {})
        steps_per_epoch = cfg.get("STEPS_PER_EPOCH", 100)
        epochs = solver.get("MAX_NUM_EPOCHS", 1)
        tx = build_optimizer(
            params,
            base_lr=solver.get("BASE_LR", 2e-4),
            weight_decay=solver.get("WEIGHT_DECAY", 0.0),
            total_steps=steps_per_epoch * epochs,
            clip_norm=solver.get("CLIP_GRADIENTS", {}).get("CLIP_VALUE", 1.0),
            warmup_iters=solver.get("WARMUP_ITERS", 10),
            frozen_substrings=tuple(cfg.get("FIX_PARAM", ())),
        )
        state = self._shard(TrainState.create(params, tx), P())

        # LLM: Vicuna-7B geometry by default, overridable for tiny tests
        # (LLM dict); weights via the HF converter when LLM_WEIGHTS is set.
        lcfg_d = cfg.get("LLM", {})
        lcfg = LlamaConfig(
            vocab_size=lcfg_d.get("VOCAB_SIZE", 32000),
            dim=lcfg_d.get("DIM", 4096),
            layers=lcfg_d.get("LAYERS", 32),
            heads=lcfg_d.get("HEADS", 32),
            kv_heads=lcfg_d.get("KV_HEADS", 32),
            ffn_dim=lcfg_d.get("FFN_DIM", 11008),
            max_seq_len=cfg.get("LLM_MAX_LEN", 1024),
            dtype=cfg.get("DTYPE", "bfloat16"),
            quant=cfg.get("LLM_QUANT", "none"),
        )
        llm = LlamaForCausalLM(cfg=lcfg)
        fp_cfg = dataclasses.replace(lcfg, quant="none")
        if cfg.get("LLM_WEIGHTS"):
            from ..models.llm.convert import load_hf_llama_params

            llm_params = load_hf_llama_params(cfg["LLM_WEIGHTS"], fp_cfg)
        else:
            llm_params = LlamaForCausalLM(cfg=fp_cfg).init(
                jax.random.PRNGKey(1),
                jnp.zeros((1, 4, lcfg.dim), jnp.float32),
                jnp.ones((1, 4), jnp.int32),
            )
        if lcfg.quant == "int8":
            # Weight-only int8 for the frozen LLM (reference 8-bit load).
            from ..models.llm.quant import quantize_llama_params

            llm_params = quantize_llama_params(jax.device_get(llm_params))
        specs = llama_param_shardings(llm_params)
        llm_params = jax.tree.map(
            lambda x, s: jax.device_put(x, NamedSharding(self.mesh, s)),
            llm_params, specs,
        )

        train_name = (cfg.get("DATASETS", {}).get("TRAIN")
                      or ["synthetic_instruction"])[0]
        ds = build_dataset(train_name, cfg.get(train_name.upper(), {}), "train")
        batch_size = cfg.get("BATCH_SIZE", 2)
        max_len = cfg.get("LLM_MAX_LEN", 1024)
        num_img_tokens = model.cfg.num_queries - 1

        ctx_fn = jax.jit(
            lambda p, ids, m: model.apply(
                p, ids, m, method=type(model).encode_text_tokens
            )
        )
        step_fn = make_llm_train_step(model, llm, tx)
        mlog = MetricsLogger(self.run_dir)
        meters = LossMeter()
        log_every = cfg.get("LOG_EVERY", 10)
        eval_every = max(steps_per_epoch // 4, 1)
        total_steps = epochs * steps_per_epoch
        step = int(jax.device_get(state.step))
        order = np.arange(len(ds))
        if batch_size > len(ds):
            raise ValueError(
                f"BATCH_SIZE {batch_size} > instruction dataset length "
                f"{len(ds)}: the epoch loop would yield no batches"
            )
        rs = np.random.RandomState(cfg.get("SEED", 0))
        while step < total_steps:
            rs.shuffle(order)
            for start in range(0, len(order) - batch_size + 1, batch_size):
                if step >= total_steps:
                    break
                items = [ds[int(i)] for i in order[start : start + batch_size]]
                ids_list = [it["input_ids"] for it in items]
                labels_list = [it["labels"] for it in items]
                base_embeds, img_start, attn, labs = prepare_llm_batch(
                    None, llm, llm_params, ids_list, labels_list,
                    num_image_tokens=num_img_tokens, max_len=max_len,
                )
                images = self._shard(
                    jnp.asarray(np.stack([it["image"] for it in items])),
                    P("data"),
                )
                if "clip_ids" in items[0]:
                    tok_emb, _ = ctx_fn(
                        state.params,
                        jnp.asarray(np.stack([it["clip_ids"] for it in items])),
                        jnp.asarray(np.stack([it["clip_mask"] for it in items])),
                    )
                else:
                    tok_emb = jnp.zeros(
                        (batch_size, model.cfg.contxt_len,
                         model.cfg.syslearner_dim), jnp.float32,
                    )
                state, metrics = step_fn(
                    state, llm_params, images, tok_emb, base_embeds,
                    img_start, attn, labs,
                )
                step += 1
                meters.update(
                    {k: float(v) for k, v in jax.device_get(metrics).items()}
                )
                if step % log_every == 0:
                    logger.info("step %d  %s", step,
                                format_metrics(meters.averages()))
                    mlog.log(step, meters.averages())
                if step % eval_every == 0:
                    self.ckpt.save(step, jax.device_get(state))
        final = meters.averages()
        self.ckpt.save(step, jax.device_get(state), wait=True)
        mlog.log(step, final)
        return {"final_step": step, **final}

    # ------------------------------------------------------------------ #
    def eval(self, max_batches=None) -> dict[str, Any]:
        model, params = self.pipeline.initialize_model()
        if self.cfg.get("RESUME_FROM"):
            from ..runtime.checkpoint import align_and_update_params

            mgr = CheckpointManager(self.cfg["RESUME_FROM"])
            restored = mgr.restore()
            if restored is not None:
                params, _ = align_and_update_params(
                    params, restored.get("params", restored)
                )
        return self.pipeline.evaluate_model(params, max_batches=max_batches)
