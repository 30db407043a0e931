"""XDecoderPipeline: binds model + data + evaluators.

Parity target: /root/reference/pipeline/XDecoderPipeline.py (:38-153) —
``initialize_model``, ``get_dataloaders``, ``forward_step`` and
``evaluate_model`` with per-dataset class-name text-embedding refresh
(:119-125) and eval-mode switching by dataset name (pipeline/misc.py:31-55).
"""

from __future__ import annotations

import logging
import os
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from .data.class_names import COCO_THING_IDS, get_class_names
from .data import batched_iterator, build_dataset  # populates the registry
from .data.prompts import get_prompt_templates, clean_class_name
from .data.tokenizer import build_tokenizer
from .evaluation import SemSegEvaluator
from .inference.postprocess import panoptic_merge, semantic_inference
from .models.xdecoder.model import SysLearner, SysLearnerConfig

logger = logging.getLogger("iuvl_tpu")


def hook_switcher(dataset_name: str) -> dict[str, bool]:
    """Per-dataset eval-head switches (reference pipeline/misc.py:31-55 +
    the evaluator-type dispatch of datasets/build.py:491-597)."""
    n = dataset_name.lower()
    if "refcoco" in n:
        return {"semantic_on": False, "instance_on": False, "panoptic_on": False,
                "mode": "grounding"}
    if "pascalvoc" in n or "point" in n or "interactive" in n:
        return {"semantic_on": False, "instance_on": False, "panoptic_on": False,
                "mode": "interactive"}
    if "vqa" in n:
        return {"semantic_on": False, "instance_on": False, "panoptic_on": False,
                "mode": "vqa"}
    if "caption" in n:
        return {"semantic_on": False, "instance_on": False, "panoptic_on": False,
                "mode": "captioning"}
    if "retrieval" in n:
        return {"semantic_on": False, "instance_on": False, "panoptic_on": False,
                "mode": "retrieval"}
    if "vlp" in n or "instp" in n or "instruction" in n:
        # Reference evaluator_mapper: vlp_val/instp_val/instruction_val ->
        # 'retrieval' (register_vlp_datasets.py:39; the *_captioning_*
        # variants were already caught by the 'caption' check above).
        return {"semantic_on": False, "instance_on": False, "panoptic_on": False,
                "mode": "retrieval"}
    if "imagenet" in n or "classification" in n:
        return {"semantic_on": False, "instance_on": False, "panoptic_on": False,
                "mode": "classification"}
    if ("ade" in n and "panoptic" not in n) or "stuff_10k" in n:
        return {"semantic_on": True, "instance_on": False, "panoptic_on": False,
                "mode": "seg"}
    return {"semantic_on": True, "instance_on": True, "panoptic_on": True,
            "mode": "seg"}


def _resize_chw_np(x: np.ndarray, h: int, w: int) -> np.ndarray:
    """Host-side bilinear resize of (C, h', w') logits to (C, h, w) — keeps
    eval free of per-image-shape device recompiles."""
    from .data.augment import _resize

    return _resize(np.moveaxis(x, 0, -1), h, w).transpose(2, 0, 1)


class XDecoderPipeline:
    def __init__(self, cfg: dict):
        self.cfg = cfg
        self.tokenizer = build_tokenizer(cfg.get("TOKENIZER_MERGES"))
        self.model: SysLearner | None = None
        self._text_cache: dict[str, np.ndarray] = {}

    # ------------------------------------------------------------------ #
    def model_config(self) -> SysLearnerConfig:
        c = self.cfg
        return SysLearnerConfig(
            sam_size=c.get("SAM_SIZE", "base"),
            img_size=c.get("IMAGE_SIZE", 1024),
            syslearner_dim=c.get("SYSLEARNER_DIM", 512),
            mask_proposals=c.get("MASK_PROPOSAL", 100),
            contxt_len=c.get("CONTEXT_LEN", 77),
            vocab_size=c.get("TEXT_VOCAB_SIZE", 49408),
            text_width=c.get("TEXT_WIDTH", c.get("SYSLEARNER_DIM", 512)),
            text_layers=c.get("TEXT_LAYERS", 12),
            text_heads=c.get("TEXT_HEADS", 8),
            pixel_decoder_layers=c.get("PIXEL_DECODER_LAYERS", 6),
            nheads=c.get("NHEADS", 8),
            dim_feedforward=c.get("DIM_FEEDFORWARD", 2048),
            dtype=c.get("DTYPE", "bfloat16"),
            attn_impl=c.get("ATTN_IMPL", "auto"),
            msdeform_impl=c.get("MSDEFORM_IMPL", "auto"),
            pixel_decoder=c.get("PIXEL_DECODER", "msdeform"),
            detection=bool(c.get("DETECTION", False)),
            llm_dim=(c.get("LLM_DIM", 4096) if c.get("Load_LLM") else 0),
            retrieval_ensemble=bool(c.get("RETRIEVAL_ENSEMBLE", False)),
        )

    def initialize_model(self, rng=None):
        cfg = self.model_config()
        self.model = SysLearner(cfg=cfg)
        rng = rng if rng is not None else jax.random.PRNGKey(0)
        images = jnp.zeros((1, cfg.img_size, cfg.img_size, 3), jnp.float32)
        text = jnp.zeros((2, cfg.syslearner_dim), jnp.float32)
        params = jax.jit(
            lambda r: self.model.init(r, images, text, method=SysLearner.warmup)
        )(rng)
        return self.model, params

    # ------------------------------------------------------------------ #
    def get_dataloaders(self, split: str, batch_size: int, is_evaluation=False):
        names = (
            self.cfg.get("DATASETS", {}).get("TEST" if is_evaluation else "TRAIN")
            or ["synthetic_seg"]
        )
        name = names[0]
        ds = build_dataset(name, self.cfg.get(name.upper(), {}), split)
        return name, batched_iterator(
            ds, batch_size, shuffle=not is_evaluation,
            epochs=1 if is_evaluation else None,
        )

    # ------------------------------------------------------------------ #
    def class_text_embeddings(
        self, params, dataset_name: str, is_eval: bool = True, rng=None
    ) -> jax.Array:
        """Class-name embedding cache with prompt ensembling
        (reference vlpencoder.py:74-131). Eval: mean over the full template
        ensemble per class, re-normalized."""
        key = f"{dataset_name}:{is_eval}"
        if key in self._text_cache:
            return self._text_cache[key]
        names = get_class_names(
            dataset_name, num_classes=self.cfg.get("NUM_CLASSES", 10)
        )
        templates = get_prompt_templates()
        embed_fn = jax.jit(
            lambda p, ids, m: self.model.apply(
                p, ids, m, method=SysLearner.encode_text_embeddings
            )
        )
        all_embs = []
        for cls in names:
            cname = clean_class_name(cls)
            texts = (
                [t.format(cname) for t in templates] if is_eval
                else [f"a photo of a {cname}."]
            )
            toks = self.tokenizer(texts, max_length=self.model_config().contxt_len)
            emb = embed_fn(
                params, jnp.asarray(toks["input_ids"]),
                jnp.asarray(toks["attention_mask"]),
            )
            mean = np.asarray(emb).mean(0)
            mean /= np.linalg.norm(mean) + 1e-7
            all_embs.append(mean)
        out = jnp.asarray(np.stack(all_embs))
        self._text_cache[key] = out
        return out

    # ------------------------------------------------------------------ #
    def evaluate_model(self, params, batch_size: int = 1, max_batches=None):
        """Eval over the FULL DATASETS.TEST list (reference build.py:491-597
        builds one evaluator per test set); each dataset dispatches by its
        hook_switcher mode."""
        names = self.cfg.get("DATASETS", {}).get("TEST") or ["synthetic_seg"]
        out: dict[str, Any] = {}
        for name in names:
            out.update(
                self._evaluate_dataset(params, name, batch_size, max_batches)
            )
        return out

    def _evaluate_dataset(self, params, name, batch_size=1, max_batches=None):
        """One dataset: semantic always (seg mode), plus panoptic PQ and
        instance AP when the switches enable them (reference
        XDecoderPipeline.evaluate_model:104-153 + the per-mode inference
        heads of xdecoder_model.evaluate)."""
        from .evaluation import InstanceAPEvaluator, PanopticEvaluator
        from .inference.postprocess import instance_inference

        switches = hook_switcher(name)
        mode = switches["mode"]
        if mode == "grounding":
            return self._evaluate_grounding(params, name, max_batches)
        if mode == "interactive":
            return self._evaluate_interactive(params, name, max_batches)
        if mode == "captioning":
            return self._evaluate_captioning(params, name, max_batches)
        if mode == "retrieval":
            return self._evaluate_retrieval(params, name, max_batches)
        if mode == "classification":
            return self._evaluate_classification(params, name, max_batches)
        if mode == "vqa":
            return self._evaluate_vqa(params, name, max_batches)
        ds = build_dataset(name, self.cfg.get(name.upper(), {}), "val")
        loader = batched_iterator(ds, batch_size, shuffle=False, epochs=1)
        text_emb = self.class_text_embeddings(params, name, is_eval=True)
        num_classes = text_emb.shape[0] - 1
        # Thing/stuff split drives PQ instance matching: COCO's is built in;
        # other panoptic datasets must supply theirs via <NAME>.THING_IDS
        # (detectron2 metadata isthing in the reference) — treating every
        # class as a thing would instance-match stuff regions and skew
        # PQ_st/PQ_th.
        cfg_things = self.cfg.get(name.upper(), {}).get("THING_IDS")
        if cfg_things is not None:
            thing_ids = set(int(i) for i in cfg_things)
        elif "scannet" in name and "panoptic" in name:
            from .data.class_names_ext import SCANNET_PANO_THING_IDS

            thing_ids = SCANNET_PANO_THING_IDS
        elif "bdd10k_40" in name:
            from .data.class_names_ext import BDD_PANO_THING_IDS

            thing_ids = BDD_PANO_THING_IDS
        elif "coco" in name:
            thing_ids = COCO_THING_IDS
        else:
            thing_ids = set(range(num_classes))
            if "panoptic" in name:
                logger.warning(
                    "%s: no THING_IDS configured — PQ treats all %d classes "
                    "as things; set %s.THING_IDS for a correct PQ_st/PQ_th "
                    "split", name, num_classes, name.upper(),
                )
        # ADE20K-full labels store trainIds 0..846 (>255), so its ignore
        # sentinel is 65535 (reference prepared-tif convention); everything
        # else uses the detectron2 default 255. Overridable per dataset.
        ignore_label = self.cfg.get(name.upper(), {}).get(
            "IGNORE_LABEL", 65535 if "ade20k_full" in name else 255
        )
        evaluator = SemSegEvaluator(
            num_classes=num_classes, ignore_label=ignore_label
        )
        pan_eval = PanopticEvaluator(thing_ids=thing_ids)
        inst_eval = InstanceAPEvaluator(num_classes=num_classes)
        thing_mask = jnp.asarray(
            [i in thing_ids for i in range(num_classes)]
        )

        eval_fn = jax.jit(
            lambda p, img, t: self.model.apply(
                p, img, t, method=SysLearner.evaluate_seg
            )
        )
        inst_fn = jax.jit(
            lambda cls, pred: instance_inference(
                cls, pred, topk=100, thing_mask=thing_mask
            )
        )
        input_size = self.model_config().img_size
        processed = 0
        for i, batch in enumerate(loader):
            if max_batches is not None and i >= max_batches:
                break
            mask_cls, mask_pred = eval_fn(
                params, jnp.asarray(batch["image"]), text_emb
            )
            sem = np.asarray(jax.vmap(semantic_inference)(mask_cls, mask_pred))
            for b in range(sem.shape[0]):
                if "sem_seg" in batch:
                    # Semantic-annotation datasets (ADE & co.): crop the
                    # padding, resize logits to the ORIGINAL size, compare
                    # against the original-resolution gt (reference
                    # postprocessing.py:99-122 + evaluate:515-536).
                    gt_sem = np.asarray(batch["sem_seg"][b])
                    h0, w0 = gt_sem.shape
                    from .data.transforms import get_preprocess_shape

                    rh, rw = get_preprocess_shape(h0, w0, input_size)
                    logits = _resize_chw_np(sem[b][:, :rh, :rw], h0, w0)
                    evaluator.process(logits.argmax(0), gt_sem)
                    processed += 1
                    continue
                gt_sem, gt_masks, gt_labels = self._gt_from_batch(
                    batch, b, sem.shape[2:]
                )
                if gt_sem is None:
                    continue
                processed += 1
                evaluator.process(sem[b].argmax(0), gt_sem)
                if switches.get("panoptic_on"):
                    pan_seg, segs = panoptic_merge(
                        np.asarray(mask_cls[b]), np.asarray(mask_pred[b]),
                        thing_ids=thing_ids,
                        # reference object_mask_threshold (step1.yaml TEST)
                        object_mask_threshold=self.cfg.get(
                            "OBJECT_MASK_THRESHOLD", 0.8
                        ),
                    )
                    gt_pan, gt_segs = self._gt_panoptic(gt_masks, gt_labels)
                    pan_eval.process(pan_seg, segs, gt_pan, gt_segs)
                if switches.get("instance_on") and gt_masks is not None:
                    inst = jax.device_get(inst_fn(mask_cls[b], mask_pred[b]))
                    keep = inst["valid"] & (inst["scores"] > 0)
                    inst_eval.process(
                        inst["pred_masks"][keep], inst["scores"][keep],
                        inst["pred_classes"][keep], gt_masks, gt_labels,
                    )
        out = {f"{name}/{k}": v for k, v in evaluator.evaluate().items()}
        out[f"{name}/processed"] = processed
        if switches.get("panoptic_on"):
            out.update({f"{name}/{k}": v for k, v in pan_eval.evaluate().items()})
        if switches.get("instance_on"):
            out.update({f"{name}/{k}": v for k, v in inst_eval.evaluate().items()})
        return out

    # ------------------------------------------------------------------ #
    def _evaluate_grounding(self, params, name, max_batches=None):
        """Referring-segmentation eval (reference evaluate_grounding +
        grounding_evaluation.py): per phrase, run the grounding head and
        score the selected mask against gt."""
        from .data.datasets import build_dataset
        from .evaluation import GroundingEvaluator

        ds = build_dataset(name, self.cfg.get(name.upper(), {}), "val")
        evaluator = GroundingEvaluator()
        tok_fn = jax.jit(
            lambda p, ids, m: self.model.apply(
                p, ids, m, method=SysLearner.encode_text_tokens
            )
        )
        ground_fn = jax.jit(
            lambda p, img, gt, gv, ce: self.model.apply(
                p, img, gt, gv, ce, method=SysLearner.evaluate_grounding
            )
        )
        n = len(ds) if max_batches is None else min(len(ds), max_batches)
        for i in range(n):
            item = ds[i]
            ids = jnp.asarray(item["text_ids"])
            msk = jnp.asarray(item["text_mask"])
            token_emb, class_emb = tok_fn(params, ids, msk)
            # Every real sentence of the ref is a grounding sample
            # (reference grounding_evaluation scores each sentence).
            n_sents = max(1, len(item.get("texts", ())))
            for si in range(min(n_sents, token_emb.shape[0])):
                self._process_grounding_sample(
                    evaluator, ground_fn, params, item,
                    token_emb[si][None], msk[si].astype(bool)[None],
                    class_emb[None, si : si + 1],
                )
        return {f"{name}/{k}": v for k, v in evaluator.evaluate().items()}

    def _process_grounding_sample(self, evaluator, ground_fn, params, item,
                                  gtok, valid, cls_emb):
        import jax.numpy as jnp

        masks = ground_fn(
            params,
            jnp.asarray(item["image"])[None],
            gtok,
            valid,
            cls_emb,
        )
        logits = np.asarray(masks[0, 0], np.float32)
        gt = np.asarray(item["gt_mask"])
        if gt.shape != logits.shape:
            # The image went through resize-longest-side + pad while gt
            # stayed at original (h0, w0): crop the padded prediction to
            # the resized extent and bilinear-resize the logits back to
            # the gt frame (same semantics as sem_seg_postprocess / the
            # semantic-eval path) — a raw pad/crop against unscaled gt
            # never aligns.
            h0, w0 = gt.shape
            scale = logits.shape[0] / max(h0, w0)
            rh, rw = round(h0 * scale), round(w0 * scale)
            logits = _resize_chw_np(logits[None, :rh, :rw], h0, w0)[0]
        evaluator.process(logits > 0, gt)

    def _evaluate_interactive(self, params, name, max_batches=None):
        """Click-refinement NoC eval (reference evaluate_interactive +
        interactive_evaluation.py)."""
        from .data.datasets import build_dataset
        from .evaluation import InteractiveEvaluator
        from .inference.interactive import make_interactive_loop

        ds = build_dataset(name, self.cfg.get(name.upper(), {}), "val")
        max_clicks = self.cfg.get("MAX_CLICKS", 20)
        unified = not self.cfg.get("INTERACTIVE_SAM_ONLY", False)
        evaluator = InteractiveEvaluator(max_clicks=max_clicks)
        encode_fn = jax.jit(
            lambda p, img: self.model.apply(
                p, img, method=SysLearner.encode_interactive
            )
        )
        # One jitted loop reused across images (recompiles only per distinct
        # instance count N; gt is always at the static input resolution).
        loop = make_interactive_loop(
            self.model, max_clicks=max_clicks, unified=unified
        )
        prompt_mode = getattr(ds, "prompt_mode", "Point")
        n = len(ds) if max_batches is None else min(len(ds), max_batches)
        for i in range(n):
            item = ds[i]
            if len(item["gt_masks"]) == 0:
                continue
            sam_emb, mask_features, multi_scale = encode_fn(
                params, jnp.asarray(item["image"])[None]
            )
            gt = jnp.asarray(item["gt_masks"])
            if prompt_mode != "Point":
                # Box/circle/scribble/polygon prompts are single-shot in the
                # reference (evaluate_interactive :769-850) — no click loop.
                from .data.visual_sampler import box_points
                from .inference.interactive import single_shot_eval

                gtn = np.asarray(item["gt_masks"])
                boxes = (
                    np.stack([box_points(m) for m in gtn])
                    if prompt_mode == "Box" else None
                )
                ious, _ = single_shot_eval(
                    self.model, params, sam_emb, gtn,
                    "box" if prompt_mode == "Box" else "stroke",
                    prompt_masks=np.asarray(
                        item["spatial_query"]["rand_shape"]),
                    boxes=boxes, seed=i,
                )
                # Single-shot modes have no click trajectory; broadcast the
                # one IoU to the (max_clicks,) shape the evaluator expects
                # (NoC reads "reached at click 1", mIoU@k is constant).
                for k in range(len(gtn)):
                    evaluator.process(
                        np.full(max_clicks, np.asarray(ious)[k], np.float64)
                    )
                continue
            # First click per instance, in model input space (matching the
            # gt masks — see eval_datasets). SimpleClickSampler provides the
            # protocol-exact dt-argmax pixel (reference
            # simpleclick_sampler.py:65-66); the legacy ShapeSampler path
            # falls back to a prompt-mask pixel.
            sq = item["spatial_query"]
            if "click_points" in sq:
                firsts = np.asarray(sq["click_points"], np.float32)
            else:
                firsts = []
                for m in np.asarray(sq["rand_shape"]):
                    ys, xs = np.nonzero(m)
                    firsts.append([xs[0], ys[0]] if len(ys) else [0, 0])
            ious, _ = loop(
                params, sam_emb, mask_features, multi_scale, gt,
                jnp.asarray(np.asarray(firsts, np.float32)),
                jax.random.PRNGKey(i),
            )
            ious = np.asarray(ious)
            for k in range(ious.shape[1]):
                evaluator.process(ious[:, k])
        save_dir = self.cfg.get("SAVE_DIR")
        if save_dir and evaluator.trajectories:
            # Reference interactive_evaluation.py:87-113 saves an
            # IoU-vs-clicks curve image alongside the metrics.
            from .utils.visualizer import iou_curve_png

            os.makedirs(save_dir, exist_ok=True)
            iou_curve_png(
                np.stack(evaluator.trajectories),
                os.path.join(save_dir, f"{name}_iou_curve.png"),
            )
        return {f"{name}/{k}": v for k, v in evaluator.evaluate().items()}

    def _evaluate_captioning(self, params, name, max_batches=None):
        """Image captioning eval (reference evaluate_captioning
        xdecoder_model.py:545-590 + captioning_evaluation.py): autoregressive
        CLIP-token decode scored with BLEU/CIDEr against reference captions."""
        from .evaluation import CaptioningEvaluator

        ds = build_dataset(name, self.cfg.get(name.upper(), {}), "val")
        evaluator = CaptioningEvaluator()
        # KV-cached decode (decoder + CLIP text tower): greedy ids are
        # exactly the full re-run's (tests/test_captioning_cache.py), at a
        # fraction of the per-token cost. CAPTIONING_FULL_RERUN restores
        # the reference-shaped loop for A/B.
        method = (
            SysLearner.evaluate_captioning
            if self.cfg.get("CAPTIONING_FULL_RERUN") else
            SysLearner.evaluate_captioning_cached
        )
        cap_fn = jax.jit(
            lambda p, img: self.model.apply(
                p, img, steps=self.cfg.get("CAPTIONING_STEPS", 20),
                method=method,
            ),
            static_argnums=(),
        )
        n = len(ds) if max_batches is None else min(len(ds), max_batches)
        for i in range(n):
            item = ds[i]
            ids = np.asarray(
                jax.device_get(cap_fn(params, jnp.asarray(item["image"])[None]))
            )[0]
            text = self.tokenizer.batch_decode([ids], skip_special_tokens=True)[0]
            refs = item.get("captions") or [item.get("caption", "")]
            evaluator.process(text, list(refs))
        return {f"{name}/{k}": v for k, v in evaluator.evaluate().items()}

    def _evaluate_retrieval(self, params, name, max_batches=None):
        """Image-text retrieval (reference evaluate_retrieval
        xdecoder_model.py + retrieval_evaluation.py): class-query embedding
        vs pooled caption embeddings, ir@k/tr@k."""
        from .evaluation import RetrievalEvaluator

        ds = build_dataset(name, self.cfg.get(name.upper(), {}), "val")
        ensemble = self.model.cfg.retrieval_ensemble
        evaluator = RetrievalEvaluator(ks=(1, 5), ensemble=ensemble)
        img_fn = jax.jit(
            lambda p, img: self.model.apply(
                p, img,
                method=(SysLearner.evaluate_retrieval_ensemble if ensemble
                        else SysLearner.evaluate_retrieval),
            )
        )
        txt_fn = jax.jit(
            lambda p, ids, m: self.model.apply(
                p, ids, m, method=SysLearner.encode_text_embeddings
            )
        )
        n = len(ds) if max_batches is None else min(len(ds), max_batches)
        for i in range(n):
            item = ds[i]
            out = img_fn(params, jnp.asarray(item["image"])[None])
            v2 = None
            if ensemble:
                v, v2 = np.asarray(out[0])[0], np.asarray(out[1])[0]
            else:
                v = np.asarray(out)[0]
            t = np.asarray(
                txt_fn(
                    params,
                    jnp.asarray(item["caption_ids"])[None],
                    jnp.asarray(item["caption_mask"])[None],
                )
            )
            evaluator.process(v, i, t, [i], image_emb2=v2)
        return {f"{name}/{k}": v for k, v in evaluator.evaluate().items()}

    def _evaluate_classification(self, params, name, max_batches=None):
        """Zero-shot classification (reference evaluate_classification +
        classification_evaluation.py): class-query embedding against the
        class-name prompt ensemble, top-1/top-5."""
        from .evaluation import ClassificationEvaluator

        ds = build_dataset(name, self.cfg.get(name.upper(), {}), "val")
        evaluator = ClassificationEvaluator(ks=(1, 5))
        text_emb = self.class_text_embeddings(params, name, is_eval=True)
        # Drop the background row for classification logits.
        text_cls = text_emb[:-1] if text_emb.shape[0] > 1 else text_emb
        img_fn = jax.jit(
            lambda p, img: self.model.apply(
                p, img, method=SysLearner.evaluate_retrieval
            )
        )
        n = len(ds) if max_batches is None else min(len(ds), max_batches)
        for i in range(n):
            item = ds[i]
            v = np.asarray(img_fn(params, jnp.asarray(item["image"])[None]))
            logits = v @ np.asarray(text_cls).T  # (1, K)
            evaluator.process(logits, np.asarray([item["label"]]))
        return {f"{name}/{k}": v for k, v in evaluator.evaluate().items()}

    def _evaluate_vqa(self, params, name, max_batches=None):
        """VQA through the LLM (reference evaluate_vqa
        xdecoder_model.py:592-630 + vqa_evaluation.py). Requires Load_LLM;
        the tiny-LLM geometry comes from cfg LLM for tests."""
        from .evaluation import VQAEvaluator
        from .models.llm.llama import LlamaConfig, LlamaForCausalLM
        from .models.llm.vqa_pipeline import answer_questions

        ds = build_dataset(name, self.cfg.get(name.upper(), {}), "val")
        evaluator = VQAEvaluator()
        lcfg_d = self.cfg.get("LLM", {})
        lcfg = LlamaConfig(
            vocab_size=lcfg_d.get("VOCAB_SIZE", 32000),
            dim=lcfg_d.get("DIM", 4096),
            layers=lcfg_d.get("LAYERS", 32),
            heads=lcfg_d.get("HEADS", 32),
            kv_heads=lcfg_d.get("KV_HEADS", 32),
            ffn_dim=lcfg_d.get("FFN_DIM", 11008),
            max_seq_len=self.cfg.get("LLM_MAX_LEN", 1024),
            dtype=self.cfg.get("DTYPE", "bfloat16"),
            quant=self.cfg.get("LLM_QUANT", "none"),
        )
        import dataclasses as _dc

        llm = LlamaForCausalLM(cfg=lcfg)
        fp_cfg = _dc.replace(lcfg, quant="none")
        if self.cfg.get("LLM_WEIGHTS"):
            from .models.llm.convert import load_hf_llama_params

            llm_params = load_hf_llama_params(self.cfg["LLM_WEIGHTS"], fp_cfg)
        else:
            llm_params = LlamaForCausalLM(cfg=fp_cfg).init(
                jax.random.PRNGKey(1),
                jnp.zeros((1, 4, lcfg.dim), jnp.float32),
                jnp.ones((1, 4), jnp.int32),
            )
        if lcfg.quant == "int8":
            # Weight-only int8 serving footprint (reference 8-bit load).
            from .models.llm.quant import quantize_llama_params

            llm_params = quantize_llama_params(jax.device_get(llm_params))
        n = len(ds) if max_batches is None else min(len(ds), max_batches)
        for i in range(n):
            item = ds[i]
            answers = answer_questions(
                self.model, params, llm, llm_params, self.tokenizer,
                jnp.asarray(item["image"])[None], [item["question"]],
                max_new_tokens=self.cfg.get("VQA_MAX_NEW_TOKENS", 8),
                max_len=self.cfg.get("LLM_MAX_LEN", 64),
                # Protocol default: the reference generates with
                # num_beams=5 (xdecoder_model.py:611-617); beam decode
                # shares the greedy KV cache. Override VQA_NUM_BEAMS: 1
                # for cheap smoke evals.
                num_beams=self.cfg.get("VQA_NUM_BEAMS", 5),
            )
            evaluator.process(answers[0], list(item["answers"]))
        return {f"{name}/{k}": v for k, v in evaluator.evaluate().items()}

    @staticmethod
    def _gt_from_batch(batch, b, out_hw):
        """Instance-mask batch -> (semantic map, upsampled masks, labels)."""
        if "masks" not in batch:
            return None, None, None
        gt = np.full(out_hw, 255, np.int64)
        scale = out_hw[0] // batch["masks"].shape[2]
        masks, labels = [], []
        for k in range(batch["masks"].shape[1]):
            if batch["valid"][b, k]:
                m = batch["masks"][b, k].repeat(scale, 0).repeat(scale, 1) > 0.5
                gt[m] = batch["labels"][b, k]
                masks.append(m)
                labels.append(int(batch["labels"][b, k]))
        if not masks:
            return gt, np.zeros((0, *out_hw), bool), np.zeros(0, np.int64)
        return gt, np.stack(masks), np.asarray(labels)

    @staticmethod
    def _gt_panoptic(gt_masks, gt_labels):
        if gt_masks is None or len(gt_masks) == 0:
            return np.zeros((1, 1), np.int32), []
        pan = np.zeros(gt_masks.shape[1:], np.int32)
        segs = []
        for i, (m, lab) in enumerate(zip(gt_masks, gt_labels)):
            pan[m] = i + 1
            segs.append({"id": i + 1, "category_id": int(lab)})
        return pan, segs
