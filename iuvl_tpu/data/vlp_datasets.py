"""VLP / instruction / referring dataset builders.

Role of /root/reference/datasets/registration/register_vlp_datasets.py,
register_refcoco_dataset.py and the vlp/instruction/vqa mappers
(dataset_mappers/vlp_dataset_mapper.py:102-164,
instruction_dataset_mapper.py:165-293, refcoco_dataset_mapper.py:137-201):
image + caption token batches for captioning/retrieval pretraining,
conversation -> (ids, masked labels) for instruction tuning, and grounding
text + mask batches for referring segmentation.

Real data roots come from $DATASET (pyarrow files for VLP, REFER pickles
for RefCOCO); synthetic fallbacks keep every task stream executable.
"""

from __future__ import annotations

import os
import pickle
from typing import Any

import numpy as np

from .datasets import dataset_root, register_dataset
from .nouns import noun_prompts
from .tokenizer import CONTEXT_LEN, build_tokenizer


class SyntheticVlpDataset:
    """Random images + templated captions (keeps the vlp stream running)."""

    _OBJECTS = ["dog", "cat", "car", "tree", "house", "person", "boat", "bird"]
    _VERBS = ["standing near", "next to", "in front of", "behind"]

    def __init__(self, image_size=1024, length=64, seed=0, tokenizer=None):
        self.image_size = image_size
        self.length = length
        self.seed = seed
        self.tokenizer = tokenizer or build_tokenizer()

    def __len__(self):
        return self.length

    def __getitem__(self, i: int) -> dict[str, Any]:
        rs = np.random.RandomState(self.seed * 7919 + i)
        s = self.image_size
        image = (rs.rand(s, s, 3) * 255).astype(np.float32)
        a, b = rs.choice(self._OBJECTS, 2, replace=False)
        caption = f"a {a} {rs.choice(self._VERBS)} a {b}"
        toks = self.tokenizer([caption])
        return {
            "image": image,
            "caption_ids": toks["input_ids"][0],
            "caption_mask": toks["attention_mask"][0],
            "caption": caption,
        }


@register_dataset("vlp_train")
def _build_vlp(cfg, split):
    root = dataset_root()
    # Real pyarrow-backed VLP data would be loaded here (reference
    # vlp_dataset_mapper.py reads arrow files of image bytes + captions);
    # fall back to synthetic when absent.
    return SyntheticVlpDataset(
        image_size=cfg.get("IMAGE_SIZE", 1024), length=cfg.get("LENGTH", 64)
    )


@register_dataset("synthetic_vlp")
@register_dataset("synthetic_captioning")
@register_dataset("synthetic_retrieval")
def _build_synth_vlp(cfg, split):
    return SyntheticVlpDataset(
        image_size=cfg.get("IMAGE_SIZE", 1024), length=cfg.get("LENGTH", 64)
    )


class SyntheticClassificationDataset:
    """ImageNet-style smoke stream: image + class label (the zero-shot
    classification eval path, reference register_imagenet_cls.py)."""

    def __init__(self, image_size=64, length=8, num_classes=4, seed=0):
        self.image_size = image_size
        self.length = length
        self.num_classes = num_classes
        self.seed = seed

    def __len__(self):
        return self.length

    def __getitem__(self, i: int):
        rs = np.random.RandomState(self.seed * 13 + i)
        s = self.image_size
        return {
            "image": (rs.rand(s, s, 3) * 255).astype(np.float32),
            "label": int(rs.randint(self.num_classes)),
        }


@register_dataset("synthetic_classification")
def _build_synth_cls(cfg, split):
    return SyntheticClassificationDataset(
        image_size=cfg.get("IMAGE_SIZE", 64), length=cfg.get("LENGTH", 8),
        num_classes=cfg.get("NUM_CLASSES", 4),
    )


class SyntheticVqaDataset:
    """VQA smoke stream: image + question + gt answers (reference
    registration vqa json split + vqa_evaluation.py inputs)."""

    def __init__(self, image_size=64, length=4, seed=0):
        self.image_size = image_size
        self.length = length
        self.seed = seed

    def __len__(self):
        return self.length

    def __getitem__(self, i: int):
        rs = np.random.RandomState(self.seed * 101 + i)
        s = self.image_size
        return {
            "image": (rs.rand(s, s, 3) * 255).astype(np.float32),
            "question": "what color is the object?",
            "answers": ["red"] * 10,
        }


@register_dataset("synthetic_vqa")
def _build_synth_vqa(cfg, split):
    return SyntheticVqaDataset(
        image_size=cfg.get("IMAGE_SIZE", 64), length=cfg.get("LENGTH", 4)
    )


class RefCocoDataset:
    """RefCOCO referring-expression dataset via REFER pickles
    (reference datasets/refer.py + refcoco_dataset_mapper.py)."""

    def __init__(self, root: str, dataset="refcocog", split_by="umd",
                 split="val", image_size=1024, max_phrases=2, tokenizer=None):
        self.image_size = image_size
        self.max_phrases = max_phrases
        self.tokenizer = tokenizer or build_tokenizer()
        ref_file = os.path.join(root, dataset, f"refs({split_by}).p")
        with open(ref_file, "rb") as f:
            refs = pickle.load(f)
        self.refs = [r for r in refs if r["split"] == split]
        import json

        with open(os.path.join(root, dataset, "instances.json")) as f:
            inst = json.load(f)
        self.anns = {a["id"]: a for a in inst["annotations"]}
        self.imgs = {im["id"]: im for im in inst["images"]}
        self.img_dir = os.path.join(root, "images", "train2014")

    def __len__(self):
        return len(self.refs)

    def __getitem__(self, i: int) -> dict[str, Any]:
        from PIL import Image

        from .transforms import pad_to_square, resize_longest_side

        ref = self.refs[i]
        meta = self.imgs[ref["image_id"]]
        image = np.asarray(
            Image.open(os.path.join(self.img_dir, meta["file_name"])).convert("RGB")
        )
        image = pad_to_square(
            resize_longest_side(image, self.image_size), self.image_size
        ).astype(np.float32)
        texts = [s["sent"] for s in ref["sentences"]][: self.max_phrases]
        toks = self.tokenizer(texts)
        # Mask from polygon segmentation.
        ann = self.anns[ref["ann_id"]]
        mask = self._rasterize(ann, meta["height"], meta["width"])
        return {
            "image": image,
            "texts": texts,
            "text_ids": toks["input_ids"],
            "text_mask": toks["attention_mask"],
            "gt_mask": mask,
            "height": meta["height"],
            "width": meta["width"],
        }

    @staticmethod
    def _rasterize(ann, h, w):
        import cv2

        mask = np.zeros((h, w), np.uint8)
        seg = ann.get("segmentation", [])
        if isinstance(seg, list):
            for poly in seg:
                pts = np.asarray(poly, np.float64).reshape(-1, 2).astype(np.int32)
                cv2.fillPoly(mask, [pts], 1)
        elif isinstance(seg, dict):
            # COCO RLE (iscrowd / pre-encoded): counts is an uncompressed
            # list or a compressed string.
            from ..inference.amg import coco_decode_rle, rle_to_mask

            rle = coco_decode_rle(seg) if isinstance(seg["counts"], str) else seg
            return rle_to_mask(rle)
        return mask.astype(bool)


@register_dataset("refcocog_val")
def _build_refcocog(cfg, split):
    root = dataset_root()
    if root is None:
        raise FileNotFoundError("$DATASET not set; RefCOCO unavailable.")
    return RefCocoDataset(root, split="val")


class SyntheticRefDataset:
    """Referring-expression smoke stream: rectangle target + phrase."""

    def __init__(self, image_size=64, length=8, seed=0, tokenizer=None):
        self.image_size = image_size
        self.length = length
        self.seed = seed
        self.tokenizer = tokenizer or build_tokenizer()

    def __len__(self):
        return self.length

    def __getitem__(self, i: int):
        rs = np.random.RandomState(self.seed * 31 + i)
        s = self.image_size
        image = (rs.rand(s, s, 3) * 255).astype(np.float32)
        y0, x0 = rs.randint(0, s // 2, 2)
        y1, x1 = rs.randint(s // 2, s, 2)
        mask = np.zeros((s, s), bool)
        mask[y0:y1, x0:x1] = True
        texts = ["the red box on the left"]
        toks = self.tokenizer(texts)
        return {
            "image": image, "texts": texts,
            "text_ids": toks["input_ids"], "text_mask": toks["attention_mask"],
            "gt_mask": mask, "height": s, "width": s,
        }


@register_dataset("synthetic_refcoco")
def _build_synth_ref(cfg, split):
    return SyntheticRefDataset(
        image_size=cfg.get("IMAGE_SIZE", 64), length=cfg.get("LENGTH", 8)
    )


class SyntheticInteractiveDataset:
    """Interactive-eval smoke stream: instances + point prompts."""

    def __init__(self, image_size=64, length=8, max_instances=2, seed=0,
                 prompt_mode="Point"):
        from .visual_sampler import ShapeSampler, SimpleClickSampler

        self.image_size = image_size
        self.length = length
        self.max_instances = max_instances
        self.prompt_mode = prompt_mode
        if prompt_mode == "Point":
            self.sampler = ShapeSampler(
                max_candidate=max_instances, modes=("Point",), seed=seed
            )
        else:
            # Box/Circle/Scribble/Polygon single-shot modes go through the
            # protocol sampler (pipeline dispatches on ds.prompt_mode).
            self.sampler = SimpleClickSampler(mask_mode=prompt_mode, seed=seed)
        self.seed = seed

    def __len__(self):
        return self.length

    def __getitem__(self, i: int):
        rs = np.random.RandomState(self.seed * 17 + i)
        s = self.image_size
        image = (rs.rand(s, s, 3) * 255).astype(np.float32)
        masks = np.zeros((self.max_instances, s, s), bool)
        for k in range(self.max_instances):
            y0, x0 = rs.randint(0, s // 2, 2)
            y1 = rs.randint(y0 + s // 4, s)
            x1 = rs.randint(x0 + s // 4, s)
            masks[k, y0:y1, x0:x1] = True
        return {
            "image": image, "gt_masks": masks,
            "spatial_query": self.sampler(masks),
            "height": s, "width": s,
        }


@register_dataset("synthetic_interactive")
def _build_synth_interactive(cfg, split):
    return SyntheticInteractiveDataset(
        image_size=cfg.get("IMAGE_SIZE", 64), length=cfg.get("LENGTH", 8),
        prompt_mode=cfg.get("PROMPT_MODE", "Point"),
    )


class SyntheticInstructionDataset:
    """Conversation stream with <image> token (instruction tuning)."""

    def __init__(self, image_size=1024, length=32, seed=0, tokenizer=None,
                 max_len=256, vocab_size=None, context_len=CONTEXT_LEN):
        self.image_size = image_size
        self.length = length
        self.seed = seed
        self.max_len = max_len
        self.vocab_size = vocab_size  # clamp ids for tiny test LLMs
        self.context_len = context_len
        self.tokenizer = tokenizer or build_tokenizer()

    def __len__(self):
        return self.length

    def __getitem__(self, i: int) -> dict[str, Any]:
        from ..models.llm.conversation import default_conversation
        from ..models.llm.multimodal import (
            IGNORE_INDEX, IMAGE_TOKEN_INDEX, tokenizer_image_token,
        )

        rs = np.random.RandomState(self.seed * 104729 + i)
        s = self.image_size
        image = (rs.rand(s, s, 3) * 255).astype(np.float32)
        conv = default_conversation()
        question = "what is in this image?"
        answer = "a scene with several objects"
        conv.append_message(conv.roles[0], f"<image>\n{question}")
        conv.append_message(conv.roles[1], answer)
        prompt = conv.get_prompt()
        # Mask everything before the assistant answer (reference
        # llm/utils.py preprocess_v1: tokenize the prompt split at the
        # assistant marker). Tokenizing the whole prompt and right-aligning
        # answer ids would mis-place supervision: the trailing '</s>'
        # separator adds BPE tokens after the answer.
        marker = f"{conv.roles[1]}: "
        head, _, tail = prompt.rpartition(marker)
        prefix_ids = tokenizer_image_token(head + marker, self.tokenizer)
        tail_ids = self.tokenizer.encode_text(tail)  # answer + sep tokens
        ids = prefix_ids + tail_ids
        labels = [IGNORE_INDEX] * len(prefix_ids) + tail_ids
        ids = np.asarray(ids[: self.max_len], np.int32)
        labels = np.asarray(labels[: self.max_len], np.int32)
        if self.vocab_size:
            keep_img = ids == IMAGE_TOKEN_INDEX
            ids = np.where(keep_img, ids, ids % self.vocab_size)
            labels = np.where(labels == IGNORE_INDEX, labels,
                              labels % self.vocab_size)
        # Question context for the unified head's 'llm' task (CLIP tokens,
        # reference vlpencoder get_text_token_embeddings instruction path).
        qt = self.tokenizer([question], max_length=self.context_len)
        return {
            "image": image, "input_ids": ids, "labels": labels,
            "clip_ids": qt["input_ids"][0], "clip_mask": qt["attention_mask"][0],
        }


@register_dataset("instruction_train")
def _build_instruction(cfg, split):
    return SyntheticInstructionDataset(
        image_size=cfg.get("IMAGE_SIZE", 1024), length=cfg.get("LENGTH", 32),
        max_len=cfg.get("MAX_LEN", 256), vocab_size=cfg.get("VOCAB_SIZE"),
        context_len=cfg.get("CONTEXT_LEN", CONTEXT_LEN),
    )


@register_dataset("synthetic_instruction")
def _build_synth_instruction(cfg, split):
    return SyntheticInstructionDataset(
        image_size=cfg.get("IMAGE_SIZE", 64), length=cfg.get("LENGTH", 8),
        max_len=cfg.get("MAX_LEN", 64), vocab_size=cfg.get("VOCAB_SIZE"),
        context_len=cfg.get("CONTEXT_LEN", CONTEXT_LEN),
    )


def build_grounding_targets(
    captions: list[str],
    encode_fn,
    tokenizer,
    max_phrases: int = 5,
):
    """Caption -> noun phrases -> (token ids, group matrix) for the
    grounding loss (reference coco_panoptic_interactive mapper grounding
    sampling + criterion hash tables). encode_fn: ids, mask -> class embs."""
    all_ids, all_masks, groups, valids = [], [], [], []
    for cap in captions:
        phrases, prompts = noun_prompts(cap, max_phrases)
        toks = tokenizer(prompts or ["something"])
        n = len(prompts) or 1
        ids = np.zeros((max_phrases, CONTEXT_LEN), np.int32)
        msk = np.zeros((max_phrases, CONTEXT_LEN), np.int32)
        ids[:n] = toks["input_ids"][:max_phrases]
        msk[:n] = toks["attention_mask"][:max_phrases]
        group = np.eye(max_phrases, dtype=np.float32)
        uniq = {}
        for a, p in enumerate(phrases[:max_phrases]):
            if p in uniq:
                b = uniq[p]
                group[a, b] = group[b, a] = 1
            else:
                uniq[p] = a
        all_ids.append(ids)
        all_masks.append(msk)
        groups.append(group)
        valids.append(np.arange(max_phrases) < n)
    import jax.numpy as jnp

    ids = jnp.asarray(np.stack(all_ids))
    msk = jnp.asarray(np.stack(all_masks))
    b, g, t = ids.shape
    class_embs = encode_fn(ids.reshape(b * g, t), msk.reshape(b * g, t))
    return {
        "class_embs": class_embs.reshape(b, g, -1),
        "group_matrix": jnp.asarray(np.stack(groups)),
        "valid": jnp.asarray(np.stack(valids)),
    }
