"""Evaluation dataset loaders: ADE20K semantic, PASCAL VOC interactive.

Role of /root/reference/datasets/registration/register_ade20k_*.py and
register_pascalvoc_eval.py (:61-81): semantic-seg PNG annotation loaders
and the interactive-eval split (per-instance masks + a sampled visual
prompt per instance). Real data under $DATASET with the standard layouts;
synthetic stand-ins keep eval paths runnable.
"""

from __future__ import annotations

import glob
import os
from typing import Any

import numpy as np

from .datasets import dataset_root, register_dataset
from .transforms import pad_to_square, resize_longest_side
from .visual_sampler import ShapeSampler, SimpleClickSampler


class Ade20kSemSegDataset:
    """ADEChallengeData2016 layout: images/validation/*.jpg +
    annotations/validation/*.png (label ids 1..150; 0 = ignore)."""

    def __init__(self, root: str, split="validation", image_size=1024):
        self.image_size = image_size
        base = os.path.join(root, "ADEChallengeData2016")
        self.images = sorted(glob.glob(os.path.join(base, "images", split, "*.jpg")))
        self.ann_dir = os.path.join(base, "annotations", split)

    def __len__(self):
        return len(self.images)

    def __getitem__(self, i: int) -> dict[str, Any]:
        from PIL import Image

        img_path = self.images[i]
        ann_path = os.path.join(
            self.ann_dir, os.path.basename(img_path).replace(".jpg", ".png")
        )
        image = np.asarray(Image.open(img_path).convert("RGB"))
        sem = np.asarray(Image.open(ann_path), np.int32)
        h, w = image.shape[:2]
        image = pad_to_square(
            resize_longest_side(image, self.image_size), self.image_size
        ).astype(np.float32)
        # Labels: 0 -> ignore(255); 1..150 -> 0..149.
        sem = np.where(sem == 0, 255, sem - 1)
        return {
            "image": image, "sem_seg": sem, "height": h, "width": w,
        }


class SyntheticSemSegDataset:
    """Non-square semantic-annotation smoke stream: exercises the exact ADE
    geometry (resize-longest + pad input, ORIGINAL-size gt + postprocess)."""

    def __init__(self, image_size=64, length=4, num_classes=4, seed=0):
        self.image_size = image_size
        self.length = length
        self.num_classes = num_classes
        self.seed = seed

    def __len__(self):
        return self.length

    def __getitem__(self, i: int):
        rs = np.random.RandomState(self.seed * 29 + i)
        h, w = self.image_size - 10, self.image_size + 14  # non-square
        image = (rs.rand(h, w, 3) * 255).astype(np.uint8)
        sem = rs.randint(0, self.num_classes, (h, w)).astype(np.int32)
        sem[0, 0] = 255  # an ignore pixel
        img = pad_to_square(
            resize_longest_side(image, self.image_size), self.image_size
        ).astype(np.float32)
        return {"image": img, "sem_seg": sem, "height": h, "width": w}


@register_dataset("synthetic_semseg_ade")
def _build_synth_semseg(cfg, split):
    return SyntheticSemSegDataset(
        image_size=cfg.get("IMAGE_SIZE", 64), length=cfg.get("LENGTH", 4),
        num_classes=cfg.get("NUM_CLASSES", 4),
    )


@register_dataset("ade20k_panoptic_val")
@register_dataset("ade20k_sem_seg_val")
def _build_ade(cfg, split):
    root = dataset_root()
    if root is None:
        raise FileNotFoundError("$DATASET not set; ADE20K unavailable.")
    return Ade20kSemSegDataset(root)


class PascalVocInteractiveDataset:
    """VOC2012 SegmentationObject layout -> per-instance masks + one sampled
    visual prompt each (reference pascalvoc_dataset_mapper_ix.py:133-182)."""

    def __init__(self, root: str, image_size=1024, prompt_mode="Point",
                 max_instances=8, seed=0, legacy_sampler=False):
        base = os.path.join(root, "VOCdevkit", "VOC2012")
        split_file = os.path.join(
            base, "ImageSets", "Segmentation", "val.txt"
        )
        with open(split_file) as f:
            self.ids = [line.strip() for line in f if line.strip()]
        self.base = base
        self.image_size = image_size
        self.max_instances = max_instances
        self.prompt_mode = prompt_mode
        if legacy_sampler:
            # Pre-round-4 behavior (random fg pixels) kept selectable for
            # A/B; NOT the reference protocol.
            self.sampler = ShapeSampler(
                max_candidate=max_instances, modes=(prompt_mode,), seed=seed
            )
        else:
            # The reference's eval path builds SimpleClickSampler
            # (/root/reference/datasets/visual_sampler/__init__.py:5-6):
            # first prompts are placed at the distance-transform argmax
            # (deepest interior point), not random fg pixels.
            self.sampler = SimpleClickSampler(
                mask_mode=prompt_mode, seed=seed
            )

    def __len__(self):
        return len(self.ids)

    def __getitem__(self, i: int) -> dict[str, Any]:
        from PIL import Image

        iid = self.ids[i]
        image = np.asarray(
            Image.open(os.path.join(self.base, "JPEGImages", f"{iid}.jpg")).convert("RGB")
        )
        obj = np.asarray(
            Image.open(os.path.join(self.base, "SegmentationObject", f"{iid}.png"))
        )
        inst_ids = [v for v in np.unique(obj) if v not in (0, 255)]
        masks = np.stack(
            [obj == v for v in inst_ids[: self.max_instances]]
        ) if inst_ids else np.zeros((0, *obj.shape), bool)
        # Geometry contract: gt masks and sampled prompts live in MODEL INPUT
        # space — the same resize-longest + bottom/right pad as the image
        # (reference evaluate_interactive interpolates gt to the padded input,
        # xdecoder_model.py:705-706, and scales click coords :714-717).
        s = self.image_size
        resized = np.zeros((len(masks), s, s), bool)
        for k, m in enumerate(masks):
            r = resize_longest_side((m[..., None] * np.uint8(255)).repeat(3, -1), s)[..., 0]
            resized[k, : r.shape[0], : r.shape[1]] = r > 127
        prompts = self.sampler(resized)
        image = pad_to_square(
            resize_longest_side(image, self.image_size), self.image_size
        ).astype(np.float32)
        return {
            "image": image,
            "gt_masks": resized,
            "spatial_query": prompts,
            "height": obj.shape[0],
            "width": obj.shape[1],
        }


@register_dataset("pascalvoc_val")
def _build_voc(cfg, split):
    root = dataset_root()
    if root is None:
        raise FileNotFoundError("$DATASET not set; PASCAL VOC unavailable.")
    mode = cfg.get("PROMPT_MODE")
    if mode is None:
        # Reference configs name the eval 'pascalvoc_val_<Mode>' with the
        # visual-prompt type as the suffix (configs/step1.yaml:26
        # 'pascalvoc_val_Point'; register_pascalvoc_eval.py).
        req = cfg.get("_REQUESTED_NAME", "")
        suffix = req[len("pascalvoc_val_"):] if req.startswith(
            "pascalvoc_val_") else ""
        mode = suffix if suffix in (
            "Point", "Scribble", "Polygon", "Circle", "Box") else "Point"
    return PascalVocInteractiveDataset(
        root, prompt_mode=mode,
        legacy_sampler=cfg.get("LEGACY_SAMPLER", False),
    )
