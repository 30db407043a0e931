"""Dataset registry + loaders.

Role of /root/reference/datasets/build.py + datasets/registration/*: a
name -> builder registry populated at import, a per-dataset config overlay,
and a JointLoader zipping task streams into {coco: ..., vlp: ...} batches
(build.py:53-69,442-488).

TPU-first data contract: every batch is a dict of dense, static-shape numpy
arrays (images padded to the square input size, instances padded to
``max_instances`` with validity masks) — no ragged list-of-dicts. Real
dataset roots come from the $DATASET env var like the reference
(registration/register_coco_panoptic_annos_caption_grounding.py:229); a
synthetic generator stands in when data is absent so the full train/eval
path stays executable anywhere.
"""

from __future__ import annotations

import json
import os
from typing import Callable, Iterator

import numpy as np

from .class_names import COCO_PANOPTIC_CLASSES, get_class_names
from .transforms import pad_to_square, resize_longest_side
from .visual_sampler import ShapeSampler

DATASET_REGISTRY: dict[str, Callable] = {}


def register_dataset(name: str):
    def deco(fn):
        DATASET_REGISTRY[name] = fn
        return fn

    return deco


def dataset_root() -> str | None:
    return os.environ.get("DATASET")


# --------------------------------------------------------------------- #
# Synthetic stream (smoke tests / no-data environments)
# --------------------------------------------------------------------- #
class SyntheticSegDataset:
    """Random images with rectangle instances — keeps the full pipeline
    executable without real data."""

    def __init__(self, num_classes=10, image_size=1024, max_instances=8,
                 length=64, seed=0, mask_stride=4):
        self.num_classes = num_classes
        self.image_size = image_size
        self.max_instances = max_instances
        self.length = length
        self.seed = seed
        self.mask_stride = mask_stride
        self.sampler = ShapeSampler(max_candidate=1, seed=seed)

    def __len__(self):
        return self.length

    def __getitem__(self, i: int) -> dict:
        rs = np.random.RandomState(self.seed * 100003 + i)
        s = self.image_size
        ms = s // self.mask_stride
        image = (rs.rand(s, s, 3) * 255).astype(np.float32)
        n_inst = rs.randint(1, self.max_instances + 1)
        labels = np.zeros(self.max_instances, np.int32)
        masks = np.zeros((self.max_instances, ms, ms), np.float32)
        valid = np.zeros(self.max_instances, bool)
        for k in range(n_inst):
            y0, x0 = rs.randint(0, ms // 2, 2)
            y1 = rs.randint(y0 + ms // 8, ms)
            x1 = rs.randint(x0 + ms // 8, ms)
            masks[k, y0:y1, x0:x1] = 1.0
            labels[k] = rs.randint(0, self.num_classes)
            valid[k] = True
        return {
            "image": image,
            "labels": labels,
            "masks": masks,
            "valid": valid,
            "height": s,
            "width": s,
        }


@register_dataset("synthetic_seg")
def _build_synthetic(cfg: dict, split: str):
    return SyntheticSegDataset(
        num_classes=cfg.get("NUM_CLASSES", 10),
        image_size=cfg.get("IMAGE_SIZE", 1024),
        max_instances=cfg.get("MAX_INSTANCES", 8),
        length=cfg.get("LENGTH", 64),
    )


# --------------------------------------------------------------------- #
# COCO panoptic (real data when $DATASET provides it)
# --------------------------------------------------------------------- #
class CocoPanopticDataset:
    """COCO panoptic + captions mapper
    (reference dataset_mappers/coco_panoptic_interactive_dataset_mapper.py).
    Expects the standard layout under $DATASET/coco: panoptic json + pngs."""

    def __init__(self, root: str, split: str = "train2017", image_size=1024,
                 max_instances=100, mask_stride=4):
        self.root = root
        self.split = split
        self.image_size = image_size
        self.max_instances = max_instances
        self.mask_stride = mask_stride
        ann_path = os.path.join(
            root, "coco", "annotations", f"panoptic_{split}.json"
        )
        with open(ann_path) as f:
            data = json.load(f)
        self.annotations = data["annotations"]
        self.images = {im["id"]: im for im in data["images"]}
        cats = sorted(data["categories"], key=lambda c: c["id"])
        self.cat_to_contiguous = {c["id"]: i for i, c in enumerate(cats)}

    def __len__(self):
        return len(self.annotations)

    def __getitem__(self, i: int) -> dict:
        from PIL import Image

        ann = self.annotations[i]
        meta = self.images[ann["image_id"]]
        img_path = os.path.join(self.root, "coco", self.split, meta["file_name"])
        pan_path = os.path.join(
            self.root, "coco", "annotations", f"panoptic_{self.split}",
            ann["file_name"],
        )
        image = np.asarray(Image.open(img_path).convert("RGB"))
        pan = np.asarray(Image.open(pan_path), np.uint32)
        seg_id = pan[..., 0] + 256 * pan[..., 1] + 256 * 256 * pan[..., 2]

        image = pad_to_square(
            resize_longest_side(image, self.image_size), self.image_size
        ).astype(np.float32)

        s = self.image_size
        ms = s // self.mask_stride
        labels = np.zeros(self.max_instances, np.int32)
        masks = np.zeros((self.max_instances, ms, ms), np.float32)
        valid = np.zeros(self.max_instances, bool)
        for k, seg in enumerate(ann["segments_info"][: self.max_instances]):
            m = (seg_id == seg["id"]).astype(np.uint8) * 255
            m = resize_longest_side(m[..., None].repeat(3, -1), ms)[..., 0]
            mm = np.zeros((ms, ms), np.float32)
            mm[: m.shape[0], : m.shape[1]] = m > 127
            masks[k] = mm
            labels[k] = self.cat_to_contiguous[seg["category_id"]]
            valid[k] = True
        return {
            "image": image, "labels": labels, "masks": masks, "valid": valid,
            "height": meta["height"], "width": meta["width"],
        }


@register_dataset("coco_2017_train_panoptic")
def _build_coco_train(cfg, split):
    root = dataset_root()
    if root is None:
        raise FileNotFoundError(
            "$DATASET not set; COCO unavailable. Use 'synthetic_seg' or set "
            "DATASET to a root containing coco/ (reference layout)."
        )
    return CocoPanopticDataset(root, "train2017", **{
        k: v for k, v in cfg.items() if k in ("image_size", "max_instances")
    })


@register_dataset("coco_2017_val_panoptic")
def _build_coco_val(cfg, split):
    root = dataset_root()
    if root is None:
        raise FileNotFoundError("$DATASET not set; COCO unavailable.")
    return CocoPanopticDataset(root, "val2017")


# --------------------------------------------------------------------- #
# Loaders
# --------------------------------------------------------------------- #
def build_dataset(name: str, cfg: dict | None = None, split: str = "train"):
    for key, builder in DATASET_REGISTRY.items():
        if name.startswith(key) or key in name:
            return builder(cfg or {}, split)
    raise KeyError(f"dataset {name!r} not registered; have {list(DATASET_REGISTRY)}")


def batched_iterator(
    dataset, batch_size: int, shuffle: bool = True, seed: int = 0,
    drop_last: bool = True, epochs: int | None = None,
) -> Iterator[dict]:
    """Dense-collated epoch iterator (host-side)."""
    epoch = 0
    while epochs is None or epoch < epochs:
        order = np.arange(len(dataset))
        if shuffle:
            np.random.RandomState(seed + epoch).shuffle(order)
        for start in range(0, len(order) - (batch_size - 1 if drop_last else 0),
                           batch_size):
            idx = order[start : start + batch_size]
            if drop_last and len(idx) < batch_size:
                break
            items = [dataset[int(i)] for i in idx]
            yield {
                k: np.stack([it[k] for it in items])
                for k in items[0]
                if isinstance(items[0][k], np.ndarray)
            } | {"epoch": epoch}
        epoch += 1


def prefetch_iterator(it: Iterator, depth: int = 2) -> Iterator:
    """Background-thread prefetch so host-side collation (image decode,
    resize, prompt rasterization) overlaps device compute — the TPU-side
    role of the reference's detectron2 worker loaders
    (DATALOADER.NUM_WORKERS)."""
    import queue
    import threading

    q: "queue.Queue" = queue.Queue(maxsize=depth)
    sentinel = object()

    def worker():
        try:
            for item in it:
                q.put(item)
        finally:
            q.put(sentinel)

    t = threading.Thread(target=worker, daemon=True)
    t.start()
    while True:
        item = q.get()
        if item is sentinel:
            return
        yield item


class JointLoader:
    """Zip several task streams into one batch dict keyed by task name
    (reference datasets/build.py:53-69)."""

    def __init__(self, loaders: dict[str, Iterator]):
        self.loaders = loaders

    def __iter__(self):
        iters = {k: iter(v) for k, v in self.loaders.items()}
        while True:
            try:
                yield {k: next(it) for k, it in iters.items()}
            except StopIteration:
                return
