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
                 length=64, seed=0, mask_stride=4, with_step1=False,
                 text_len=24):
        self.num_classes = num_classes
        self.image_size = image_size
        self.max_instances = max_instances
        self.length = length
        self.seed = seed
        self.mask_stride = mask_stride
        self.sampler = ShapeSampler(max_candidate=1, seed=seed)
        self.step1 = None
        if with_step1:
            from .step1 import Step1ExtrasBuilder
            from .tokenizer import build_tokenizer

            ms = image_size // mask_stride
            self.step1 = Step1ExtrasBuilder(
                build_tokenizer(), text_len=text_len, mask_hw=(ms, ms)
            )

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
        item = {
            "image": image,
            "labels": labels,
            "masks": masks,
            "valid": valid,
            "height": s,
            "width": s,
        }
        if self.step1 is not None:
            from .step1 import spatial_prompt_arrays

            names = [f"object {labels[k]}" for k in range(n_inst)]
            caption = "a photo of " + " and ".join(
                f"a {n}" for n in names[:3]
            ) + " in a scene"
            item.update(
                self.step1(
                    caption, names, masks[:n_inst], mode="class", rs=rs
                )
            )
            item.update(spatial_prompt_arrays(
                self.sampler, masks[:n_inst], self.mask_stride, rs
            ))
        return item


@register_dataset("synthetic_seg_step1")
def _build_synthetic_step1(cfg: dict, split: str):
    return SyntheticSegDataset(
        num_classes=cfg.get("NUM_CLASSES", 10),
        image_size=cfg.get("IMAGE_SIZE", 1024),
        max_instances=cfg.get("MAX_INSTANCES", 8),
        length=cfg.get("LENGTH", 64),
        with_step1=True,
        text_len=cfg.get("TEXT_LEN", 24),
    )


@register_dataset("synthetic_seg")
def _build_synthetic(cfg: dict, split: str):
    return SyntheticSegDataset(
        num_classes=cfg.get("NUM_CLASSES", 10),
        image_size=cfg.get("IMAGE_SIZE", 1024),
        max_instances=cfg.get("MAX_INSTANCES", 8),
        length=cfg.get("LENGTH", 64),
        with_step1=bool(cfg.get("WITH_STEP1", False)),
        text_len=cfg.get("TEXT_LEN", 24),
    )


# --------------------------------------------------------------------- #
# COCO panoptic (real data when $DATASET provides it)
# --------------------------------------------------------------------- #
class CocoPanopticDataset:
    """COCO panoptic + captions + grounding step1 mapper
    (reference dataset_mappers/coco_panoptic_interactive_dataset_mapper.py
    :175-329 + registration/register_coco_panoptic_annos_caption_grounding.py
    :120-165). Standard layout under $DATASET/coco: panoptic json + pngs,
    captions_{split}.json, grounding_{split}.json (each optional — absent
    files degrade gracefully to the pure-seg stream).

    Train mode applies LSJ (scale 0.1-2.0 + random crop/pad + hflip,
    reference COCO.INPUT) jointly to image, instance masks and grounding
    masks; caption/grounding extras are emitted as static token-ID arrays
    (see iuvl_tpu/data/step1.py) and spatial prompts via ShapeSampler."""

    def __init__(self, root: str, split: str = "train2017", image_size=1024,
                 max_instances=100, mask_stride=4, train=True, lsj=True,
                 step1=True, text_len=24, seed=0):
        self.root = root
        self.split = split
        self.image_size = image_size
        self.max_instances = max_instances
        self.mask_stride = mask_stride
        self.train = train
        self.lsj = lsj and train
        self.seed = seed
        ann_dir = os.path.join(root, "coco", "annotations")
        with open(os.path.join(ann_dir, f"panoptic_{split}.json")) as f:
            data = json.load(f)
        self.annotations = data["annotations"]
        self.images = {im["id"]: im for im in data["images"]}
        cats = sorted(data["categories"], key=lambda c: c["id"])
        self.cat_to_contiguous = {c["id"]: i for i, c in enumerate(cats)}
        self.cat_names = {c["id"]: c["name"] for c in cats}

        self.captions: dict[int, list[str]] = {}
        cap_path = os.path.join(ann_dir, f"captions_{split}.json")
        if train and os.path.exists(cap_path):
            with open(cap_path) as f:
                for a in json.load(f)["annotations"]:
                    self.captions.setdefault(int(a["image_id"]), []).append(
                        a["caption"]
                    )
        self.grounding: dict[int, list[dict]] = {}
        grd_path = os.path.join(ann_dir, f"grounding_{split}.json")
        if train and os.path.exists(grd_path):
            with open(grd_path) as f:
                for a in json.load(f)["annotations"]:
                    self.grounding.setdefault(int(a["image_id"]), []).append(a)

        self.step1 = None
        if step1 and train:
            from .step1 import Step1ExtrasBuilder
            from .tokenizer import build_tokenizer

            ms = image_size // mask_stride
            self.step1 = Step1ExtrasBuilder(
                build_tokenizer(), text_len=text_len, mask_hw=(ms, ms)
            )
        self.sampler = ShapeSampler(max_candidate=3, seed=seed) if train else None

    def __len__(self):
        return len(self.annotations)

    @staticmethod
    def _rasterize_poly(segmentation, h, w) -> np.ndarray:
        """COCO polygon/RLE -> bool mask without pycocotools (cv2 fillPoly
        for polygons; uncompressed RLE counts supported)."""
        mask = np.zeros((h, w), np.uint8)
        if isinstance(segmentation, dict):  # uncompressed RLE
            counts = segmentation.get("counts")
            if isinstance(counts, list):
                flat = np.zeros(h * w, np.uint8)
                pos, val = 0, 0
                for c in counts:
                    if val:
                        flat[pos : pos + c] = 1
                    pos += c
                    val ^= 1
                mask = flat.reshape(w, h).T  # COCO RLE is column-major
            return mask.astype(bool)
        import cv2

        for poly in segmentation:
            pts = np.asarray(poly, np.float64).reshape(-1, 2).astype(np.int32)
            cv2.fillPoly(mask, [pts], 1)
        return mask.astype(bool)

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
        h, w = image.shape[:2]
        rs = np.random.RandomState((self.seed * 1000003 + i) % (2 ** 31))

        segments = [
            s for s in ann["segments_info"] if not s.get("iscrowd", 0)
        ][: self.max_instances]
        inst_masks = np.stack(
            [seg_id == s["id"] for s in segments]
        ) if segments else np.zeros((0, h, w), bool)

        # Grounding annotations ("text" mode) or class-name fallback.
        grd_anns = self.grounding.get(int(ann["image_id"]), [])
        if grd_anns:
            mode = "text"
            grd_masks = np.stack(
                [
                    self._rasterize_poly(a["segmentation"], h, w)
                    for a in grd_anns
                ]
            )
            grd_texts = [
                a["sentences"][rs.randint(len(a["sentences"]))]["raw"].lower()
                for a in grd_anns
            ]
        else:
            mode = "class"
            grd_masks = inst_masks
            grd_texts = [self.cat_names[s["category_id"]] for s in segments]

        s_ = self.image_size
        ms = s_ // self.mask_stride
        n_inst = len(segments)
        if self.lsj:
            from .augment import lsj_apply

            all_masks = (
                np.concatenate([inst_masks, grd_masks])
                if len(grd_masks) and mode == "text"
                else inst_masks
            )
            image, all_small = lsj_apply(
                image, all_masks, rs, image_size=s_, mask_stride=self.mask_stride
            )
            inst_small = all_small[:n_inst]
            grd_small = all_small[n_inst:] if mode == "text" else inst_small
        else:
            image = pad_to_square(
                resize_longest_side(image, s_), s_
            ).astype(np.float32)
            inst_small = _downsample_masks(inst_masks, s_, ms)
            grd_small = (
                _downsample_masks(grd_masks, s_, ms)
                if mode == "text" else inst_small
            )

        # Drop instances emptied by the crop (reference filter_empty).
        keep = inst_small.sum((-2, -1)) > 0 if n_inst else np.zeros(0, bool)
        labels = np.zeros(self.max_instances, np.int32)
        masks = np.zeros((self.max_instances, ms, ms), np.float32)
        valid = np.zeros(self.max_instances, bool)
        k = 0
        kept_names = []
        for j, seg in enumerate(segments):
            if not keep[j]:
                continue
            masks[k] = inst_small[j]
            labels[k] = self.cat_to_contiguous[seg["category_id"]]
            kept_names.append(self.cat_names[seg["category_id"]])
            valid[k] = True
            k += 1
        item = {
            "image": image, "labels": labels, "masks": masks, "valid": valid,
            "height": meta["height"], "width": meta["width"],
        }
        if self.sampler is not None:
            from .step1 import spatial_prompt_arrays

            item["spatial_query"] = self.sampler(masks[:k].astype(bool))
            item.update(spatial_prompt_arrays(
                self.sampler, masks[:k], self.mask_stride, rs
            ))
        if self.step1 is not None:
            caps = self.captions.get(int(ann["image_id"]))
            caption = caps[rs.randint(len(caps))] if caps else None
            if mode == "class":
                grd_keep = keep
            else:
                grd_keep = grd_small.sum((-2, -1)) > 0 if len(grd_small) else (
                    np.zeros(0, bool)
                )
            g_texts = [t for t, kk in zip(grd_texts, grd_keep) if kk]
            g_masks = grd_small[grd_keep] if len(grd_small) else grd_small
            item.update(
                self.step1(caption, g_texts, g_masks, mode=mode, rs=rs)
            )
        return item


def _downsample_masks(masks: np.ndarray, long_side: int, ms: int) -> np.ndarray:
    """Resize-longest + pad each bool mask to (ms, ms) by nearest gather."""
    if not len(masks):
        return np.zeros((0, ms, ms), np.float32)
    h, w = masks.shape[1:]
    scale = long_side / max(h, w)
    nh = min(ms, max(1, int(h * scale / (long_side / ms) + 0.5)))
    nw = min(ms, max(1, int(w * scale / (long_side / ms) + 0.5)))
    sy = np.clip((np.arange(nh) * h / nh).astype(int), 0, h - 1)
    sx = np.clip((np.arange(nw) * w / nw).astype(int), 0, w - 1)
    out = np.zeros((len(masks), ms, ms), np.float32)
    out[:, :nh, :nw] = masks[:, sy][:, :, sx]
    return out


@register_dataset("coco_2017_train_panoptic")
def _build_coco_train(cfg, split):
    root = dataset_root()
    if root is None:
        raise FileNotFoundError(
            "$DATASET not set; COCO unavailable. Use 'synthetic_seg' or set "
            "DATASET to a root containing coco/ (reference layout)."
        )
    return CocoPanopticDataset(
        root, "train2017",
        image_size=cfg.get("IMAGE_SIZE", 1024),
        max_instances=cfg.get("MAX_INSTANCES", 100),
        train=True,
        lsj=cfg.get("LSJ", True),
        step1=cfg.get("STEP1", True),
        text_len=cfg.get("TEXT_LEN", 24),
    )


@register_dataset("coco_2017_val_panoptic")
def _build_coco_val(cfg, split):
    root = dataset_root()
    if root is None:
        raise FileNotFoundError("$DATASET not set; COCO unavailable.")
    return CocoPanopticDataset(
        root, "val2017", image_size=cfg.get("IMAGE_SIZE", 1024), train=False
    )


# --------------------------------------------------------------------- #
# Loaders
# --------------------------------------------------------------------- #
def build_dataset(name: str, cfg: dict | None = None, split: str = "train"):
    """Fuzzy-resolves reference dataset names onto registered builders (e.g.
    'coco_2017_train_panoptic_filtall_with_sem_seg_caption_grounding' ->
    'coco_2017_train_panoptic', 'refcocog_val_umd' -> 'refcocog_val',
    'pascalvoc_val_Point' -> 'pascalvoc_val'), so the reference's config
    DATASETS lists work verbatim. The full requested name is passed through
    cfg['_REQUESTED_NAME'] for builders that parse name suffixes (the VOC
    interactive prompt mode)."""
    for key, builder in DATASET_REGISTRY.items():
        if name.startswith(key) or key in name:
            cfg = dict(cfg or {})
            cfg.setdefault("_REQUESTED_NAME", name)
            return builder(cfg, split)
    raise KeyError(f"dataset {name!r} not registered; have {list(DATASET_REGISTRY)}")


def batched_iterator(
    dataset, batch_size: int, shuffle: bool = True, seed: int = 0,
    drop_last: bool = True, epochs: int | None = None,
) -> Iterator[dict]:
    """Dense-collated epoch iterator (host-side)."""
    if drop_last and batch_size > len(dataset):
        raise ValueError(
            f"batch_size {batch_size} > dataset length {len(dataset)} with "
            "drop_last: every epoch would yield zero batches (with "
            "epochs=None the consumer loop would spin forever)"
        )
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
