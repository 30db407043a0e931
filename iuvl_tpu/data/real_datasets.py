"""Real-data loaders: pyarrow VLP pretrain files, instruction/VQA json,
and the remaining eval registrations (imagenet / scannet / sunrgbd / bdd /
ADE panoptic).

Parity targets (all under /root/reference/datasets/registration/):
- register_vlp_datasets.py:40-134 — arrow files with columns
  (image: binary jpeg, caption: list<str>, image_id) under
  $DATASET2/pretrain_arrows_code224 (falls back to $DATASET);
- register_instruction_datasets.py / register_instp_datasets.py — the
  instruction stream (here: LLaVA-style conversation json, plus the same
  arrow reader when a 'questions' column exists);
- register_vqa_datasets.py — VQAv2 questions/annotations json;
- register_imagenet_cls.py:30-40 — $DATASET/imagenet/val/n*/*.JPEG;
- register_scannet_semseg.py:38-50 — meta/{split}.txt listing color images,
  labels by folder-name substitution;
- register_sunrgbd_semseg.py:34-35 — image/{split}/*.jpg + label37/{split}/*.png;
- register_bdd100k_semseg.py:30-34 — images/10k/{split}/*.jpg +
  labels/sem_seg/masks/{split}/*.png;
- register_ade20k_panoptic.py — ade20k panoptic json + pngs (COCO format).

Every loader emits the same dense static-shape contract as the synthetic
stand-ins, so swapping $DATASET in is config-only.
"""

from __future__ import annotations

import glob
import json
import logging
import os
from typing import Any

import numpy as np

logger = logging.getLogger(__name__)

from .datasets import CocoPanopticDataset, dataset_root, register_dataset
from .tokenizer import CONTEXT_LEN, build_tokenizer
from .transforms import pad_to_square, resize_longest_side


def _load_image(path: str, image_size: int) -> np.ndarray:
    from PIL import Image

    img = np.asarray(Image.open(path).convert("RGB"))
    return pad_to_square(
        resize_longest_side(img, image_size), image_size
    ).astype(np.float32)


# --------------------------------------------------------------------- #
# VLP pretrain arrows
# --------------------------------------------------------------------- #
class ArrowVlpDataset:
    """pyarrow RecordBatchFile VLP reader (reference load_pretrain_arrows /
    vlp_dataset_mapper.get_image: images stored as jpeg bytes, captions as
    list<str>). Train mode flattens to one (image, caption) pair per
    caption; val keeps the caption list for retrieval/captioning eval.

    ``files``: explicit arrow basenames for this split (the reference binds
    a fixed file list per registered name, register_vlp_datasets.py:21-27 —
    e.g. vlp_val reads only coco_caption_karpathy_test.arrow). Missing named
    files are skipped; if none exist, falls back to every *.arrow in the dir
    with a warning (so partial layouts keep working)."""

    def __init__(self, arrow_dir: str, image_size=1024, split="train",
                 tokenizer=None, context_len=CONTEXT_LEN,
                 files: list[str] | None = None):
        import pyarrow as pa

        self.image_size = image_size
        self.split = split
        self.tokenizer = tokenizer or build_tokenizer()
        self.context_len = context_len
        paths = []
        if files:
            paths = [
                p for p in (os.path.join(arrow_dir, f) for f in files)
                if os.path.exists(p)
            ]
            if not paths:
                logger.warning(
                    "none of the named arrow files %s exist under %s; "
                    "falling back to all *.arrow", files, arrow_dir,
                )
        if not paths:
            paths = sorted(glob.glob(os.path.join(arrow_dir, "*.arrow")))
        if not paths:
            raise FileNotFoundError(f"no .arrow files under {arrow_dir}")
        self.tables = [
            pa.ipc.RecordBatchFileReader(pa.memory_map(p, "r")).read_all()
            for p in paths
        ]
        self.index: list[tuple[int, int, int]] = []  # (table, row, caption)
        for t_id, tbl in enumerate(self.tables):
            for row in range(len(tbl)):
                caps = tbl["caption"][row].as_py()
                if split == "train":
                    for c_id in range(len(caps)):
                        self.index.append((t_id, row, c_id))
                else:
                    self.index.append((t_id, row, -1))

    def __len__(self):
        return len(self.index)

    def __getitem__(self, i: int) -> dict[str, Any]:
        import io

        from PIL import Image

        t_id, row, c_id = self.index[i]
        tbl = self.tables[t_id]
        img_bytes = tbl["image"][row].as_py()
        img = np.asarray(Image.open(io.BytesIO(img_bytes)).convert("RGB"))
        image = pad_to_square(
            resize_longest_side(img, self.image_size), self.image_size
        ).astype(np.float32)
        caps = tbl["caption"][row].as_py()
        caption = caps[c_id] if c_id >= 0 else caps[0]
        toks = self.tokenizer([caption], max_length=self.context_len)
        return {
            "image": image,
            "caption": caption,
            "captions": caps,
            "caption_ids": toks["input_ids"][0],
            "caption_mask": toks["attention_mask"][0],
        }


def _arrow_dir() -> str | None:
    for env in ("DATASET2", "DATASET"):
        root = os.environ.get(env)
        if root:
            d = os.path.join(root, "pretrain_arrows_code224")
            if os.path.isdir(d):
                return d
    return None


# Re-register vlp_train with the real arrow path taking precedence.
from .datasets import DATASET_REGISTRY  # noqa: E402


# Per-name arrow file lists (reference register_{vlp,instruction,instp}_
# datasets.py _PREDEFINED_SPLITS_PRETRAIN): each registered name reads a
# FIXED set of arrows — vlp_train must not sweep up the val/test arrows and
# vice versa.
VLP_ARROW_FILES: dict[str, list[str]] = {
    "vlp_train": (
        ["filtrefval2017_coco_caption_karpathy_restval.arrow",
         "filtrefval2017_coco_caption_karpathy_train.arrow",
         "filtrefval2017_coco_caption_karpathy_val.arrow",
         "code224_vg.arrow"]
        + [f"code224_sbu_{i}.arrow" for i in range(9)]
        + [f"code224_conceptual_caption_train_{i}.arrow" for i in range(30)]
    ),
    "vlp_val": ["coco_caption_karpathy_test.arrow"],
    "vlp_captioning_val": ["coco_caption_karpathy_test.arrow"],
    "vlp_val2017": ["coco_caption_karpathy_val2017.arrow"],
    "vlp_captioning_val2017": ["coco_caption_karpathy_val2017.arrow"],
    "instruction_val": ["coco_caption_karpathy_test.arrow"],
    "instruction_captioning_val": ["coco_caption_karpathy_test.arrow"],
    "instruction_val2017": ["coco_caption_karpathy_val2017.arrow"],
    "instruction_captioning_val2017": ["coco_caption_karpathy_val2017.arrow"],
    "instp_val": ["coco_caption_karpathy_test.arrow"],
    "instp_captioning_val": ["coco_caption_karpathy_test.arrow"],
    "instp_val2017": ["coco_caption_karpathy_val2017.arrow"],
    "instp_captioning_val2017": ["coco_caption_karpathy_val2017.arrow"],
}


def _build_vlp_real_or_synthetic(cfg, split):
    d = _arrow_dir()
    if d is not None:
        name = cfg.get("_REQUESTED_NAME", "")
        # Longest key first: 'vlp_val2017' must not resolve to 'vlp_val'.
        files = next(
            (v for k, v in sorted(
                VLP_ARROW_FILES.items(), key=lambda kv: -len(kv[0])
            ) if name.startswith(k)),
            None,
        )
        return ArrowVlpDataset(
            d, image_size=cfg.get("IMAGE_SIZE", 1024),
            split="train" if name.endswith("_train") or split == "train"
            else "val",
            context_len=cfg.get("CONTEXT_LEN", CONTEXT_LEN), files=files,
        )
    from .vlp_datasets import SyntheticVlpDataset

    return SyntheticVlpDataset(
        image_size=cfg.get("IMAGE_SIZE", 1024), length=cfg.get("LENGTH", 64)
    )


DATASET_REGISTRY["vlp_train"] = _build_vlp_real_or_synthetic
DATASET_REGISTRY["vlp_val"] = _build_vlp_real_or_synthetic
# Retrieval/captioning eval variants over the karpathy-split arrows
# (reference registers all of these; the *captioning* names dispatch to the
# captioning evaluator via hook_switcher, the rest to retrieval).
for _n in ("vlp_captioning_val", "vlp_val2017", "vlp_captioning_val2017",
           "instruction_val", "instruction_captioning_val",
           "instruction_val2017", "instruction_captioning_val2017",
           "instp_val", "instp_captioning_val", "instp_val2017",
           "instp_captioning_val2017"):
    DATASET_REGISTRY[_n] = _build_vlp_real_or_synthetic


# --------------------------------------------------------------------- #
# Instruction json (LLaVA-style conversations)
# --------------------------------------------------------------------- #
class InstructionJsonDataset:
    """LLaVA-format json: [{"image": path, "conversations": [{"from":
    "human"|"gpt", "value": ...}]}] -> (input_ids, masked labels) with one
    <image> slot (reference instruction_dataset_mapper.preprocess_v1
    label-masking semantics, :165-293)."""

    def __init__(self, json_path: str, image_root: str, image_size=1024,
                 max_len=256, tokenizer=None, vocab_size=None,
                 context_len=CONTEXT_LEN):
        with open(json_path) as f:
            self.records = json.load(f)
        self.image_root = image_root
        self.image_size = image_size
        self.max_len = max_len
        self.vocab_size = vocab_size
        self.context_len = context_len
        self.tokenizer = tokenizer or build_tokenizer()

    def __len__(self):
        return len(self.records)

    def __getitem__(self, i: int) -> dict[str, Any]:
        from ..models.llm.conversation import default_conversation
        from ..models.llm.multimodal import (
            IGNORE_INDEX, IMAGE_TOKEN_INDEX, tokenizer_image_token,
        )

        rec = self.records[i]
        image = _load_image(
            os.path.join(self.image_root, rec["image"]), self.image_size
        )
        conv = default_conversation()
        roles = {"human": conv.roles[0], "gpt": conv.roles[1]}
        question = ""
        source = rec["conversations"]
        if roles.get(source[0]["from"]) != conv.roles[0]:
            source = source[1:]
        for j, turn in enumerate(source):
            conv.append_message(roles[turn["from"]], turn["value"])
            if j == 0:
                question = turn["value"].replace("<image>", "").strip()
        prompt = conv.get_prompt()
        ids = tokenizer_image_token(prompt, self.tokenizer)

        # Label masking: supervise only assistant turns (preprocess_v1);
        # assistant spans are located by sub-sequence match of their ids.
        cursor = 0
        masked = [IGNORE_INDEX] * len(ids)
        for j in range(1, len(source), 2):
            ans_ids = self.tokenizer.encode_text(source[j]["value"])
            # find the answer ids as a sublist after cursor
            for s in range(cursor, len(ids) - len(ans_ids) + 1):
                if ids[s : s + len(ans_ids)] == ans_ids:
                    masked[s : s + len(ans_ids)] = ans_ids
                    cursor = s + len(ans_ids)
                    break
        ids = np.asarray(ids[: self.max_len], np.int32)
        labels = np.asarray(masked[: self.max_len], np.int32)
        if self.vocab_size:
            keep = ids == IMAGE_TOKEN_INDEX
            ids = np.where(keep, ids, ids % self.vocab_size)
            labels = np.where(labels == IGNORE_INDEX, labels,
                              labels % self.vocab_size)
        qt = self.tokenizer([question or " "], max_length=self.context_len)
        return {
            "image": image, "input_ids": ids, "labels": labels,
            "clip_ids": qt["input_ids"][0], "clip_mask": qt["attention_mask"][0],
        }


def _build_instruction_real_or_synthetic(cfg, split):
    root = dataset_root()
    json_path = cfg.get("JSON") or (
        os.path.join(root, "llava", "llava_instruct_150k.json") if root else None
    )
    if json_path and os.path.exists(json_path):
        return InstructionJsonDataset(
            json_path,
            image_root=cfg.get("IMAGE_ROOT", os.path.join(root, "coco", "train2017")),
            image_size=cfg.get("IMAGE_SIZE", 1024),
            max_len=cfg.get("MAX_LEN", 256),
            vocab_size=cfg.get("VOCAB_SIZE"),
            context_len=cfg.get("CONTEXT_LEN", CONTEXT_LEN),
        )
    from .vlp_datasets import SyntheticInstructionDataset

    return SyntheticInstructionDataset(
        image_size=cfg.get("IMAGE_SIZE", 1024), length=cfg.get("LENGTH", 32),
        max_len=cfg.get("MAX_LEN", 256), vocab_size=cfg.get("VOCAB_SIZE"),
        context_len=cfg.get("CONTEXT_LEN", CONTEXT_LEN),
    )


DATASET_REGISTRY["instruction_train"] = _build_instruction_real_or_synthetic
DATASET_REGISTRY["instp_train"] = _build_instruction_real_or_synthetic


# --------------------------------------------------------------------- #
# VQAv2 json
# --------------------------------------------------------------------- #
class VqaJsonDataset:
    """VQAv2 format: questions json (+ optional annotations json with 10
    gt answers each) — reference register_vqa_datasets.py + vqa eval."""

    def __init__(self, questions_json: str, image_root: str,
                 annotations_json: str | None = None, image_size=1024,
                 image_pattern="COCO_val2014_{:012d}.jpg"):
        with open(questions_json) as f:
            self.questions = json.load(f)["questions"]
        self.answers = {}
        if annotations_json and os.path.exists(annotations_json):
            with open(annotations_json) as f:
                for a in json.load(f)["annotations"]:
                    self.answers[a["question_id"]] = [
                        x["answer"] for x in a["answers"]
                    ]
        self.image_root = image_root
        self.image_size = image_size
        self.image_pattern = image_pattern

    def __len__(self):
        return len(self.questions)

    def __getitem__(self, i: int) -> dict[str, Any]:
        q = self.questions[i]
        path = os.path.join(
            self.image_root, self.image_pattern.format(q["image_id"])
        )
        return {
            "image": _load_image(path, self.image_size),
            "question": q["question"],
            "question_id": q["question_id"],
            "answers": self.answers.get(q["question_id"], []),
        }


@register_dataset("vqav2_val")
def _build_vqa(cfg, split):
    root = dataset_root()
    if root is None:
        raise FileNotFoundError("$DATASET not set; VQAv2 unavailable.")
    return VqaJsonDataset(
        cfg.get("QUESTIONS", os.path.join(
            root, "vqa", "v2_OpenEnded_mscoco_val2014_questions.json")),
        image_root=cfg.get("IMAGE_ROOT", os.path.join(root, "coco", "val2014")),
        annotations_json=cfg.get("ANNOTATIONS", os.path.join(
            root, "vqa", "v2_mscoco_val2014_annotations.json")),
        image_size=cfg.get("IMAGE_SIZE", 1024),
    )


# --------------------------------------------------------------------- #
# Semantic-segmentation folder datasets (scannet / sunrgbd / bdd)
# --------------------------------------------------------------------- #
class SemSegFolderDataset:
    """Generic (image, label-png) pair loader with the ADE eval contract:
    padded input image + ORIGINAL-size gt sem_seg. ``loader_type`` mirrors
    the reference's semseg_loader.load_semseg (datasets/semseg_loader.py:5-9):
    'PIL' for png/tif label images, 'MAT' for MATLAB files with a LabelMap
    variable."""

    def __init__(self, img_paths: list[str], ann_paths: list[str],
                 image_size=1024, label_shift=0, ignore_label=255,
                 loader_type="PIL"):
        assert len(img_paths) == len(ann_paths) and img_paths, (
            f"{len(img_paths)} images vs {len(ann_paths)} labels"
        )
        self.img_paths = img_paths
        self.ann_paths = ann_paths
        self.image_size = image_size
        self.label_shift = label_shift
        self.ignore_label = ignore_label
        self.loader_type = loader_type

    def __len__(self):
        return len(self.img_paths)

    def _load_semseg(self, path: str) -> np.ndarray:
        if self.loader_type == "MAT":
            import scipy.io

            return np.asarray(scipy.io.loadmat(path)["LabelMap"], np.int32)
        from PIL import Image

        return np.asarray(Image.open(path), np.int32)

    def __getitem__(self, i: int) -> dict[str, Any]:
        from PIL import Image

        sem = self._load_semseg(self.ann_paths[i])
        if self.label_shift:
            sem = np.where(
                sem == 0, self.ignore_label, sem - self.label_shift
            )
        img = np.asarray(Image.open(self.img_paths[i]).convert("RGB"))
        h, w = img.shape[:2]
        return {
            "image": pad_to_square(
                resize_longest_side(img, self.image_size), self.image_size
            ).astype(np.float32),
            "sem_seg": sem, "height": h, "width": w,
        }


@register_dataset("sunrgbd_37_val_seg")
def _build_sunrgbd(cfg, split):
    root = dataset_root()
    if root is None:
        raise FileNotFoundError("$DATASET not set; SUN-RGBD unavailable.")
    base = os.path.join(root, "sun_rgbd")
    return SemSegFolderDataset(
        sorted(glob.glob(os.path.join(base, "image", "val", "*.jpg"))),
        sorted(glob.glob(os.path.join(base, "label37", "val", "*.png"))),
        image_size=cfg.get("IMAGE_SIZE", 1024), label_shift=1,
    )


@register_dataset("bdd10k_val_sem_seg")
def _build_bdd(cfg, split):
    root = dataset_root()
    if root is None:
        raise FileNotFoundError("$DATASET not set; BDD unavailable.")
    base = os.path.join(root, "bdd100k")
    return SemSegFolderDataset(
        sorted(glob.glob(os.path.join(base, "images", "10k", "val", "*.jpg"))),
        sorted(glob.glob(
            os.path.join(base, "labels", "sem_seg", "masks", "val", "*.png")
        )),
        image_size=cfg.get("IMAGE_SIZE", 1024), label_shift=0,
    )


@register_dataset("scannet_21_val_seg")
def _build_scannet(cfg, split):
    root = dataset_root()
    if root is None:
        raise FileNotFoundError("$DATASET not set; ScanNet unavailable.")
    base = os.path.join(root, "scannet")
    meta = os.path.join(base, "meta", "val.txt")
    with open(meta) as f:
        fields = [line.split() for line in f if line.strip()]
    imgs = [os.path.join(base, "images", fd[0]) for fd in fields]
    anns = [
        p.replace("color", "label20").replace(".jpg", ".png") for p in imgs
    ]
    return SemSegFolderDataset(
        imgs, anns, image_size=cfg.get("IMAGE_SIZE", 1024), label_shift=1
    )


# --------------------------------------------------------------------- #
# ImageNet classification
# --------------------------------------------------------------------- #
class ImagenetFolderDataset:
    """$DATASET/imagenet/val/n*/*.JPEG (reference register_imagenet_cls.py:
    30-40): folder order defines the label index."""

    def __init__(self, base: str, image_size=224):
        self.image_size = image_size
        folders = sorted(glob.glob(os.path.join(base, "val", "n*")))
        if not folders:
            raise FileNotFoundError(f"no imagenet class folders under {base}")
        self.samples = []
        for label, folder in enumerate(folders):
            for p in sorted(glob.glob(os.path.join(folder, "*.JPEG"))):
                self.samples.append((p, label))

    def __len__(self):
        return len(self.samples)

    def __getitem__(self, i: int) -> dict[str, Any]:
        path, label = self.samples[i]
        return {"image": _load_image(path, self.image_size), "label": label}


@register_dataset("imagenet_val")
def _build_imagenet(cfg, split):
    root = dataset_root()
    if root is None:
        raise FileNotFoundError("$DATASET not set; ImageNet unavailable.")
    return ImagenetFolderDataset(
        os.path.join(root, "imagenet"), image_size=cfg.get("IMAGE_SIZE", 224)
    )


# --------------------------------------------------------------------- #
# ADE20K panoptic / instance (COCO-format panoptic json)
# --------------------------------------------------------------------- #
class AdePanopticDataset(CocoPanopticDataset):
    """ADE20K panoptic layout (reference register_ade20k_panoptic.py):
    ADEChallengeData2016/ade20k_panoptic_{split}.json + pngs; reuses the
    COCO panoptic decode with ADE paths."""

    def __init__(self, root: str, split="val", image_size=1024,
                 max_instances=100, train=False):
        base = os.path.join(root, "ADEChallengeData2016")
        with open(os.path.join(base, f"ade20k_panoptic_{split}.json")) as f:
            data = json.load(f)
        self.root = root
        self.base = base
        self.split = split
        self.image_size = image_size
        self.max_instances = max_instances
        self.mask_stride = 4
        self.train = train
        self.lsj = False
        self.seed = 0
        self.annotations = data["annotations"]
        self.images = {im["id"]: im for im in data["images"]}
        cats = sorted(data["categories"], key=lambda c: c["id"])
        self.cat_to_contiguous = {c["id"]: i for i, c in enumerate(cats)}
        self.cat_names = {c["id"]: c["name"] for c in cats}
        self.captions, self.grounding = {}, {}
        self.step1 = None
        self.sampler = None

    def __getitem__(self, i: int) -> dict:
        from PIL import Image

        ann = self.annotations[i]
        meta = self.images[ann["image_id"]]
        img_path = os.path.join(
            self.base, "images",
            "validation" if self.split == "val" else "training",
            meta["file_name"].replace(".png", ".jpg"),
        )
        pan_path = os.path.join(
            self.base, f"ade20k_panoptic_{self.split}", ann["file_name"]
        )
        image = np.asarray(Image.open(img_path).convert("RGB"))
        pan = np.asarray(Image.open(pan_path), np.uint32)
        seg_id = pan[..., 0] + 256 * pan[..., 1] + 256 * 256 * pan[..., 2]
        h, w = image.shape[:2]
        from .datasets import _downsample_masks

        s_ = self.image_size
        ms = s_ // self.mask_stride
        segments = [x for x in ann["segments_info"]][: self.max_instances]
        inst = np.stack(
            [seg_id == x["id"] for x in segments]
        ) if segments else np.zeros((0, h, w), bool)
        small = _downsample_masks(inst, s_, ms)
        labels = np.zeros(self.max_instances, np.int32)
        masks = np.zeros((self.max_instances, ms, ms), np.float32)
        valid = np.zeros(self.max_instances, bool)
        for k, seg in enumerate(segments):
            masks[k] = small[k]
            labels[k] = self.cat_to_contiguous[seg["category_id"]]
            valid[k] = small[k].sum() > 0
        return {
            "image": pad_to_square(
                resize_longest_side(image, s_), s_
            ).astype(np.float32),
            "labels": labels, "masks": masks, "valid": valid,
            "height": h, "width": w,
        }


@register_dataset("ade20k_panoptic_eval")
@register_dataset("ade20k_instance_val")
def _build_ade_panoptic(cfg, split):
    root = dataset_root()
    if root is None:
        raise FileNotFoundError("$DATASET not set; ADE panoptic unavailable.")
    return AdePanopticDataset(root, image_size=cfg.get("IMAGE_SIZE", 1024))


# --------------------------------------------------------------------- #
# ADE20K-full (847) / COCO-Stuff-10k semantic folders
# --------------------------------------------------------------------- #
@register_dataset("ade20k_full_sem_seg_val")
def _build_ade_full(cfg, split):
    """$DATASET/ADE20K_2021_17_01/{images,annotations}_detectron2/validation
    (reference register_ade20k_full.py:944-957): jpg images + tif labels
    storing trainIds 0..846 with 65535 = ignore."""
    root = dataset_root()
    if root is None:
        raise FileNotFoundError("$DATASET not set; ADE20K-full unavailable.")
    base = os.path.join(root, "ADE20K_2021_17_01")
    return SemSegFolderDataset(
        sorted(glob.glob(
            os.path.join(base, "images_detectron2", "validation", "*.jpg"))),
        sorted(glob.glob(
            os.path.join(base, "annotations_detectron2", "validation",
                         "*.tif"))),
        image_size=cfg.get("IMAGE_SIZE", 1024), label_shift=0,
        ignore_label=65535,
    )


def _build_coco_stuff_10k(cfg, split, folder="test"):
    """$DATASET/coco/coco_stuff_10k/{images,annotations}_detectron2/{split}
    (reference register_coco_stuff_10k.py:200-219): 171-class semseg with
    contiguous train ids in the prepared pngs, 255 = ignore."""
    root = dataset_root()
    if root is None:
        raise FileNotFoundError("$DATASET not set; COCO-Stuff unavailable.")
    base = os.path.join(root, "coco", "coco_stuff_10k")
    d = folder
    return SemSegFolderDataset(
        sorted(glob.glob(
            os.path.join(base, "images_detectron2", d, "*.jpg"))),
        sorted(glob.glob(
            os.path.join(base, "annotations_detectron2", d, "*.png"))),
        image_size=cfg.get("IMAGE_SIZE", 1024), label_shift=0,
    )


DATASET_REGISTRY["coco_2017_test_stuff_10k_sem_seg"] = (
    lambda cfg, split: _build_coco_stuff_10k(cfg, split, folder="test")
)
DATASET_REGISTRY["coco_2017_train_stuff_10k_sem_seg"] = (
    lambda cfg, split: _build_coco_stuff_10k(cfg, split, folder="train")
)


# --------------------------------------------------------------------- #
# ScanNet / BDD100k panoptic (COCO-format panoptic json)
# --------------------------------------------------------------------- #
class PanopticJsonDataset:
    """COCO-format panoptic json + png dir with a dataset-specific image
    path resolver and dataset-id -> contiguous category map. Emits the
    dense eval contract of CocoPanopticDataset (padded image + stride-4
    instance masks + labels/valid + original size)."""

    def __init__(self, json_path: str, pano_dir: str, image_path_fn,
                 id_to_contiguous: dict[int, int], image_size=1024,
                 max_instances=100):
        with open(json_path) as f:
            data = json.load(f)
        self.pano_dir = pano_dir
        self.image_path_fn = image_path_fn
        self.id_to_contiguous = dict(id_to_contiguous)
        self.image_size = image_size
        self.max_instances = max_instances
        self.mask_stride = 4
        self.annotations = data["annotations"]
        self.images = {im["id"]: im for im in data["images"]}

    def __len__(self):
        return len(self.annotations)

    def __getitem__(self, i: int) -> dict[str, Any]:
        from PIL import Image

        from .datasets import _downsample_masks

        ann = self.annotations[i]
        img_path = self.image_path_fn(ann, self.images.get(ann["image_id"]))
        pan_path = os.path.join(self.pano_dir, ann["file_name"])
        image = np.asarray(Image.open(img_path).convert("RGB"))
        pan = np.asarray(Image.open(pan_path), np.uint32)
        seg_id = pan[..., 0] + 256 * pan[..., 1] + 256 * 256 * pan[..., 2]
        h, w = image.shape[:2]
        s_ = self.image_size
        ms = s_ // self.mask_stride
        segments = [
            x for x in ann["segments_info"]
            if x["category_id"] in self.id_to_contiguous
        ][: self.max_instances]
        inst = np.stack(
            [seg_id == x["id"] for x in segments]
        ) if segments else np.zeros((0, h, w), bool)
        small = _downsample_masks(inst, s_, ms)
        labels = np.zeros(self.max_instances, np.int32)
        masks = np.zeros((self.max_instances, ms, ms), np.float32)
        valid = np.zeros(self.max_instances, bool)
        for k, seg in enumerate(segments):
            masks[k] = small[k]
            labels[k] = self.id_to_contiguous[seg["category_id"]]
            valid[k] = small[k].sum() > 0
        return {
            "image": pad_to_square(
                resize_longest_side(image, s_), s_
            ).astype(np.float32),
            "labels": labels, "masks": masks, "valid": valid,
            "height": h, "width": w,
        }


@register_dataset("scannet_21_panoptic_val")
def _build_scannet_panoptic(cfg, split):
    """$DATASET/scannet_frames_25k/{images,scannet_panoptic{,.json}}
    (reference register_scannet_panoptic.py:134-140): annotation file names
    are '<scene>__<frame>.png'; the image lives at
    images/<scene>/color/<frame>.jpg."""
    from .class_names_ext import SCANNET_PANO_ID_TO_CONTIGUOUS

    root = dataset_root()
    if root is None:
        raise FileNotFoundError("$DATASET not set; ScanNet pano unavailable.")
    base = os.path.join(root, "scannet_frames_25k")

    def image_path(ann, meta):
        folder, file_name = ann["file_name"].split("__")
        return os.path.join(
            base, "images", folder, "color", file_name.replace("png", "jpg")
        )

    return PanopticJsonDataset(
        os.path.join(base, "scannet_panoptic.json"),
        os.path.join(base, "scannet_panoptic"),
        image_path, SCANNET_PANO_ID_TO_CONTIGUOUS,
        image_size=cfg.get("IMAGE_SIZE", 1024),
    )


@register_dataset("bdd10k_40_panoptic_val")
def _build_bdd_panoptic(cfg, split):
    """$DATASET/bdd100k/labels/pan_seg/{coco_pano/val, meta/coco_val.json}
    + images/10k/val (reference register_bdd100k_panoseg.py:206-212)."""
    from .class_names_ext import BDD_PANO_ID_TO_CONTIGUOUS

    root = dataset_root()
    if root is None:
        raise FileNotFoundError("$DATASET not set; BDD pano unavailable.")
    base = os.path.join(root, "bdd100k")

    def image_path(ann, meta):
        file_name = (meta or {}).get("file_name", ann["file_name"])
        return os.path.join(
            base, "images", "10k", "val", file_name.replace("png", "jpg")
        )

    return PanopticJsonDataset(
        os.path.join(base, "labels", "pan_seg", "meta", "coco_val.json"),
        os.path.join(base, "labels", "pan_seg", "coco_pano", "val"),
        image_path, BDD_PANO_ID_TO_CONTIGUOUS,
        image_size=cfg.get("IMAGE_SIZE", 1024),
    )
