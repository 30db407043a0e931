"""Dataset class-name catalogs.

Role of /root/reference/utils/constants.py + modeling/utils/misc.py
get_class_names (:178-216): per-dataset class lists with a trailing
"background" entry used as the no-object text embedding. The lists are the
standard public label sets (COCO panoptic 133, ADE20K-150, PASCAL VOC 20).
"""

from __future__ import annotations

COCO_PANOPTIC_THINGS = [
    "person", "bicycle", "car", "motorcycle", "airplane", "bus", "train",
    "truck", "boat", "traffic light", "fire hydrant", "stop sign",
    "parking meter", "bench", "bird", "cat", "dog", "horse", "sheep", "cow",
    "elephant", "bear", "zebra", "giraffe", "backpack", "umbrella", "handbag",
    "tie", "suitcase", "frisbee", "skis", "snowboard", "sports ball", "kite",
    "baseball bat", "baseball glove", "skateboard", "surfboard",
    "tennis racket", "bottle", "wine glass", "cup", "fork", "knife", "spoon",
    "bowl", "banana", "apple", "sandwich", "orange", "broccoli", "carrot",
    "hot dog", "pizza", "donut", "cake", "chair", "couch", "potted plant",
    "bed", "dining table", "toilet", "tv", "laptop", "mouse", "remote",
    "keyboard", "cell phone", "microwave", "oven", "toaster", "sink",
    "refrigerator", "book", "clock", "vase", "scissors", "teddy bear",
    "hair drier", "toothbrush",
]

COCO_PANOPTIC_STUFF = [
    "banner", "blanket", "bridge", "cardboard", "counter", "curtain",
    "door-stuff", "floor-wood", "flower", "fruit", "gravel", "house",
    "light", "mirror-stuff", "net", "pillow", "platform", "playingfield",
    "railroad", "river", "road", "roof", "sand", "sea", "shelf", "snow",
    "stairs", "tent", "towel", "wall-brick", "wall-stone", "wall-tile",
    "wall-wood", "water-other", "window-blind", "window-other",
    "tree-merged", "fence-merged", "ceiling-merged", "sky-other-merged",
    "cabinet-merged", "table-merged", "floor-other-merged",
    "pavement-merged", "mountain-merged", "grass-merged", "dirt-merged",
    "paper-merged", "food-other-merged", "building-other-merged",
    "rock-merged", "wall-other-merged", "rug-merged",
]

COCO_PANOPTIC_CLASSES = COCO_PANOPTIC_THINGS + COCO_PANOPTIC_STUFF  # 133
COCO_THING_IDS = set(range(len(COCO_PANOPTIC_THINGS)))  # contiguous 0..79

ADE150_CLASSES = [
    "wall", "building", "sky", "floor", "tree", "ceiling", "road", "bed",
    "windowpane", "grass", "cabinet", "sidewalk", "person", "earth", "door",
    "table", "mountain", "plant", "curtain", "chair", "car", "water",
    "painting", "sofa", "shelf", "house", "sea", "mirror", "rug", "field",
    "armchair", "seat", "fence", "desk", "rock", "wardrobe", "lamp",
    "bathtub", "railing", "cushion", "base", "box", "column", "signboard",
    "chest of drawers", "counter", "sand", "sink", "skyscraper",
    "fireplace", "refrigerator", "grandstand", "path", "stairs", "runway",
    "case", "pool table", "pillow", "screen door", "stairway", "river",
    "bridge", "bookcase", "blind", "coffee table", "toilet", "flower",
    "book", "hill", "bench", "countertop", "stove", "palm",
    "kitchen island", "computer", "swivel chair", "boat", "bar",
    "arcade machine", "hovel", "bus", "towel", "light", "truck", "tower",
    "chandelier", "awning", "streetlight", "booth", "television receiver",
    "airplane", "dirt track", "apparel", "pole", "land", "bannister",
    "escalator", "ottoman", "bottle", "buffet", "poster", "stage", "van",
    "ship", "fountain", "conveyer belt", "canopy", "washer", "plaything",
    "swimming pool", "stool", "barrel", "basket", "waterfall", "tent",
    "bag", "minibike", "cradle", "oven", "ball", "food", "step", "tank",
    "trade name", "microwave", "pot", "animal", "bicycle", "lake",
    "dishwasher", "screen", "blanket", "sculpture", "hood", "sconce",
    "vase", "traffic light", "tray", "ashcan", "fan", "pier", "crt screen",
    "plate", "monitor", "bulletin board", "shower", "radiator", "glass",
    "clock", "flag",
]

SCANNET_40_CLASSES = [
    "wall", "floor", "cabinet", "bed", "chair", "sofa", "table", "door",
    "window", "bookshelf", "picture", "counter", "blinds", "desk", "shelves",
    "curtain", "dresser", "pillow", "mirror", "floor mat", "clothes",
    "ceiling", "books", "refrigerator", "television", "paper", "towel",
    "shower curtain", "box", "whiteboard", "person", "night stand", "toilet",
    "sink", "lamp", "bathtub", "bag", "otherstructure", "otherfurniture",
    "otherprop",
]
SCANNET_20_CLASSES = [
    "wall", "floor", "cabinet", "bed", "chair", "sofa", "table", "door",
    "window", "bookshelf", "picture", "counter", "desk", "curtain",
    "refrigerator", "shower curtain", "toilet", "sink", "bathtub",
    "otherfurniture",
]
SUN_RGBD_37_CLASSES = SCANNET_40_CLASSES[:37]

CITYSCAPES_19_CLASSES = [
    "road", "sidewalk", "building", "wall", "fence", "pole", "traffic light",
    "traffic sign", "vegetation", "terrain", "sky", "person", "rider", "car",
    "truck", "bus", "train", "motorcycle", "bicycle",
]
BDD_SEM_CLASSES = CITYSCAPES_19_CLASSES

PASCAL_VOC_CLASSES = [
    "aeroplane", "bicycle", "bird", "boat", "bottle", "bus", "car", "cat",
    "chair", "cow", "diningtable", "dog", "horse", "motorbike", "person",
    "pottedplant", "sheep", "sofa", "train", "tvmonitor",
]


def get_class_names(
    dataset_name: str | None, num_classes: int = 10
) -> list[str] | None:
    """Class names + trailing background, keyed by dataset-name substring
    (reference modeling/utils/misc.py:178-216)."""
    if dataset_name is None:
        return None
    n = dataset_name.lower()
    if "synthetic" in n:
        return [f"object {i}" for i in range(num_classes)] + ["background"]
    if "refcoco" in n or "vlp" in n or "instruction" in n or "instp" in n or "vqa" in n:
        return ["background"]
    if "stuff_10k" in n or "stuff10k" in n:
        from .class_names_ext import COCO_STUFF_171_CLASSES

        return COCO_STUFF_171_CLASSES + ["background"]
    if "coco" in n:
        return COCO_PANOPTIC_CLASSES + ["background"]
    if "ade20k_full" in n or "ade847" in n:
        from .class_names_ext import ADE847_CLASSES

        return ADE847_CLASSES + ["background"]
    if "ade" in n:
        return ADE150_CLASSES + ["background"]
    if "bdd10k_40" in n or ("bdd" in n and "panoptic" in n):
        from .class_names_ext import BDD_PANO_40_CLASSES

        return BDD_PANO_40_CLASSES + ["background"]
    if "voc" in n or "pascal" in n:
        return PASCAL_VOC_CLASSES + ["background"]
    if "scannet_41" in n or "scannet_40" in n:
        return SCANNET_40_CLASSES + ["background"]
    if "scannet_21" in n or "scannet_20" in n:
        return SCANNET_20_CLASSES + ["background"]
    if "sun" in n:
        return SUN_RGBD_37_CLASSES + ["background"]
    if "bdd" in n or "cityscapes" in n:
        return BDD_SEM_CLASSES + ["background"]
    if "imagenet" in n:
        return _imagenet_class_names() + ["background"]
    raise ValueError(f"unknown dataset for class names: {dataset_name}")


def _imagenet_class_names() -> list[str]:
    """ImageNet-1k names: $DATASET/imagenet/classnames.txt (one name per
    line, val-folder order) when present, else the sorted synset folder
    ids themselves — zero-shot prompts then carry no semantics, but the
    eval pipeline stays runnable (reference ships the name list in
    utils/constants.py:IMAGENET_CLASSES)."""
    import glob
    import os

    root = os.environ.get("DATASET")
    if root:
        txt = os.path.join(root, "imagenet", "classnames.txt")
        if os.path.exists(txt):
            with open(txt) as f:
                names = [line.strip() for line in f if line.strip()]
            if names:
                return names
        folders = sorted(
            glob.glob(os.path.join(root, "imagenet", "val", "n*"))
        )
        if folders:
            return [os.path.basename(p) for p in folders]
    raise FileNotFoundError(
        "ImageNet class names need $DATASET/imagenet/classnames.txt or "
        "val/n* folders"
    )
