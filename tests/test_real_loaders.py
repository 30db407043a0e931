"""Real-data loader tests on generated tiny fixtures: pyarrow VLP files,
LLaVA instruction json, VQAv2 json, semseg folders (sunrgbd/bdd layouts),
imagenet folders, and the COCO step1 mapper with captions+grounding."""

import json
import os

import numpy as np
import pytest


def _png(path, arr):
    from PIL import Image

    os.makedirs(os.path.dirname(path), exist_ok=True)
    Image.fromarray(arr).save(path)


def _jpg(path, hw=(40, 56)):
    from PIL import Image

    os.makedirs(os.path.dirname(path), exist_ok=True)
    rs = np.random.RandomState(0)
    Image.fromarray((rs.rand(*hw, 3) * 255).astype(np.uint8)).save(path)


def test_arrow_vlp_loader(tmp_path):
    import io

    import pyarrow as pa
    from PIL import Image

    from iuvl_tpu.data.real_datasets import ArrowVlpDataset

    buf = io.BytesIO()
    Image.fromarray(
        (np.random.RandomState(0).rand(30, 40, 3) * 255).astype(np.uint8)
    ).save(buf, format="JPEG")
    tbl = pa.table({
        "image": [buf.getvalue(), buf.getvalue()],
        "caption": [["a dog", "a brown dog"], ["a cat"]],
        "image_id": ["coco_1.jpg", "coco_2.jpg"],
    })
    d = tmp_path / "pretrain_arrows_code224"
    d.mkdir()
    with pa.OSFile(str(d / "f0.arrow"), "wb") as sink:
        with pa.ipc.new_file(sink, tbl.schema) as w:
            w.write_table(tbl)

    ds = ArrowVlpDataset(str(d), image_size=64, split="train")
    assert len(ds) == 3  # flattened per caption
    item = ds[1]
    assert item["image"].shape == (64, 64, 3)
    assert item["caption"] == "a brown dog"
    assert item["caption_ids"].shape[0] == 77

    val = ArrowVlpDataset(str(d), image_size=64, split="val")
    assert len(val) == 2
    assert val[0]["captions"] == ["a dog", "a brown dog"]


def test_instruction_json_loader(tmp_path):
    from iuvl_tpu.data.real_datasets import InstructionJsonDataset
    from iuvl_tpu.models.llm.multimodal import IGNORE_INDEX, IMAGE_TOKEN_INDEX

    _jpg(str(tmp_path / "imgs" / "0001.jpg"))
    recs = [{
        "image": "0001.jpg",
        "conversations": [
            {"from": "human", "value": "<image>\nwhat is shown?"},
            {"from": "gpt", "value": "a small dog"},
        ],
    }]
    jp = tmp_path / "inst.json"
    jp.write_text(json.dumps(recs))
    ds = InstructionJsonDataset(
        str(jp), image_root=str(tmp_path / "imgs"), image_size=64, max_len=64
    )
    item = ds[0]
    assert item["image"].shape == (64, 64, 3)
    ids, labels = item["input_ids"], item["labels"]
    assert (ids == IMAGE_TOKEN_INDEX).sum() == 1
    # some labels supervised (the answer), the rest masked
    assert (labels != IGNORE_INDEX).sum() > 0
    assert (labels == IGNORE_INDEX).sum() > 0


def test_vqa_json_loader(tmp_path):
    from iuvl_tpu.data.real_datasets import VqaJsonDataset

    _jpg(str(tmp_path / "imgs" / "COCO_val2014_000000000007.jpg"))
    qj = tmp_path / "q.json"
    qj.write_text(json.dumps({"questions": [
        {"question_id": 70, "image_id": 7, "question": "what color?"}
    ]}))
    aj = tmp_path / "a.json"
    aj.write_text(json.dumps({"annotations": [
        {"question_id": 70, "answers": [{"answer": "red"}] * 10}
    ]}))
    ds = VqaJsonDataset(str(qj), str(tmp_path / "imgs"), str(aj), image_size=64)
    item = ds[0]
    assert item["question"] == "what color?"
    assert item["answers"] == ["red"] * 10
    assert item["image"].shape == (64, 64, 3)


def test_semseg_folder_layouts(tmp_path, monkeypatch):
    from iuvl_tpu.data.datasets import build_dataset

    # SUN-RGBD layout
    base = tmp_path / "sun_rgbd"
    _jpg(str(base / "image" / "val" / "a.jpg"))
    _png(str(base / "label37" / "val" / "a.png"),
         np.random.RandomState(0).randint(0, 5, (40, 56)).astype(np.uint8))
    # BDD layout
    b2 = tmp_path / "bdd100k"
    _jpg(str(b2 / "images" / "10k" / "val" / "b.jpg"))
    _png(str(b2 / "labels" / "sem_seg" / "masks" / "val" / "b.png"),
         np.random.RandomState(1).randint(0, 5, (40, 56)).astype(np.uint8))
    monkeypatch.setenv("DATASET", str(tmp_path))

    ds = build_dataset("sunrgbd_37_val_seg", {"IMAGE_SIZE": 64}, "val")
    item = ds[0]
    assert item["sem_seg"].shape == (40, 56)
    assert item["image"].shape == (64, 64, 3)

    ds = build_dataset("bdd10k_val_sem_seg", {"IMAGE_SIZE": 64}, "val")
    assert ds[0]["sem_seg"].shape == (40, 56)


def test_imagenet_folder(tmp_path, monkeypatch):
    from iuvl_tpu.data.datasets import build_dataset

    for cls in ("n01440764", "n01443537"):
        _jpg(str(tmp_path / "imagenet" / "val" / cls / "x.JPEG"))
    monkeypatch.setenv("DATASET", str(tmp_path))
    ds = build_dataset("imagenet_val", {"IMAGE_SIZE": 64}, "val")
    assert len(ds) == 2
    assert ds[0]["label"] == 0 and ds[1]["label"] == 1


def _write_coco_fixture(root, with_caption=True, with_grounding=True):
    from PIL import Image

    ann_dir = root / "coco" / "annotations"
    os.makedirs(ann_dir, exist_ok=True)
    h, w = 40, 56
    # panoptic png: segment id 1 in top-left quadrant, 2 bottom-right
    pan = np.zeros((h, w, 3), np.uint8)
    pan[:20, :28, 0] = 1
    pan[20:, 28:, 0] = 2
    _png(str(ann_dir / "panoptic_train2017" / "img0.png"), pan)
    _jpg(str(root / "coco" / "train2017" / "img0.jpg"), (h, w))
    (ann_dir / "panoptic_train2017.json").write_text(json.dumps({
        "annotations": [{
            "image_id": 5, "file_name": "img0.png",
            "segments_info": [
                {"id": 1, "category_id": 10, "iscrowd": 0},
                {"id": 2, "category_id": 20, "iscrowd": 0},
            ],
        }],
        "images": [{"id": 5, "file_name": "img0.jpg",
                    "height": h, "width": w}],
        "categories": [{"id": 10, "name": "dog"}, {"id": 20, "name": "cat"}],
    }))
    if with_caption:
        (ann_dir / "captions_train2017.json").write_text(json.dumps({
            "annotations": [
                {"image_id": 5, "caption": "a dog next to a cat"},
            ]
        }))
    if with_grounding:
        (ann_dir / "grounding_train2017.json").write_text(json.dumps({
            "annotations": [{
                "image_id": 5,
                "segmentation": [[0, 0, 27, 0, 27, 19, 0, 19]],
                "sentences": [{"raw": "the dog on the left"}],
            }]
        }))


def test_coco_step1_mapper_full(tmp_path, monkeypatch):
    from iuvl_tpu.data.datasets import CocoPanopticDataset

    _write_coco_fixture(tmp_path)
    ds = CocoPanopticDataset(
        str(tmp_path), "train2017", image_size=64, max_instances=4,
        train=True, lsj=True, step1=True, text_len=16,
    )
    item = ds[0]
    assert item["image"].shape == (64, 64, 3)
    assert item["valid"].any()
    # captions -> phrases present
    assert item["phrase_valid"].any()
    # grounding json present -> text mode weight 2.0
    assert float(item["grounding_task_weight"]) == 2.0
    assert item["grounding_valid"].any()
    assert item["grounding_masks"].shape == (5, 16, 16)
    assert "points" in item["spatial_query"] or isinstance(
        item["spatial_query"], dict
    )


def test_coco_mapper_degrades_without_caption_files(tmp_path):
    from iuvl_tpu.data.datasets import CocoPanopticDataset

    _write_coco_fixture(tmp_path, with_caption=False, with_grounding=False)
    ds = CocoPanopticDataset(
        str(tmp_path), "train2017", image_size=64, max_instances=4,
        train=True, lsj=False, step1=True, text_len=16,
    )
    item = ds[0]
    # class-mode grounding fallback from instance masks + class names
    assert float(item["grounding_task_weight"]) == 0.5
    assert item["grounding_valid"].any()
    assert not item["phrase_valid"].any()  # no captions file


def test_ade_full_and_coco_stuff_folders(tmp_path, monkeypatch):
    from PIL import Image

    from iuvl_tpu.data.class_names import get_class_names
    from iuvl_tpu.data.datasets import build_dataset

    # ADE20K-full: tif labels with trainIds (values may exceed 255) and
    # the 65535 ignore sentinel.
    base = tmp_path / "ADE20K_2021_17_01"
    _jpg(str(base / "images_detectron2" / "validation" / "a.jpg"))
    lab = np.full((40, 56), 65535, np.int32)
    lab[:20] = 846
    lab[20:30] = 3
    os.makedirs(str(base / "annotations_detectron2" / "validation"))
    Image.fromarray(lab, mode="I").save(
        str(base / "annotations_detectron2" / "validation" / "a.tif")
    )
    # COCO-Stuff-10k: contiguous-id pngs.
    b2 = tmp_path / "coco" / "coco_stuff_10k"
    _jpg(str(b2 / "images_detectron2" / "test" / "b.jpg"))
    _png(str(b2 / "annotations_detectron2" / "test" / "b.png"),
         np.random.RandomState(1).randint(0, 171, (40, 56)).astype(np.uint8))
    monkeypatch.setenv("DATASET", str(tmp_path))

    ds = build_dataset("ade20k_full_sem_seg_val", {"IMAGE_SIZE": 64}, "val")
    item = ds[0]
    assert item["sem_seg"].shape == (40, 56)
    assert item["sem_seg"].max() == 65535 and 846 in item["sem_seg"]
    assert len(get_class_names("ade20k_full_sem_seg_val")) == 848

    ds = build_dataset(
        "coco_2017_test_stuff_10k_sem_seg", {"IMAGE_SIZE": 64}, "val"
    )
    assert ds[0]["sem_seg"].shape == (40, 56)
    assert len(get_class_names("coco_2017_test_stuff_10k_sem_seg")) == 172


def test_mat_semseg_loader(tmp_path):
    import scipy.io

    from iuvl_tpu.data.real_datasets import SemSegFolderDataset

    _jpg(str(tmp_path / "img" / "a.jpg"))
    lab = np.random.RandomState(0).randint(0, 7, (40, 56)).astype(np.uint8)
    os.makedirs(str(tmp_path / "ann"))
    scipy.io.savemat(str(tmp_path / "ann" / "a.mat"), {"LabelMap": lab})
    ds = SemSegFolderDataset(
        [str(tmp_path / "img" / "a.jpg")], [str(tmp_path / "ann" / "a.mat")],
        image_size=64, loader_type="MAT",
    )
    assert (ds[0]["sem_seg"] == lab).all()


def _pano_png(path, seg_ids):
    from PIL import Image

    rgb = np.stack([
        seg_ids % 256, (seg_ids // 256) % 256, seg_ids // 65536
    ], -1).astype(np.uint8)
    os.makedirs(os.path.dirname(path), exist_ok=True)
    Image.fromarray(rgb).save(path)


def test_scannet_and_bdd_panoptic_json(tmp_path, monkeypatch):
    from iuvl_tpu.data.class_names import get_class_names
    from iuvl_tpu.data.datasets import build_dataset

    seg_ids = np.zeros((40, 56), np.int64)
    seg_ids[:20, :30] = 7
    seg_ids[25:, 40:] = 300

    # ScanNet layout: ann file '<scene>__<frame>.png', image under
    # images/<scene>/color/<frame>.jpg.
    base = tmp_path / "scannet_frames_25k"
    _jpg(str(base / "images" / "scene0011_00" / "color" / "000000.jpg"))
    _pano_png(str(base / "scannet_panoptic" / "scene0011_00__000000.png"),
              seg_ids)
    js = {
        "images": [{"id": 1, "file_name": "scene0011_00__000000.png"}],
        "annotations": [{
            "image_id": 1, "file_name": "scene0011_00__000000.png",
            "segments_info": [
                {"id": 7, "category_id": 1},     # wall  -> contiguous 0
                {"id": 300, "category_id": 14},  # desk  -> contiguous 12
                {"id": 9, "category_id": 999},   # unknown id: dropped
            ],
        }],
    }
    with open(str(base / "scannet_panoptic.json"), "w") as f:
        json.dump(js, f)

    # BDD layout.
    b2 = tmp_path / "bdd100k"
    _jpg(str(b2 / "images" / "10k" / "val" / "c.jpg"))
    _pano_png(str(b2 / "labels" / "pan_seg" / "coco_pano" / "val" / "c.png"),
              seg_ids)
    js2 = {
        "images": [{"id": 5, "file_name": "c.jpg"}],
        "annotations": [{
            "image_id": 5, "file_name": "c.png",
            "segments_info": [
                {"id": 7, "category_id": 7},    # road -> contiguous 6
                {"id": 300, "category_id": 35},  # car -> contiguous 34
            ],
        }],
    }
    os.makedirs(str(b2 / "labels" / "pan_seg" / "meta"))
    with open(str(b2 / "labels" / "pan_seg" / "meta" / "coco_val.json"),
              "w") as f:
        json.dump(js2, f)
    monkeypatch.setenv("DATASET", str(tmp_path))

    ds = build_dataset("scannet_21_panoptic_val", {"IMAGE_SIZE": 64}, "val")
    item = ds[0]
    assert item["image"].shape == (64, 64, 3)
    assert item["valid"][:2].all() and not item["valid"][2:].any()
    assert item["labels"][0] == 0 and item["labels"][1] == 12
    assert len(get_class_names("scannet_21_panoptic_val")) == 21

    ds = build_dataset("bdd10k_40_panoptic_val", {"IMAGE_SIZE": 64}, "val")
    item = ds[0]
    assert item["labels"][0] == 6 and item["labels"][1] == 34
    assert item["valid"][:2].all()
    names = get_class_names("bdd10k_40_panoptic_val")
    assert len(names) == 41 and names[34] == "car"


def test_reference_dataset_name_aliases(tmp_path, monkeypatch):
    """Reference configs name datasets with suffixes
    ('pascalvoc_val_Point', 'refcocog_val_umd', ...); build_dataset must
    resolve them onto the registered builders and thread the full name so
    the VOC interactive builder can parse the prompt mode."""
    from iuvl_tpu.data.datasets import build_dataset

    base = tmp_path / "VOCdevkit" / "VOC2012"
    _jpg(str(base / "JPEGImages" / "2007_000001.jpg"))
    obj = np.zeros((40, 56), np.uint8)
    obj[5:20, 5:25] = 1
    _png(str(base / "SegmentationObject" / "2007_000001.png"), obj)
    os.makedirs(str(base / "ImageSets" / "Segmentation"))
    with open(str(base / "ImageSets" / "Segmentation" / "val.txt"), "w") as f:
        f.write("2007_000001\n")
    monkeypatch.setenv("DATASET", str(tmp_path))

    ds = build_dataset("pascalvoc_val_Scribble", {"IMAGE_SIZE": 64}, "val")
    assert ds.sampler.modes == ("Scribble",)
    ds = build_dataset("pascalvoc_val_Box", {"IMAGE_SIZE": 64}, "val")
    assert ds.sampler.modes == ("Box",)
    # Bare name / explicit cfg still works, default Point.
    ds = build_dataset("pascalvoc_val", {"IMAGE_SIZE": 64}, "val")
    assert ds.sampler.modes == ("Point",)
    item = ds[0]
    assert item["gt_masks"].shape[0] == 1


def test_vlp_named_arrow_files(tmp_path, monkeypatch):
    """Each registered VLP/instruction name reads its FIXED arrow file list
    (reference _PREDEFINED_SPLITS_PRETRAIN): vlp_val must not sweep up the
    train or val2017 arrows, and the *_captioning_* / *_val names dispatch
    to the captioning / retrieval evaluators."""
    import io

    import pyarrow as pa
    from PIL import Image

    from iuvl_tpu.data.datasets import build_dataset
    from iuvl_tpu.pipeline import hook_switcher

    def write_arrow(path, caption):
        buf = io.BytesIO()
        Image.fromarray(
            (np.random.RandomState(0).rand(30, 40, 3) * 255).astype(np.uint8)
        ).save(buf, format="JPEG")
        tbl = pa.table({
            "image": [buf.getvalue()],
            "caption": [[caption]],
            "image_id": ["x.jpg"],
        })
        with pa.OSFile(str(path), "wb") as sink:
            with pa.ipc.new_file(sink, tbl.schema) as w:
                w.write_table(tbl)

    d = tmp_path / "pretrain_arrows_code224"
    d.mkdir()
    write_arrow(d / "coco_caption_karpathy_test.arrow", "test split")
    write_arrow(d / "coco_caption_karpathy_val2017.arrow", "val2017 split")
    write_arrow(d / "code224_vg.arrow", "train split")
    monkeypatch.setenv("DATASET2", str(tmp_path))

    assert build_dataset("vlp_val", {"IMAGE_SIZE": 64}, "val")[0][
        "caption"] == "test split"
    assert build_dataset("vlp_val2017", {"IMAGE_SIZE": 64}, "val")[0][
        "caption"] == "val2017 split"
    assert build_dataset("vlp_captioning_val", {"IMAGE_SIZE": 64}, "val")[0][
        "caption"] == "test split"
    assert build_dataset("instp_captioning_val2017", {"IMAGE_SIZE": 64},
                         "val")[0]["caption"] == "val2017 split"
    # vlp_train: only code224_vg.arrow of its list exists here.
    assert build_dataset("vlp_train", {"IMAGE_SIZE": 64}, "train")[0][
        "caption"] == "train split"

    assert hook_switcher("vlp_val")["mode"] == "retrieval"
    assert hook_switcher("instruction_val2017")["mode"] == "retrieval"
    assert hook_switcher("vlp_captioning_val")["mode"] == "captioning"
    assert hook_switcher("instp_captioning_val2017")["mode"] == "captioning"
