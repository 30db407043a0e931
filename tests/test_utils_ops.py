import numpy as np
import jax.numpy as jnp

from iuvl_tpu.inference.amg import (
    build_all_layer_point_grids,
    build_point_grid,
    mask_nms,
    stability_score,
)
from iuvl_tpu.ops.boxes import (
    box_cxcywh_to_xyxy,
    box_iou,
    box_xyxy_to_cxcywh,
    generalized_box_iou,
    masks_to_boxes,
)
from iuvl_tpu.utils.visualizer import (
    draw_boxes,
    draw_instances,
    draw_points,
    draw_sem_seg,
    overlay_mask,
)


def test_box_conversions_roundtrip():
    b = jnp.asarray([[10.0, 20.0, 30.0, 60.0]])
    np.testing.assert_allclose(
        np.asarray(box_cxcywh_to_xyxy(box_xyxy_to_cxcywh(b))), np.asarray(b),
        atol=1e-5,
    )


def test_box_iou_and_giou():
    a = jnp.asarray([[0.0, 0.0, 2.0, 2.0]])
    b = jnp.asarray([[1.0, 1.0, 3.0, 3.0], [0.0, 0.0, 2.0, 2.0]])
    iou, _ = box_iou(a, b)
    np.testing.assert_allclose(np.asarray(iou), [[1 / 7, 1.0]], atol=1e-6)
    giou = generalized_box_iou(a, b)
    assert float(giou[0, 1]) == 1.0
    assert float(giou[0, 0]) < float(iou[0, 0])


def test_masks_to_boxes():
    m = np.zeros((2, 8, 8), bool)
    m[0, 2:5, 3:7] = True
    boxes = np.asarray(masks_to_boxes(jnp.asarray(m)))
    np.testing.assert_allclose(boxes[0], [3, 2, 7, 5])
    np.testing.assert_allclose(boxes[1], [0, 0, 0, 0])


def test_point_grids():
    g = build_point_grid(4)
    assert g.shape == (16, 2)
    assert 0 < g.min() and g.max() < 1
    layers = build_all_layer_point_grids(32, 2, 2)
    assert [len(x) for x in layers] == [1024, 256, 64]


def test_stability_and_nms():
    logits = np.full((2, 8, 8), -5.0)
    logits[0, :4] = 5.0  # very stable mask
    logits[1, :4] = 0.5  # marginal mask (same region)
    s = stability_score(logits)
    assert s[0] > 0.99 and s[1] < 0.5
    masks = logits > 0
    kept = mask_nms(masks, np.array([0.9, 0.8]), iou_thresh=0.7)
    assert kept.tolist() == [0]


def test_visualizer_shapes():
    img = np.zeros((32, 32, 3), np.uint8)
    m = np.zeros((32, 32), bool)
    m[4:12, 4:12] = True
    out = overlay_mask(img, m)
    assert out.shape == img.shape and out[6, 6].sum() > 0
    out = draw_instances(img, np.stack([m, ~m]))
    assert out.shape == img.shape
    out = draw_sem_seg(img, m.astype(int), num_classes=2)
    assert out.shape == img.shape
    out = draw_boxes(img, np.array([[4, 4, 12, 12]]))
    assert (out[4, 4:12] > 0).any()
    out = draw_points(img, np.array([[16, 16]]), [1])
    assert (out[16, 16] > 0).any()


def test_rle_roundtrip():
    from iuvl_tpu.inference.amg import mask_to_rle, rle_to_mask

    rs = np.random.RandomState(0)
    mask = rs.rand(13, 17) > 0.6
    rle = mask_to_rle(mask)
    assert rle["size"] == [13, 17]
    np.testing.assert_array_equal(rle_to_mask(rle), mask)
    # empty + full masks
    for m in (np.zeros((4, 4), bool), np.ones((4, 4), bool)):
        np.testing.assert_array_equal(rle_to_mask(mask_to_rle(m)), m)


def test_crop_boxes():
    from iuvl_tpu.inference.amg import generate_crop_boxes

    boxes, layers = generate_crop_boxes((100, 200), n_layers=1)
    assert boxes[0] == [0, 0, 200, 100] and layers[0] == 0
    assert sum(1 for l in layers if l == 1) == 4


def test_lsj_augmentation():
    from iuvl_tpu.data.augment import large_scale_jitter

    rs = np.random.RandomState(0)
    img = rs.randint(0, 255, (48, 64, 3), np.uint8)
    masks = np.zeros((2, 48, 64), np.float32)
    masks[0, 10:30, 10:40] = 1
    masks[1, 5:15, 50:60] = 1
    out_img, out_masks = large_scale_jitter(img, masks, rs, image_size=32)
    assert out_img.shape == (32, 32, 3)
    assert out_masks.shape == (2, 32, 32)
    assert set(np.unique(out_masks)) <= {0.0, 1.0}


def test_base_pixel_decoder():
    import jax
    from iuvl_tpu.models.xdecoder.fpn_decoder import BasePixelDecoder

    rs = np.random.RandomState(0)
    feats = {
        "res2": jnp.asarray(rs.randn(1, 16, 16, 8).astype(np.float32)),
        "res3": jnp.asarray(rs.randn(1, 8, 8, 8).astype(np.float32)),
        "res4": jnp.asarray(rs.randn(1, 4, 4, 8).astype(np.float32)),
        "res5": jnp.asarray(rs.randn(1, 2, 2, 8).astype(np.float32)),
    }
    dec = BasePixelDecoder(conv_dim=16, mask_dim=16)
    params = dec.init(jax.random.PRNGKey(0), feats)
    mf, ms = dec.apply(params, feats)
    assert mf.shape == (1, 16, 16, 16)
    assert [m.shape[1] for m in ms] == [2, 4, 8]


def test_export_decode_roundtrip():
    import jax
    from tests.test_syslearner import _tiny_model
    from iuvl_tpu.models.xdecoder.model import SysLearner
    from iuvl_tpu.inference.export import export_decode, load_exported

    model = _tiny_model()
    images = jnp.zeros((1, 64, 64, 3), jnp.float32)
    text_emb = jnp.ones((5, 32), jnp.float32)
    params = model.init(
        jax.random.PRNGKey(0), images, text_emb, method=SysLearner.warmup
    )
    data = export_decode(model, params, num_prompts=2)
    assert isinstance(data, (bytes, bytearray)) and len(data) > 1000

    fn = load_exported(data)
    emb = jnp.zeros((2, 4, 4, 256), jnp.float32)
    pts = jnp.asarray([[[10.0, 10.0]], [[30.0, 30.0]]])
    labs = jnp.ones((2, 1), jnp.int32)
    masks = fn.call(params, emb, pts, labs)
    assert masks.shape == (2, 4, 16, 16)


def test_generate_masks_multicrop():
    """AMG with crop layers: crop masks are up-pasted into full-image space
    and survive the global NMS (reference SamAutomaticMaskGenerator
    crop_n_layers path)."""
    import jax
    import jax.numpy as jnp

    from iuvl_tpu.inference.amg import generate_masks
    from iuvl_tpu.models.sam.build import Sam, SamConfig
    import iuvl_tpu.models.sam.build as sb

    sb.SAM_VARIANTS["tiny_test"] = dict(
        embed_dim=32, depth=2, num_heads=2, global_attn_indexes=(1,)
    )
    cfg = SamConfig(**sb.SAM_VARIANTS["tiny_test"], img_size=64)
    model = Sam(cfg=cfg)
    img0 = jnp.zeros((1, 64, 64, 3), jnp.float32)
    params = model.init(
        jax.random.PRNGKey(0), img0, jnp.zeros((1, 1, 2)),
        jnp.ones((1, 1), jnp.int32),
    )
    img = jax.random.uniform(jax.random.PRNGKey(1), (1, 64, 64, 3)) * 255
    out = generate_masks(
        model, params, img, points_per_side=4, batch=8,
        pred_iou_thresh=-10.0, stability_thresh=-1.0, crop_n_layers=1,
    )
    assert out["masks"].shape[1:] == (16, 16)
    assert len(out["masks"]) == len(out["scores"])
    assert len(out["masks"]) > 0
    # Reference record layout: one dict per kept mask, point/crop metadata
    # carried through the NMS. All geometry is in the segmentation's (S/4)
    # frame — here S=64, so the mask frame is 16x16.
    assert len(out["records"]) == len(out["masks"])
    import numpy as np

    from iuvl_tpu.inference.amg import batched_mask_to_box

    for rec in out["records"]:
        x, y, w, h = rec["bbox"]
        assert 0 <= x <= 16 and 0 <= y <= 16 and w <= 16 and h <= 16
        assert rec["area"] == int(rec["segmentation"].sum())
        seg_box = batched_mask_to_box(rec["segmentation"][None])[0]
        assert rec["bbox"] == [
            float(seg_box[0]), float(seg_box[1]),
            float(seg_box[2] - seg_box[0]), float(seg_box[3] - seg_box[1]),
        ]
        (px, py), = rec["point_coords"]
        assert 0 <= px <= 16 and 0 <= py <= 16
        cx, cy, cw2, ch2 = rec["crop_box"]
        assert cw2 <= 16 and ch2 <= 16
        assert np.isfinite(rec["predicted_iou"])
        assert np.isfinite(rec["stability_score"])


def test_generate_masks_rle_modes():
    """output_mode='coco_rle': records carry compressed-string RLEs that
    decode back to the kept masks."""
    import jax
    import jax.numpy as jnp

    import numpy as np
    from iuvl_tpu.inference.amg import (
        coco_decode_rle, generate_masks, rle_to_mask,
    )
    from iuvl_tpu.models.sam.build import Sam, SamConfig
    import iuvl_tpu.models.sam.build as sb

    sb.SAM_VARIANTS["tiny_test"] = dict(
        embed_dim=32, depth=2, num_heads=2, global_attn_indexes=(1,)
    )
    cfg = SamConfig(**sb.SAM_VARIANTS["tiny_test"], img_size=64)
    model = Sam(cfg=cfg)
    img0 = jnp.zeros((1, 64, 64, 3), jnp.float32)
    params = model.init(
        jax.random.PRNGKey(0), img0, jnp.zeros((1, 1, 2)),
        jnp.ones((1, 1), jnp.int32),
    )
    img = jax.random.uniform(jax.random.PRNGKey(1), (1, 64, 64, 3)) * 255
    out = generate_masks(
        model, params, img, points_per_side=4, batch=8,
        pred_iou_thresh=-10.0, stability_thresh=-1.0,
        output_mode="coco_rle",
    )
    assert len(out["rles"]) == len(out["masks"]) > 0
    for rle, mask, rec in zip(out["rles"], out["masks"], out["records"]):
        assert isinstance(rle["counts"], str)
        np.testing.assert_array_equal(rle_to_mask(coco_decode_rle(rle)), mask)
        assert rec["segmentation"] is rle


def test_coco_rle_string_roundtrip():
    import numpy as np
    from iuvl_tpu.inference.amg import (
        area_from_rle, coco_decode_rle, coco_encode_rle, mask_to_rle,
        rle_to_mask,
    )

    rs = np.random.RandomState(7)
    cases = [
        rs.rand(23, 31) > 0.5,            # noisy: many short runs
        np.zeros((16, 16), bool),         # all background
        np.ones((16, 16), bool),          # all foreground
        rs.rand(64, 64) > 0.98,           # sparse: long zero runs
    ]
    m = np.zeros((40, 40), bool)
    m[5:30, 8:33] = True                  # one big run block
    cases.append(m)
    for mask in cases:
        rle = mask_to_rle(mask)
        enc = coco_encode_rle(rle)
        assert isinstance(enc["counts"], str)
        # chars stay in the printable 48..111 window (json-serializable)
        assert all(48 <= ord(c) <= 111 for c in enc["counts"])
        dec = coco_decode_rle(enc)
        assert dec == rle
        np.testing.assert_array_equal(rle_to_mask(dec), mask)
        assert area_from_rle(rle) == int(mask.sum())


def test_visualizer_labeled_instances_and_text():
    from iuvl_tpu.utils.visualizer import (
        class_color, create_text_labels, draw_instances, draw_panoptic,
        draw_sem_seg, draw_text,
    )

    img = np.full((64, 64, 3), 120, np.uint8)
    m1 = np.zeros((64, 64), bool); m1[8:28, 8:28] = True
    m2 = np.zeros((64, 64), bool); m2[36:60, 30:60] = True

    # deterministic per-class colors
    assert class_color(3) == class_color(3)
    assert class_color(3) != class_color(4)

    assert create_text_labels([0, 1], [0.97, 0.5], ["cat", "dog"]) == [
        "cat 97%", "dog 50%"]
    assert create_text_labels(None, [0.25]) == ["25%"]

    out = draw_instances(img, np.stack([m1, m2]), labels=[0, 1],
                         scores=[0.9, 0.8], class_names=["cat", "dog"])
    assert out.shape == img.shape and out.dtype == np.uint8
    assert (out != img).any()
    # text halo writes near-black pixels around each mask's median
    cy, cx = 18, 18
    patch = out[cy - 6:cy + 6, cx - 6:cx + 6]
    assert (patch.min(axis=-1) < 40).any(), "label text not rendered"

    # panoptic with labels + scores
    seg = np.zeros((64, 64), np.int32)
    seg[m1] = 1; seg[m2] = 2
    info = [
        {"id": 1, "category_id": 0, "isthing": True, "score": 0.9},
        {"id": 2, "category_id": 1, "isthing": False},
    ]
    pan = draw_panoptic(img, seg, info, class_names=["cat", "sky"])
    assert pan.shape == img.shape
    assert (pan[m1] != img[m1]).any() and (pan[m2] != img[m2]).any()

    sem = draw_sem_seg(img, seg, num_classes=3, show_text=True,
                       class_names=["bg", "cat", "sky"])
    assert sem.shape == img.shape

    t = draw_text(img, "hello", (32, 32))
    assert (t != img).any()


def test_visualizer_labeled_boxes():
    from iuvl_tpu.utils.visualizer import draw_boxes

    img = np.full((64, 64, 3), 200, np.uint8)
    out = draw_boxes(img, np.asarray([[10, 10, 40, 40]]), labels=[1],
                     scores=[0.75], class_names=["a", "bus"])
    assert (out != img).any()
