"""SimpleClickSampler protocol tests (VERDICT r3 items 3/missing-1..2).

Covers:
- the kornia-semantics conv distance transform oracle vs scipy's exact EDT
  (the reference's first-click/next-click machinery,
  /root/reference/datasets/visual_sampler/simpleclick_sampler.py:65-66 and
  /root/reference/modeling/architectures/xdecoder_model.py:874-881);
- the protocol-equivalence fact the jitted next-click loop relies on:
  under kornia semantics, ``{dt(~fn) > 0} == fn`` EXACTLY (boundary FN
  pixels included) — so uniform-over-FN sampling IS the reference's
  "(best random)" uniform-over-(dt>0) sampling;
- SimpleClickSampler.Point: dt-argmax placement + box dilation + fp
  fallback.
"""
from __future__ import annotations

import numpy as np
import pytest

from iuvl_tpu.data.visual_sampler import (
    SimpleClickSampler,
    conv_dt_argmax,
    distance_transform_conv,
    dt_argmax_point,
)

scipy_ndimage = pytest.importorskip("scipy.ndimage")


def _rand_blobs(rs, h=48, w=48, n=3):
    mask = np.zeros((h, w), bool)
    for _ in range(n):
        cy, cx = rs.randint(8, h - 8), rs.randint(8, w - 8)
        r = rs.randint(3, 8)
        yy, xx = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
        mask |= (yy - cy) ** 2 + (xx - cx) ** 2 <= r * r
    return mask


def test_conv_dt_zero_exactly_on_seeds():
    """Kornia semantics: seed (non-zero-input) pixels read 0; every other
    pixel reads > 0. With input = ~fn this is the {dt>0} == fn fact."""
    rs = np.random.RandomState(0)
    for _ in range(5):
        fn = _rand_blobs(rs)
        if not fn.any() or fn.all():
            continue
        # Reference call shape: dt of ~pad(fn) then crop == dt of ~fn with
        # border treated as seed (handled by the pad in the reference;
        # the conv oracle reproduces interior semantics directly).
        dt = distance_transform_conv(~fn)
        assert np.array_equal(dt > 0, fn)


def test_conv_dt_approximates_edt():
    """Ring distances of the conv approximation track the exact EDT (it is
    kornia's documented approximation of it): identical zero set, ring-1
    values near 1, monotone with depth, and same argmax on a disk."""
    h = w = 33
    yy, xx = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
    disk = (yy - 16) ** 2 + (xx - 16) ** 2 <= 100
    dt = distance_transform_conv(~disk)
    edt = scipy_ndimage.distance_transform_edt(disk)
    assert np.array_equal(dt > 0, edt > 0)
    ring1 = (edt == 1)
    # The -h*log(sum exp(-d/h)) readout underestimates where several seeds
    # are visible (that IS kornia's approximation); ring-1 stays within
    # [0.4, 1.1] and strictly below ring-2.
    assert dt[ring1].min() > 0.4 and dt[ring1].max() < 1.1
    assert dt[edt == 2].min() > dt[ring1].max()
    # Deepest point agrees (unique maximum at the disk center).
    assert int(np.argmax(dt)) == int(np.argmax(edt)) == 16 * w + 16


def _oracle_click(fp):
    """Reference-shaped click: argmax of the full conv-dt cascade of
    ~pad(fp) cropped back (simpleclick_sampler.py:64-66), raster-first."""
    padded = np.pad(fp, 1)
    dt = distance_transform_conv(~padded)[1:-1, 1:-1]
    flat = int(np.argmax(dt))
    return (flat // fp.shape[1], flat % fp.shape[1])


def test_conv_dt_argmax_matches_cascade_oracle():
    """The production fast path (deepest-Chebyshev-ring min-conv selection)
    equals the O(depth) cascade's argmax on random blobs, strips, and
    border-flush masks (ADVICE r4 low #3)."""
    rs = np.random.RandomState(7)
    cases = [_rand_blobs(rs) for _ in range(8)]
    strip = np.zeros((21, 21), bool)
    strip[:7, :] = True  # border-flush
    cases.append(strip)
    rect = np.zeros((30, 30), bool)
    rect[5:12, 5:28] = True
    cases.append(rect)
    for fp in cases:
        if not fp.any():
            continue
        assert conv_dt_argmax(fp) == _oracle_click(fp)


def test_conv_dt_argmax_can_differ_from_exact_edt():
    """Documents WHY the production path mirrors the conv-dt rather than the
    exact EDT: on an L-shaped mask the kornia approximation's argmax picks a
    different pixel than the exact-EDT argmax (both valid interior points)."""
    rs = np.random.RandomState(11)
    diff = 0
    for _ in range(40):
        fp = _rand_blobs(rs, n=2)
        if fp.any() and conv_dt_argmax(fp) != dt_argmax_point(fp):
            diff += 1
    # They agree on most masks but not all — the distinction is real.
    assert diff >= 1


def test_dt_argmax_point_disk_center():
    h = w = 41
    yy, xx = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
    disk = (yy - 20) ** 2 + (xx - 12) ** 2 <= 64
    assert dt_argmax_point(disk) == (20, 12)


def test_dt_argmax_border_counts_as_background():
    """A mask flush against the image border: the reference pads with
    background before the transform (simpleclick_sampler.py:65), so the
    deepest point moves inward from the border."""
    mask = np.zeros((21, 21), bool)
    mask[:7, :21] = True  # 7x21 strip at the top edge
    y, x = dt_argmax_point(mask)
    assert y == 3  # middle row of the strip, not row 0
    assert 3 <= x <= 17


def test_point_sampler_places_and_dilates():
    s = SimpleClickSampler(mask_mode="Point", dilation=3, seed=0)
    h = w = 40
    yy, xx = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
    disk = ((yy - 20) ** 2 + (xx - 25) ** 2 <= 49)[None]
    out = s(disk)
    assert out["rand_shape"].shape == (1, h, w)
    assert np.allclose(out["click_points"][0], [25, 20])
    expect = np.zeros((h, w), bool)
    expect[19:22, 24:27] = True  # 3x3 box dilation around (20, 25)
    assert np.array_equal(out["rand_shape"][0], expect)


def test_point_sampler_fp_excludes_pred_and_prev():
    """fp = gt & ~pred & ~prev (simpleclick_sampler.py:62): covering the
    deep center with pred moves the click to the uncovered remainder; a
    fully-covered gt falls back to gt itself."""
    h = w = 40
    gt = np.zeros((h, w), bool)
    gt[10:30, 10:30] = True
    pred = np.zeros((h, w), bool)
    pred[10:30, 10:20] = True  # cover the left half
    s = SimpleClickSampler(mask_mode="Point", seed=0)
    out = s(gt[None], pred_masks=pred[None])
    x, y = out["click_points"][0]
    assert 20 <= x < 30 and gt[int(y), int(x)] and not pred[int(y), int(x)]
    # Full coverage -> fallback to gt (reference forward_point uses fp as-is;
    # our guard mirrors prepare_next_spaital_mask's empty-fn fallback).
    out2 = s(gt[None], pred_masks=gt[None])
    x2, y2 = out2["click_points"][0]
    assert gt[int(y2), int(x2)]


@pytest.mark.parametrize("mode", ["Circle", "Scribble", "Polygon", "Box"])
def test_other_modes_emit_masks(mode):
    rs = np.random.RandomState(1)
    gt = _rand_blobs(rs, n=1)[None]
    out = SimpleClickSampler(mask_mode=mode, seed=1)(gt)
    assert out["rand_shape"].shape == gt.shape
    assert out["rand_shape"][0].any()
    if mode == "Box":
        ys, xs = np.nonzero(gt[0])
        box = np.zeros_like(gt[0])
        box[ys.min():ys.max() + 1, xs.min():xs.max() + 1] = True
        # Box mode = gt with the box region filled (reference :192-204).
        assert np.array_equal(out["rand_shape"][0], box | gt[0])


def test_voc_dataset_uses_simpleclick(tmp_path):
    """The VOC eval dataset ships click_points from SimpleClickSampler."""
    import os

    from PIL import Image

    from iuvl_tpu.data.eval_datasets import PascalVocInteractiveDataset

    base = tmp_path / "VOCdevkit" / "VOC2012"
    (base / "ImageSets" / "Segmentation").mkdir(parents=True)
    (base / "JPEGImages").mkdir()
    (base / "SegmentationObject").mkdir()
    (base / "ImageSets" / "Segmentation" / "val.txt").write_text("img0\n")
    rs = np.random.RandomState(0)
    Image.fromarray(
        rs.randint(0, 255, (60, 80, 3), np.uint8)
    ).save(base / "JPEGImages" / "img0.jpg")
    obj = np.zeros((60, 80), np.uint8)
    obj[10:40, 20:60] = 1
    Image.fromarray(obj).save(base / "SegmentationObject" / "img0.png")

    ds = PascalVocInteractiveDataset(str(tmp_path), image_size=96)
    item = ds[0]
    sq = item["spatial_query"]
    assert "click_points" in sq and sq["click_points"].shape == (1, 2)
    x, y = sq["click_points"][0].astype(int)
    assert item["gt_masks"][0][y, x]  # click lands on the instance
    # And it is the reference's conv-dt argmax pixel of the resized mask.
    assert (y, x) == conv_dt_argmax(item["gt_masks"][0])
