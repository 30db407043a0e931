"""Native preprocessing core: build + numerical cross-check vs numpy."""

import shutil

import numpy as np
import pytest


@pytest.fixture(scope="module")
def native_lib():
    if shutil.which("g++") is None:
        pytest.skip("no g++")
    from iuvl_tpu.native import available
    from iuvl_tpu.native.build import build

    if not available():
        build(verbose=False)
    from iuvl_tpu import native

    native._lib = None  # force reload
    assert native.available()
    return native


def test_resize_matches_numpy_bilinear(native_lib):
    rs = np.random.RandomState(0)
    img = rs.randint(0, 255, (48, 64, 3), np.uint8)
    out = native_lib.resize_bilinear(img, 96, 128)

    # numpy half-pixel bilinear reference
    h, w = img.shape[:2]
    ys = (np.arange(96) + 0.5) * h / 96 - 0.5
    xs = (np.arange(128) + 0.5) * w / 128 - 0.5
    y0 = np.clip(np.floor(ys).astype(int), 0, h - 1)
    x0 = np.clip(np.floor(xs).astype(int), 0, w - 1)
    y1 = np.clip(y0 + 1, 0, h - 1)
    x1 = np.clip(x0 + 1, 0, w - 1)
    fy = np.clip(ys - y0, 0, 1)[:, None, None]
    fx = np.clip(xs - x0, 0, 1)[None, :, None]
    f = img.astype(np.float64)
    top = f[y0][:, x0] * (1 - fx) + f[y0][:, x1] * fx
    bot = f[y1][:, x0] * (1 - fx) + f[y1][:, x1] * fx
    ref = (top * (1 - fy) + bot * fy + 0.5).astype(np.uint8)
    # rounding differences of +-1 are fine
    assert np.abs(out.astype(int) - ref.astype(int)).max() <= 1


def test_resize_pad_normalize_shape(native_lib):
    img = np.random.randint(0, 255, (30, 60, 3), np.uint8)
    out = native_lib.resize_pad_normalize(
        img, 128, [123.675, 116.28, 103.53], [58.395, 57.12, 57.375]
    )
    assert out.shape == (128, 128, 3)
    # bottom padding region normalizes zeros
    assert np.allclose(out[100:], (0 - 123.675) / 58.395, atol=1e-4) is False
    assert np.isfinite(out).all()


def test_mask_nms_bits_matches_numpy(native_lib):
    from iuvl_tpu.inference import amg

    rs = np.random.RandomState(3)
    n, h, w = 60, 37, 41  # odd sizes: exercises bit-pack padding
    masks = np.zeros((n, h, w), bool)
    for i in range(n):
        # overlapping blobs so NMS actually suppresses
        cy, cx = rs.randint(0, h), rs.randint(0, w)
        r = rs.randint(3, 12)
        yy, xx = np.mgrid[:h, :w]
        masks[i] = (yy - cy) ** 2 + (xx - cx) ** 2 < r * r
    masks[5] = False  # zero-area mask must be skipped
    scores = rs.rand(n).astype(np.float32)
    order = np.argsort(-scores)

    kept_native = native_lib.mask_nms_bits(masks, order, 0.5)
    assert kept_native is not None

    # numpy oracle (the amg.mask_nms fallback body)
    flat = masks.reshape(n, -1).astype(np.float64)
    areas = flat.sum(-1)
    kept, suppressed = [], np.zeros(n, bool)
    for i in order:
        if suppressed[i] or areas[i] == 0:
            continue
        kept.append(int(i))
        inter = flat[i] @ flat.T
        union = areas[i] + areas - inter
        iou = inter / np.maximum(union, 1)
        suppressed |= iou > 0.5
        suppressed[i] = True
    np.testing.assert_array_equal(kept_native, np.asarray(kept, np.int64))


def test_masks_to_rle_batch_matches_numpy(native_lib):
    from iuvl_tpu.inference.amg import mask_to_rle, rle_to_mask

    rs = np.random.RandomState(4)
    masks = rs.rand(7, 23, 31) > 0.6
    masks[0] = False   # all-zero
    masks[1] = True    # all-one
    rles = native_lib.masks_to_rle_batch(masks)
    assert rles is not None
    for m, rle in zip(masks, rles):
        assert rle == mask_to_rle(m)
        np.testing.assert_array_equal(rle_to_mask(rle), m)


def test_masks_to_rle_batch_cap_fallback(native_lib):
    from iuvl_tpu.inference.amg import mask_to_rle

    rs = np.random.RandomState(5)
    masks = rs.rand(3, 16, 16) > 0.5  # noisy: many runs
    rles = native_lib.masks_to_rle_batch(masks, cap=4)  # force overflow
    assert rles == [mask_to_rle(m) for m in masks]
