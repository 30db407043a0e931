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
