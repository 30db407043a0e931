import numpy as np

from iuvl_tpu.data.prompts import get_prompt_templates, prompt_engineering
from iuvl_tpu.data.transforms import (
    apply_boxes,
    apply_coords,
    get_preprocess_shape,
    pad_to_square,
    resize_longest_side,
)
from iuvl_tpu.data.visual_sampler import MODES, SAMPLERS, ShapeSampler


def test_preprocess_shape_and_coords():
    assert get_preprocess_shape(480, 640, 1024) == (768, 1024)
    img = np.random.RandomState(0).randint(0, 255, (480, 640, 3), np.uint8)
    resized = resize_longest_side(img, 1024)
    assert resized.shape == (768, 1024, 3)
    padded = pad_to_square(resized, 1024)
    assert padded.shape == (1024, 1024, 3)
    assert (padded[768:] == 0).all()

    pts = apply_coords(np.array([[320.0, 240.0]]), (480, 640))
    np.testing.assert_allclose(pts, [[512.0, 384.0]])
    boxes = apply_boxes(np.array([[0.0, 0.0, 640.0, 480.0]]), (480, 640))
    np.testing.assert_allclose(boxes, [[0.0, 0.0, 1024.0, 768.0]])


def test_prompt_templates():
    assert len(get_prompt_templates()) >= 60
    p = prompt_engineering("cat-stuff", topk=1)
    assert "cat" in p and "stuff" not in p and p.endswith(".")


def test_all_samplers_produce_foreground():
    rng = np.random.RandomState(0)
    mask = np.zeros((64, 64), bool)
    mask[16:48, 16:48] = True
    for mode in MODES:
        out = SAMPLERS[mode](mask, rng)
        assert out.shape == mask.shape
        assert out.any(), mode
        assert out.dtype == bool


def test_shape_sampler():
    gt = np.zeros((3, 32, 32), bool)
    gt[0, :10, :10] = True
    gt[1, 20:, 20:] = True
    gt[2, 5:15, 20:30] = True
    s = ShapeSampler(max_candidate=2, seed=0)
    out = s(gt)
    assert out["rand_shape"].shape == (2, 32, 32)
    assert len(out["types"]) == 2
    assert all(t in MODES for t in out["types"])
