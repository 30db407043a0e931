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


def test_vlp_and_instruction_datasets():
    from iuvl_tpu.data.vlp_datasets import (
        SyntheticInstructionDataset,
        SyntheticVlpDataset,
    )
    from iuvl_tpu.models.llm.multimodal import IMAGE_TOKEN_INDEX

    ds = SyntheticVlpDataset(image_size=64, length=4)
    item = ds[0]
    assert item["image"].shape == (64, 64, 3)
    assert item["caption_ids"].shape == (77,)
    assert item["caption_mask"].sum() > 2

    ins = SyntheticInstructionDataset(image_size=64, length=2)
    it = ins[0]
    assert (it["input_ids"] == IMAGE_TOKEN_INDEX).sum() == 1
    assert (it["labels"] != -100).sum() > 0


def test_build_grounding_targets():
    import jax.numpy as jnp
    from iuvl_tpu.data.tokenizer import build_tokenizer
    from iuvl_tpu.data.vlp_datasets import build_grounding_targets

    tok = build_tokenizer()
    encode = lambda ids, mask: jnp.ones((ids.shape[0], 16), jnp.float32)
    out = build_grounding_targets(
        ["a dog next to a red ball", "a cat"], encode, tok, max_phrases=3
    )
    assert out["class_embs"].shape == (2, 3, 16)
    assert out["group_matrix"].shape == (2, 3, 3)
    assert out["valid"].shape == (2, 3)
    assert bool(out["valid"][0, 0])
