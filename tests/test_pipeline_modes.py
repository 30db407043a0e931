"""Pipeline eval-mode dispatch: grounding + interactive paths end-to-end
on synthetic streams with the tiny model."""

import jax
import numpy as np
import pytest


@pytest.fixture(scope="module")
def pipeline_and_params():
    import iuvl_tpu.models.sam.build as sb

    sb.SAM_VARIANTS["tiny_test"] = dict(
        embed_dim=32, depth=2, num_heads=2, global_attn_indexes=(1,)
    )
    cfg = {
        "SAM_SIZE": "tiny_test", "IMAGE_SIZE": 64, "SYSLEARNER_DIM": 32,
        "MASK_PROPOSAL": 10, "DTYPE": "float32", "NUM_CLASSES": 4,
        "MAX_CLICKS": 3,
        "SYNTHETIC_REFCOCO": {"IMAGE_SIZE": 64, "LENGTH": 4},
        "SYNTHETIC_INTERACTIVE": {"IMAGE_SIZE": 64, "LENGTH": 4},
    }
    from iuvl_tpu.pipeline import XDecoderPipeline

    pipe = XDecoderPipeline(cfg)
    model, params = pipe.initialize_model()
    return pipe, params


def test_grounding_eval_mode(pipeline_and_params):
    pipe, params = pipeline_and_params
    pipe.cfg["DATASETS"] = {"TEST": ["synthetic_refcoco"]}
    metrics = pipe.evaluate_model(params, max_batches=2)
    assert any(k.endswith("cIoU") for k in metrics), metrics
    assert any(k.endswith("precision@0.5") for k in metrics)


def test_interactive_eval_mode(pipeline_and_params, tmp_path):
    pipe, params = pipeline_and_params
    pipe.cfg["DATASETS"] = {"TEST": ["synthetic_interactive"]}
    pipe.cfg["SAVE_DIR"] = str(tmp_path)
    metrics = pipe.evaluate_model(params, max_batches=2)
    pipe.cfg.pop("SAVE_DIR")
    assert any("NoC@" in k for k in metrics), metrics
    assert any("mIoU@" in k for k in metrics)
    # Reference interactive_evaluation.py:87-113 saves an IoU-vs-clicks
    # curve image alongside the metrics.
    assert (tmp_path / "synthetic_interactive_iou_curve.png").exists()


def test_interactive_single_shot_box_mode(pipeline_and_params):
    """Non-Point prompt modes are single-shot (reference
    evaluate_interactive :769-850): the one IoU is broadcast to a
    (max_clicks,) trajectory for the evaluator (ADVICE r4 medium — this
    path used to crash on the evaluator's trajectory-length assert)."""
    pipe, params = pipeline_and_params
    pipe.cfg["DATASETS"] = {"TEST": ["synthetic_interactive"]}
    pipe.cfg["SYNTHETIC_INTERACTIVE"]["PROMPT_MODE"] = "Box"
    try:
        metrics = pipe.evaluate_model(params, max_batches=2)
    finally:
        pipe.cfg["SYNTHETIC_INTERACTIVE"]["PROMPT_MODE"] = "Point"
    assert any("NoC@" in k for k in metrics), metrics
    # Single-shot: mIoU is constant across the click axis.
    m1 = metrics["synthetic_interactive/mIoU@1"]
    m3 = metrics["synthetic_interactive/mIoU@3"]
    assert m1 == pytest.approx(m3)


def test_captioning_eval_mode(pipeline_and_params):
    pipe, params = pipeline_and_params
    pipe.cfg["DATASETS"] = {"TEST": ["synthetic_captioning"]}
    pipe.cfg["SYNTHETIC_CAPTIONING"] = {"IMAGE_SIZE": 64, "LENGTH": 2}
    pipe.cfg["CAPTIONING_STEPS"] = 4
    metrics = pipe.evaluate_model(params, max_batches=2)
    assert any("BLEU" in k for k in metrics), metrics
    assert any("CIDEr" in k for k in metrics)


def test_retrieval_eval_mode(pipeline_and_params):
    pipe, params = pipeline_and_params
    pipe.cfg["DATASETS"] = {"TEST": ["synthetic_retrieval"]}
    pipe.cfg["SYNTHETIC_RETRIEVAL"] = {"IMAGE_SIZE": 64, "LENGTH": 3}
    metrics = pipe.evaluate_model(params, max_batches=3)
    assert any("ir@1" in k for k in metrics), metrics
    assert any("tr@1" in k for k in metrics)


def test_classification_eval_mode(pipeline_and_params):
    pipe, params = pipeline_and_params
    pipe.cfg["DATASETS"] = {"TEST": ["synthetic_classification"]}
    pipe.cfg["SYNTHETIC_CLASSIFICATION"] = {
        "IMAGE_SIZE": 64, "LENGTH": 3, "NUM_CLASSES": 4,
    }
    metrics = pipe.evaluate_model(params, max_batches=3)
    assert any("top1" in k for k in metrics), metrics


def test_semseg_original_size_eval(pipeline_and_params):
    """ADE-style path: non-square original gt, prediction cropped+resized to
    the original size, and a NONZERO processed-sample count (round-1 bug:
    every sem_seg batch was silently skipped)."""
    pipe, params = pipeline_and_params
    pipe.cfg["DATASETS"] = {"TEST": ["synthetic_semseg_ade"]}
    pipe.cfg["SYNTHETIC_SEMSEG_ADE"] = {
        "IMAGE_SIZE": 64, "LENGTH": 2, "NUM_CLASSES": 4,
    }
    metrics = pipe.evaluate_model(params, max_batches=2)
    assert metrics["synthetic_semseg_ade/processed"] == 2, metrics
    assert any(k.endswith("mIoU") for k in metrics), metrics


def test_multi_dataset_test_list(pipeline_and_params):
    """The full DATASETS.TEST list is honored (round-1: silently truncated
    to names[0])."""
    pipe, params = pipeline_and_params
    pipe.cfg["DATASETS"] = {
        "TEST": ["synthetic_classification", "synthetic_retrieval"]
    }
    metrics = pipe.evaluate_model(params, max_batches=2)
    assert any(k.startswith("synthetic_classification/") for k in metrics)
    assert any(k.startswith("synthetic_retrieval/") for k in metrics)


def test_vqa_eval_mode():
    import iuvl_tpu.models.sam.build as sb
    from iuvl_tpu.pipeline import XDecoderPipeline

    sb.SAM_VARIANTS["tiny_test"] = dict(
        embed_dim=32, depth=2, num_heads=2, global_attn_indexes=(1,)
    )
    cfg = {
        "SAM_SIZE": "tiny_test", "IMAGE_SIZE": 64, "SYSLEARNER_DIM": 32,
        "MASK_PROPOSAL": 10, "DTYPE": "float32", "NUM_CLASSES": 4,
        "CONTEXT_LEN": 7, "TEXT_LAYERS": 2, "TEXT_HEADS": 4,
        "PIXEL_DECODER_LAYERS": 2, "NHEADS": 4, "DIM_FEEDFORWARD": 64,
        "Load_LLM": True, "LLM_DIM": 32, "LLM_MAX_LEN": 64,
        # Real CLIP vocab so conversation ids stay in range for jnp.take.
        "LLM": {"VOCAB_SIZE": 49408, "DIM": 32, "LAYERS": 2, "HEADS": 4,
                "KV_HEADS": 4, "FFN_DIM": 64},
        "VQA_MAX_NEW_TOKENS": 3,
        "DATASETS": {"TEST": ["synthetic_vqa"]},
        "SYNTHETIC_VQA": {"IMAGE_SIZE": 64, "LENGTH": 1},
    }
    pipe = XDecoderPipeline(cfg)
    model, params = pipe.initialize_model()
    metrics = pipe.evaluate_model(params, max_batches=1)
    assert any("accuracy" in k for k in metrics), metrics
