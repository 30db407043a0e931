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


def test_interactive_eval_mode(pipeline_and_params):
    pipe, params = pipeline_and_params
    pipe.cfg["DATASETS"] = {"TEST": ["synthetic_interactive"]}
    metrics = pipe.evaluate_model(params, max_batches=2)
    assert any("NoC@" in k for k in metrics), metrics
    assert any("mIoU@" in k for k in metrics)
