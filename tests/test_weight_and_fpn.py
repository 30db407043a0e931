"""Wiring tests for round-1 orphans: WEIGHT fuzzy-align pretrained load and
the alternative FPN pixel decoder selectable from config."""

import jax
import jax.numpy as jnp
import numpy as np


def _tiny_cfg(tmp_path, **over):
    import iuvl_tpu.models.sam.build as sb

    sb.SAM_VARIANTS["tiny_test"] = dict(
        embed_dim=32, depth=2, num_heads=2, global_attn_indexes=(1,)
    )
    cfg = {
        "SAM_SIZE": "tiny_test", "IMAGE_SIZE": 64, "SYSLEARNER_DIM": 32,
        "MASK_PROPOSAL": 10, "DTYPE": "float32", "CONTEXT_LEN": 7,
        "TEXT_WIDTH": 32, "TEXT_LAYERS": 2, "TEXT_HEADS": 4,
        "PIXEL_DECODER_LAYERS": 2, "NHEADS": 4, "DIM_FEEDFORWARD": 64,
        "NUM_CLASSES": 4, "BATCH_SIZE": 1, "STEPS_PER_EPOCH": 1,
        "TRAIN_NUM_POINTS": 64, "MATCH_POINTS": 64,
        "SOLVER": {"BASE_LR": 1e-3, "MAX_NUM_EPOCHS": 1, "WARMUP_ITERS": 1},
        "DATASETS": {"TRAIN": ["synthetic_seg"], "TEST": ["synthetic_seg"]},
        "SYNTHETIC_SEG": {"NUM_CLASSES": 4, "IMAGE_SIZE": 64,
                          "MAX_INSTANCES": 3, "LENGTH": 2},
        "SAVE_DIR": str(tmp_path),
    }
    cfg.update(over)
    return cfg


def test_weight_align_load(tmp_path):
    from iuvl_tpu.runtime.checkpoint import CheckpointManager
    from iuvl_tpu.train.trainer import Trainer

    trainer = Trainer(_tiny_cfg(tmp_path / "a"))
    _, params = trainer.pipeline.initialize_model()
    # Perturb one leaf so the load is observable, save as a raw params ckpt.
    marked = jax.tree.map(lambda x: x, params)
    key = marked["params"]["predictor"]["query_feat"]
    marked["params"]["predictor"]["query_feat"] = jnp.full_like(key, 7.0)
    ckpt_dir = str(tmp_path / "pretrained")
    mgr = CheckpointManager(ckpt_dir)
    mgr.save(0, {"params": jax.device_get(marked)}, wait=True)

    cfg2 = _tiny_cfg(tmp_path / "b", WEIGHT=True, RESUME_FROM=ckpt_dir)
    t2 = Trainer(cfg2)
    _, fresh = t2.pipeline.initialize_model()
    merged = t2._load_pretrained(fresh)
    np.testing.assert_array_equal(
        np.asarray(merged["params"]["predictor"]["query_feat"]), 7.0
    )


def test_fpn_pixel_decoder_from_config(tmp_path):
    from iuvl_tpu.pipeline import XDecoderPipeline

    cfg = _tiny_cfg(tmp_path, PIXEL_DECODER="fpn")
    pipe = XDecoderPipeline(cfg)
    model, params = pipe.initialize_model()
    metrics = pipe.evaluate_model(params, max_batches=1)
    assert any(k.endswith("mIoU") for k in metrics), metrics
