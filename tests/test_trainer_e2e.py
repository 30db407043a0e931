"""End-to-end smoke: entry-point config -> Trainer -> synthetic data ->
a few train steps -> checkpoint -> eval loop."""

import jax
import numpy as np


def test_trainer_train_and_eval(tmp_path):
    import iuvl_tpu.models.sam.build as sb

    sb.SAM_VARIANTS["tiny_test"] = dict(
        embed_dim=32, depth=2, num_heads=2, global_attn_indexes=(1,)
    )
    cfg = {
        "SAM_SIZE": "tiny_test",
        "IMAGE_SIZE": 64,
        "SYSLEARNER_DIM": 32,
        "MASK_PROPOSAL": 10,
        "DTYPE": "float32",
        "DATASETS": {"TRAIN": ["synthetic_seg"], "TEST": ["synthetic_seg"]},
        "NUM_CLASSES": 4,
        "BATCH_SIZE": 2,
        "STEPS_PER_EPOCH": 4,
        "TRAIN_NUM_POINTS": 64,
        "MATCH_POINTS": 64,
        "SOLVER": {"BASE_LR": 1e-3, "MAX_NUM_EPOCHS": 1, "WARMUP_ITERS": 1},
        "SAVE_DIR": str(tmp_path),
        "LOG_EVERY": 1,
        "SYNTHETIC_SEG": {},
        "synthetic_seg".upper(): {
            "NUM_CLASSES": 4, "IMAGE_SIZE": 64, "MAX_INSTANCES": 3, "LENGTH": 8,
        },
    }
    from iuvl_tpu.train.trainer import Trainer

    trainer = Trainer(cfg)
    result = trainer.train()
    assert result["final_step"] == 4
    assert np.isfinite(result["loss_total"])

    metrics = trainer.pipeline.evaluate_model(
        trainer.ckpt.restore()["params"], max_batches=2
    )
    key = [k for k in metrics if k.endswith("mIoU")]
    assert key, metrics


def test_trainer_joint_mode(tmp_path):
    import iuvl_tpu.models.sam.build as sb

    sb.SAM_VARIANTS["tiny_test"] = dict(
        embed_dim=32, depth=2, num_heads=2, global_attn_indexes=(1,)
    )
    cfg = {
        "SAM_SIZE": "tiny_test", "IMAGE_SIZE": 64, "SYSLEARNER_DIM": 32,
        "MASK_PROPOSAL": 10, "DTYPE": "float32",
        "DATASETS": {"TRAIN": ["synthetic_seg", "synthetic_vlp"],
                     "TEST": ["synthetic_seg"]},
        "LOADER": {"JOINT": True},
        "NUM_CLASSES": 4, "BATCH_SIZE": 2, "STEPS_PER_EPOCH": 2,
        "TRAIN_NUM_POINTS": 64, "MATCH_POINTS": 64,
        "SOLVER": {"BASE_LR": 1e-3, "MAX_NUM_EPOCHS": 1, "WARMUP_ITERS": 1},
        "SAVE_DIR": str(tmp_path), "LOG_EVERY": 1,
        "SYNTHETIC_SEG": {"NUM_CLASSES": 4, "IMAGE_SIZE": 64,
                          "MAX_INSTANCES": 3, "LENGTH": 8},
        "SYNTHETIC_VLP": {"IMAGE_SIZE": 64, "LENGTH": 8},
    }
    from iuvl_tpu.train.trainer import Trainer

    trainer = Trainer(cfg)
    result = trainer.train()
    assert result["final_step"] == 2
    assert "loss_captioning_0" in result
    assert np.isfinite(result["loss_total"])


def test_trainer_resume_continues_run(tmp_path):
    """RESUME must root the checkpoint manager in the EXISTING run dir and
    restore the step counter (a fresh run dir silently restarts at 0)."""
    import iuvl_tpu.models.sam.build as sb

    sb.SAM_VARIANTS["tiny_test"] = dict(
        embed_dim=32, depth=2, num_heads=2, global_attn_indexes=(1,)
    )
    cfg = {
        "SAM_SIZE": "tiny_test",
        "IMAGE_SIZE": 64,
        "SYSLEARNER_DIM": 32,
        "MASK_PROPOSAL": 10,
        "DTYPE": "float32",
        "DATASETS": {"TRAIN": ["synthetic_seg"], "TEST": ["synthetic_seg"]},
        "NUM_CLASSES": 4,
        "BATCH_SIZE": 2,
        "STEPS_PER_EPOCH": 4,
        "TRAIN_NUM_POINTS": 64,
        "MATCH_POINTS": 64,
        "SOLVER": {"BASE_LR": 1e-3, "MAX_NUM_EPOCHS": 1, "WARMUP_ITERS": 1},
        "SAVE_DIR": str(tmp_path),
        "LOG_EVERY": 1,
        "SYNTHETIC_SEG": {
            "NUM_CLASSES": 4, "IMAGE_SIZE": 64, "MAX_INSTANCES": 3, "LENGTH": 8,
        },
    }
    from iuvl_tpu.train.trainer import Trainer

    first = Trainer(cfg)
    first.train()
    assert first.ckpt.latest_step == 4

    resumed = Trainer({**cfg, "RESUME": True,
                       "SOLVER": {**cfg["SOLVER"], "MAX_NUM_EPOCHS": 2}})
    assert resumed.run_dir == first.run_dir
    assert resumed.ckpt.latest_step == 4
    result = resumed.train()
    assert result["final_step"] == 8  # continued from 4, not restarted

    fresh = Trainer(cfg)  # no RESUME -> a new run dir
    assert fresh.run_dir != first.run_dir


def test_instruction_labels_align_with_ids():
    """Every supervised label must equal the id at its position (the
    trailing '</s>' separator tokens shift a naive right-alignment)."""
    from iuvl_tpu.data.vlp_datasets import SyntheticInstructionDataset
    from iuvl_tpu.models.llm.multimodal import IGNORE_INDEX

    ds = SyntheticInstructionDataset(image_size=16, length=2)
    item = ds[0]
    ids, labels = item["input_ids"], item["labels"]
    sup = labels != IGNORE_INDEX
    assert sup.any()
    np.testing.assert_array_equal(ids[sup], labels[sup])
    # The supervised span starts at the answer, i.e. strictly inside.
    assert not sup[0]
