"""Stage-2 instruction tuning reachable from the Trainer/CLI (reference
step2_instruction.yaml + forward_llm): the instruction stream routes through
prepare_llm_batch + make_llm_train_step with the LLM frozen."""

import numpy as np


def test_trainer_step2_instruction(tmp_path):
    import iuvl_tpu.models.sam.build as sb
    from iuvl_tpu.train.trainer import Trainer

    sb.SAM_VARIANTS["tiny_test"] = dict(
        embed_dim=32, depth=2, num_heads=2, global_attn_indexes=(1,)
    )
    cfg = {
        "SAM_SIZE": "tiny_test", "IMAGE_SIZE": 64, "SYSLEARNER_DIM": 32,
        "MASK_PROPOSAL": 10, "DTYPE": "float32", "CONTEXT_LEN": 7,
        "TEXT_WIDTH": 32, "TEXT_LAYERS": 2, "TEXT_HEADS": 4,
        "PIXEL_DECODER_LAYERS": 2, "NHEADS": 4, "DIM_FEEDFORWARD": 64,
        "Load_LLM": True, "LLM_DIM": 32, "LLM_MAX_LEN": 48,
        "LLM": {"VOCAB_SIZE": 64, "DIM": 32, "LAYERS": 2, "HEADS": 4,
                "KV_HEADS": 4, "FFN_DIM": 64},
        "DATASETS": {"TRAIN": ["synthetic_instruction"]},
        "SYNTHETIC_INSTRUCTION": {
            "IMAGE_SIZE": 64, "LENGTH": 6, "MAX_LEN": 32,
            "VOCAB_SIZE": 64, "CONTEXT_LEN": 7,
        },
        "BATCH_SIZE": 1, "STEPS_PER_EPOCH": 3, "LOG_EVERY": 1,
        "FIX_PARAM": ["image_encoder", "pixel_decoder", "predictor",
                      "lang_encoder", "prompt_encoder", "mask_decoder"],
        "SOLVER": {"BASE_LR": 0.01, "MAX_NUM_EPOCHS": 1, "WARMUP_ITERS": 0},
        "SAVE_DIR": str(tmp_path),
    }
    out = Trainer(cfg).train()
    assert out["final_step"] == 3
    assert "loss_llm" in out and np.isfinite(out["loss_llm"]), out
