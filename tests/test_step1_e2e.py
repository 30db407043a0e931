"""Step-1 pretrain objective end-to-end from data: the synthetic step1
stream (captions + grounding token IDS) must light up loss_caption_* and
loss_grounding_* in train metrics, with live text-tower gradients, and the
total must decrease on a repeated batch."""

import jax
import jax.numpy as jnp
import numpy as np

from iuvl_tpu.data.datasets import build_dataset
from iuvl_tpu.losses.criterion import CriterionConfig, SegCriterion, SegTargets
from iuvl_tpu.train.optimizer import build_optimizer
from iuvl_tpu.train.train_step import TrainState, make_joint_train_step


def _collate(items):
    return {
        k: np.stack([it[k] for it in items])
        for k in items[0]
        if isinstance(items[0][k], np.ndarray)
    }


def test_step1_losses_fire_and_decrease():
    from tests.test_syslearner import _tiny_model
    from iuvl_tpu.models.xdecoder.model import SysLearner

    # Real CLIP vocab: the step tokenizes real text (a 64-entry test vocab
    # would send out-of-range ids into jnp.take -> NaN fill).
    model = _tiny_model(vocab_size=49408)
    params = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)),
        jnp.ones((5, 32)), method=SysLearner.warmup,
    )

    ds = build_dataset(
        "synthetic_seg_step1",
        {"NUM_CLASSES": 4, "IMAGE_SIZE": 64, "MAX_INSTANCES": 3,
         "LENGTH": 4, "TEXT_LEN": 7},
        "train",
    )
    item = ds[0]
    for key in ("phrase_ids", "grounding_ids", "grounding_masks"):
        assert key in item, key
    batch = _collate([item])

    targets = SegTargets(
        labels=jnp.asarray(batch["labels"]),
        masks=jnp.asarray(batch["masks"]),
        valid=jnp.asarray(batch["valid"]),
    )
    seg_extras = {
        k: jnp.asarray(batch[k])
        for k in ("phrase_ids", "phrase_mask", "phrase_valid", "phrase_groups",
                  "grounding_ids", "grounding_mask", "grounding_masks",
                  "grounding_groups", "grounding_task_weight",
                  "spatial_points", "spatial_labels", "spatial_masks",
                  "spatial_valid")
    }
    seg_extras["grounding_target_valid"] = jnp.asarray(batch["grounding_valid"])

    # Live class text: token ids for 4 classes + background at L=7.
    from iuvl_tpu.data.step1 import ClassPromptBank
    from iuvl_tpu.data.tokenizer import build_tokenizer
    from iuvl_tpu.data.class_names import get_class_names

    bank = ClassPromptBank(
        get_class_names("synthetic_seg", num_classes=4),
        build_tokenizer(), text_len=7,
    )
    t = bank.sample(np.random.RandomState(0))
    text_in = {"ids": jnp.asarray(t["ids"]), "mask": jnp.asarray(t["mask"])}

    criterion = SegCriterion(CriterionConfig(num_classes=4))
    tx = build_optimizer(params, base_lr=3e-3, total_steps=20, warmup_iters=0)
    step_fn = make_joint_train_step(
        model, criterion, tx, match_points=64, language_loss_layers=1,
        donate=False,
    )
    state = TrainState.create(params, tx)
    images = jnp.asarray(batch["image"])

    totals = []
    first_metrics = None
    for i in range(6):
        state, metrics = step_fn(
            state, images, text_in, targets, None, seg_extras,
            jax.random.PRNGKey(7),
        )
        if first_metrics is None:
            first_metrics = jax.device_get(metrics)
        totals.append(float(metrics["loss_total"]))

    for key in ("loss_caption_0", "loss_grounding_bce_0",
                "loss_grounding_dice_0", "loss_grounding_ce_0",
                "loss_spatial_bce_0", "loss_spatial_dice_0",
                "loss_mask_ce_0"):
        assert key in first_metrics, sorted(first_metrics)
        assert np.isfinite(first_metrics[key]), key
    assert totals[-1] < totals[0], totals

    # Live text gradient: the text tower's params must have moved.
    old = jax.tree.leaves(
        jax.device_get({"p": params})["p"]["params"]["lang_encoder"]
    )[0]
    new = jax.tree.leaves(
        jax.device_get(state.params)["params"]["lang_encoder"]
    )[0]
    assert not np.allclose(np.asarray(old), np.asarray(new))


def test_trainer_step1_smoke(tmp_path):
    """CLI-level: Trainer drives the step1 stream (extras built from the
    batch, live class prompts) without LOADER.JOINT being set."""
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
        "NUM_CLASSES": 4, "BATCH_SIZE": 1, "STEPS_PER_EPOCH": 2,
        "TRAIN_NUM_POINTS": 64, "MATCH_POINTS": 64, "TEXT_LEN": 7,
        "TOP_LANGUAGE_LAYERS": 1, "LOG_EVERY": 1,
        "SOLVER": {"BASE_LR": 1e-3, "MAX_NUM_EPOCHS": 1, "WARMUP_ITERS": 1},
        "DATASETS": {"TRAIN": ["synthetic_seg_step1"]},
        "SYNTHETIC_SEG_STEP1": {
            "NUM_CLASSES": 4, "IMAGE_SIZE": 64, "MAX_INSTANCES": 3,
            "LENGTH": 4, "TEXT_LEN": 7,
        },
        "SAVE_DIR": str(tmp_path),
    }
    out = Trainer(cfg).train()
    assert out["final_step"] == 2
    assert "loss_caption_0" in out and np.isfinite(out["loss_caption_0"])
    assert "loss_grounding_bce_0" in out
