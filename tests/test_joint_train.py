"""Joint seg + vlp train step (the reference's JointLoader training)."""

import jax
import jax.numpy as jnp
import numpy as np

from iuvl_tpu.losses.criterion import CriterionConfig, SegCriterion, SegTargets
from iuvl_tpu.train.optimizer import build_optimizer
from iuvl_tpu.train.train_step import TrainState, make_joint_train_step


def test_joint_step_seg_plus_vlp():
    from tests.test_syslearner import _tiny_model
    from iuvl_tpu.models.xdecoder.model import SysLearner

    model = _tiny_model()
    images = jnp.zeros((1, 64, 64, 3), jnp.float32)
    text_emb = jnp.ones((5, 32), jnp.float32)
    params = model.init(
        jax.random.PRNGKey(0), images, text_emb, method=SysLearner.warmup
    )
    criterion = SegCriterion(CriterionConfig(num_classes=4))
    tx = build_optimizer(params, base_lr=1e-3, total_steps=10)
    step_fn = make_joint_train_step(
        model, criterion, tx, match_points=64, donate=False
    )
    state = TrainState.create(params, tx)

    rs = np.random.RandomState(0)
    targets = SegTargets(
        labels=jnp.asarray(rs.randint(0, 4, (1, 2)), jnp.int32),
        masks=jnp.asarray((rs.rand(1, 2, 16, 16) > 0.5).astype(np.float32)),
        valid=jnp.ones((1, 2), bool),
    )
    cap_ids = np.zeros((1, 7), np.int32)
    cap_ids[0, :4] = [60, 10, 20, 63]
    cap_mask = np.zeros((1, 7), np.int32)
    cap_mask[0, :4] = 1
    vlp_batch = {
        "images": jnp.asarray(rs.rand(1, 64, 64, 3).astype(np.float32) * 255),
        "caption_ids": jnp.asarray(cap_ids),
        "caption_mask": jnp.asarray(cap_mask),
    }
    new_state, metrics = step_fn(
        state, jnp.asarray(rs.rand(1, 64, 64, 3).astype(np.float32) * 255),
        text_emb, targets, vlp_batch, None, jax.random.PRNGKey(1),
    )
    assert np.isfinite(float(metrics["loss_total"]))
    assert "loss_captioning_0" in metrics
    assert "loss_retrieval_decoder_0" in metrics
    assert np.isfinite(float(metrics["loss_captioning_0"]))
    assert int(new_state.step) == 1


def test_joint_step_with_grounding_and_caption_stream():
    from tests.test_syslearner import _tiny_model
    from iuvl_tpu.models.xdecoder.model import SysLearner

    model = _tiny_model()
    images = jnp.zeros((1, 64, 64, 3), jnp.float32)
    text_emb = jnp.ones((5, 32), jnp.float32)
    params = model.init(
        jax.random.PRNGKey(0), images, text_emb, method=SysLearner.warmup
    )
    criterion = SegCriterion(CriterionConfig(num_classes=4))
    tx = build_optimizer(params, base_lr=1e-3, total_steps=10)
    step_fn = make_joint_train_step(
        model, criterion, tx, match_points=64, language_loss_layers=2,
        donate=False,
    )
    state = TrainState.create(params, tx)

    rs = np.random.RandomState(1)
    targets = SegTargets(
        labels=jnp.asarray(rs.randint(0, 4, (1, 2)), jnp.int32),
        masks=jnp.asarray((rs.rand(1, 2, 16, 16) > 0.5).astype(np.float32)),
        valid=jnp.ones((1, 2), bool),
    )
    G, P = 3, 2
    seg_extras = {
        "grounding_tokens": jnp.asarray(rs.randn(1, G, 32).astype(np.float32)),
        "grounding_valid": jnp.asarray([[True, True, False]]),
        "grounding_masks": jnp.asarray(
            (rs.rand(1, G, 16, 16) > 0.5).astype(np.float32)),
        "grounding_class_embs": jnp.asarray(rs.randn(1, G, 32).astype(np.float32)),
        "grounding_groups": jnp.broadcast_to(jnp.eye(G), (1, G, G)),
        "grounding_target_valid": jnp.asarray([[True, True, False]]),
        "grounding_task_weight": jnp.asarray([2.0]),
        "phrase_embs": jnp.asarray(rs.randn(1, P, 32).astype(np.float32)),
        "phrase_valid": jnp.ones((1, P), bool),
        "phrase_groups": jnp.broadcast_to(jnp.eye(P), (1, P, P)),
    }
    new_state, metrics = step_fn(
        state, jnp.asarray(rs.rand(1, 64, 64, 3).astype(np.float32) * 255),
        text_emb, targets, None, seg_extras, jax.random.PRNGKey(2),
    )
    for key in ("loss_grounding_bce_0", "loss_grounding_dice_0",
                "loss_grounding_ce_0", "loss_caption_0",
                "loss_grounding_bce_9", "loss_caption_9"):
        assert key in metrics and np.isfinite(float(metrics[key])), key
    assert int(new_state.step) == 1
