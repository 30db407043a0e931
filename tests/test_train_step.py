"""Train-step tests: loss computation with Hungarian host callback, one
optimizer update, and execution over an 8-device data-parallel mesh (the
TPU-native analog of the reference's DDP path, SURVEY.md §5)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from iuvl_tpu.losses.criterion import CriterionConfig, SegCriterion, SegTargets
from iuvl_tpu.losses.matcher import compute_match_cost, hungarian_match
from iuvl_tpu.runtime.mesh import MeshSpec, create_mesh
from iuvl_tpu.train.optimizer import build_optimizer
from iuvl_tpu.train.train_step import TrainState, make_train_step


def test_hungarian_matches_identity_on_diagonal_cost():
    cost = jnp.asarray(
        np.array([[[0.0, 10.0], [10.0, 0.0], [5.0, 5.0]]])  # (1, Q=3, T=2)
    )
    assigned = hungarian_match(cost)
    np.testing.assert_array_equal(np.asarray(assigned), [[0, 1]])


def test_match_cost_prefers_correct_query():
    rs = np.random.RandomState(0)
    q, t, h, w = 4, 2, 8, 8
    pred_masks = jnp.asarray(np.full((1, q, h, w), -8.0, np.float32))
    # query 2 covers target 0's region, query 0 covers target 1's region
    pred_masks = pred_masks.at[0, 2, :4].set(8.0)
    pred_masks = pred_masks.at[0, 0, 4:].set(8.0)
    tgt_masks = np.zeros((1, t, h, w), np.float32)
    tgt_masks[0, 0, :4] = 1.0
    tgt_masks[0, 1, 4:] = 1.0
    pred_logits = jnp.asarray(rs.randn(1, q, 3).astype(np.float32)) * 0.01
    cost = compute_match_cost(
        jax.random.PRNGKey(0), pred_logits, pred_masks,
        jnp.zeros((1, t), jnp.int32), jnp.asarray(tgt_masks),
        jnp.ones((1, t), bool), num_points=256,
    )
    assigned = np.asarray(hungarian_match(cost))
    assert assigned[0, 0] == 2 and assigned[0, 1] == 0


@pytest.fixture(scope="module")
def tiny_setup():
    from tests.test_syslearner import _tiny_model

    model = _tiny_model()
    images = jnp.zeros((1, 64, 64, 3), jnp.float32)
    text_emb = jnp.ones((5, 32), jnp.float32)
    params = model.init(
        jax.random.PRNGKey(0), images, text_emb, method=type(model).warmup
    )
    return model, params


def _targets(b, t=3, h=16, w=16):
    rs = np.random.RandomState(5)
    masks = (rs.rand(b, t, h, w) > 0.5).astype(np.float32)
    return SegTargets(
        labels=jnp.asarray(rs.randint(0, 4, (b, t)), jnp.int32),
        masks=jnp.asarray(masks),
        valid=jnp.asarray(np.tile([True, True, False], (b, 1))),
    )


def test_train_step_updates_params(tiny_setup):
    model, params = tiny_setup
    criterion = SegCriterion(CriterionConfig(num_classes=4))
    tx = build_optimizer(params, base_lr=1e-3, total_steps=100)
    step_fn = make_train_step(model, criterion, tx, match_points=64, donate=False)

    state = TrainState.create(params, tx)
    images = jnp.asarray(
        np.random.RandomState(1).rand(1, 64, 64, 3).astype(np.float32) * 255
    )
    text_emb = jnp.ones((5, 32), jnp.float32)
    new_state, metrics = step_fn(
        state, images, text_emb, _targets(1), jax.random.PRNGKey(2)
    )
    assert np.isfinite(float(metrics["loss_total"]))
    assert int(new_state.step) == 1
    # 10 layers x 3 seg losses
    assert sum(1 for k in metrics if k.startswith("loss_mask_ce")) == 10
    # params changed
    old = jax.tree.leaves(params)[0]
    new = jax.tree.leaves(new_state.params)[0]
    assert not np.allclose(np.asarray(old), np.asarray(new))


def test_train_step_data_parallel_mesh(tiny_setup):
    model, params = tiny_setup
    mesh = create_mesh(MeshSpec(data=8, model=1))
    criterion = SegCriterion(CriterionConfig(num_classes=4))
    tx = build_optimizer(params, base_lr=1e-3, total_steps=100)
    step_fn = make_train_step(model, criterion, tx, match_points=64, donate=False)

    replicated = NamedSharding(mesh, P())
    data_sharded = NamedSharding(mesh, P("data"))
    params_r = jax.device_put(params, replicated)
    state = TrainState.create(params_r, tx)
    state = jax.device_put(state, replicated)

    b = 8
    images = jax.device_put(
        jnp.asarray(np.random.RandomState(2).rand(b, 64, 64, 3) * 255, jnp.float32),
        data_sharded,
    )
    text_emb = jax.device_put(jnp.ones((5, 32), jnp.float32), replicated)
    tgt = _targets(b)
    tgt = SegTargets(
        labels=jax.device_put(tgt.labels, data_sharded),
        masks=jax.device_put(tgt.masks, data_sharded),
        valid=jax.device_put(tgt.valid, data_sharded),
    )
    new_state, metrics = step_fn(state, images, text_emb, tgt, jax.random.PRNGKey(3))
    assert np.isfinite(float(metrics["loss_total"]))


def test_top_mask_layers_keeps_final_trims_early_aux():
    """Reference top_x_layers semantics: the final layer's loss (suffix _0)
    is ALWAYS kept; top_mask_layers trims the earliest aux layers."""
    rs = np.random.RandomState(0)
    q, t, h, w = 4, 2, 8, 8

    def layer():
        return {
            "pred_logits": jnp.asarray(rs.randn(1, q, 5).astype(np.float32)),
            "pred_masks": jnp.asarray(rs.randn(1, q, h, w).astype(np.float32)),
        }

    final = layer()
    outputs = {"aux_outputs": [layer(), layer()], **final}
    tgt = SegTargets(
        labels=jnp.zeros((1, t), jnp.int32),
        masks=jnp.asarray((rs.rand(1, t, h, w) > 0.5).astype(np.float32)),
        valid=jnp.ones((1, t), bool),
    )
    crit = SegCriterion(CriterionConfig(num_classes=4, top_mask_layers=2))
    losses = crit(jax.random.PRNGKey(0), outputs, tgt, match_points=16)
    suffixes = sorted(
        k.rsplit("_", 1)[1] for k in losses if k.startswith("loss_mask_ce")
    )
    # 3 layers, top=2 -> final (_0) + last aux (_2); first aux (_1) trimmed
    assert suffixes == ["0", "2"], suffixes


def test_detection_head_box_losses_fire():
    """DETECTION on: the decoder emits pred_boxes per layer and the
    criterion adds loss_bbox/loss_giou (reference task_switch['bbox'])."""
    from tests.test_syslearner import _tiny_model
    from iuvl_tpu.models.xdecoder.model import SysLearner

    model = _tiny_model(detection=True)
    images = jnp.zeros((1, 64, 64, 3), jnp.float32)
    text_emb = jnp.ones((5, 32), jnp.float32)
    params = model.init(
        jax.random.PRNGKey(0), images, text_emb, method=type(model).warmup
    )
    out = model.apply(params, images, text_emb, method=SysLearner.forward_seg)
    assert out["pred_boxes"].shape[-1] == 4
    assert float(out["pred_boxes"].min()) >= 0.0
    assert float(out["pred_boxes"].max()) <= 1.0

    from iuvl_tpu.train.train_step import split_seg_outputs

    obj, _ = split_seg_outputs(out, model.cfg.num_queries)
    tgt = _targets(1)
    tgt = SegTargets(
        labels=tgt.labels, masks=tgt.masks, valid=tgt.valid,
        boxes=jnp.asarray(
            np.random.RandomState(0).rand(1, 3, 4).astype(np.float32) * 0.5
        ),
    )
    crit = SegCriterion(CriterionConfig(num_classes=4, top_mask_layers=1))
    losses = crit(jax.random.PRNGKey(0), obj, tgt, match_points=16)
    assert "loss_bbox_0" in losses and "loss_giou_0" in losses
    assert np.isfinite(float(losses["loss_bbox_0"]))


def test_loss_boxes():
    from iuvl_tpu.losses.criterion import CriterionConfig, SegCriterion

    crit = SegCriterion(CriterionConfig(num_classes=4))
    pred = jnp.asarray([[[0.5, 0.5, 0.2, 0.2], [0.1, 0.1, 0.1, 0.1],
                         [0.9, 0.9, 0.1, 0.1]]])
    tgt = jnp.asarray([[[0.5, 0.5, 0.2, 0.2], [0.9, 0.9, 0.1, 0.1]]])
    valid = jnp.ones((1, 2), bool)
    assigned = jnp.asarray([[0, 2]], jnp.int32)
    l1, giou = crit.loss_boxes(pred, tgt, valid, assigned, 2.0)
    np.testing.assert_allclose(float(l1), 0.0, atol=1e-6)
    np.testing.assert_allclose(float(giou), 0.0, atol=1e-6)
    # mismatched assignment increases both
    bad = jnp.asarray([[1, 1]], jnp.int32)
    l1b, gioub = crit.loss_boxes(pred, tgt, valid, bad, 2.0)
    assert float(l1b) > 0 and float(gioub) > 0
