import jax
import jax.numpy as jnp
import numpy as np

from iuvl_tpu.losses.grounding import (
    GroundingConfig,
    GroundingTargets,
    captioning_loss,
    grounding_losses,
    retrieval_loss,
)
from iuvl_tpu.losses.language import (
    contrastive_loss,
    ql_multi_contrastive_loss,
    soft_cross_entropy,
    vl_similarity,
)


def _norm(x):
    return x / (np.linalg.norm(x, axis=-1, keepdims=True) + 1e-7)


def test_contrastive_loss_prefers_aligned():
    rs = np.random.RandomState(0)
    v = jnp.asarray(_norm(rs.randn(6, 16)).astype(np.float32))
    scale = jnp.asarray(np.log(10.0), jnp.float32)
    aligned = contrastive_loss(v, v, scale)
    shuffled = contrastive_loss(v, v[::-1], scale)
    assert float(aligned) < float(shuffled)


def test_ql_multi_groups_share_credit():
    rs = np.random.RandomState(1)
    t = _norm(rs.randn(4, 8)).astype(np.float32)
    t[1] = t[0]  # duplicate text
    group = np.eye(4, dtype=np.float32)
    group[0, 1] = group[1, 0] = 1
    v = t.copy()
    loss = ql_multi_contrastive_loss(
        jnp.asarray(v), jnp.asarray(t), jnp.asarray(group),
        jnp.asarray(np.log(10.0), jnp.float32),
    )
    assert np.isfinite(float(loss))
    # v[0] matching either t[0] or t[1] must not be penalized vs unique match
    sim = vl_similarity(jnp.asarray(v), jnp.asarray(t), jnp.asarray(np.log(10.0)))
    assert sim.shape == (4, 4)


def test_soft_cross_entropy_onehot_equals_ce():
    logits = jnp.asarray(np.random.RandomState(2).randn(3, 5).astype(np.float32))
    onehot = jax.nn.one_hot(jnp.asarray([1, 0, 4]), 5)
    sce = soft_cross_entropy(logits, onehot)
    ce = -jnp.take_along_axis(
        jax.nn.log_softmax(logits, -1), jnp.asarray([[1], [0], [4]]), 1
    ).mean()
    np.testing.assert_allclose(float(sce), float(ce), rtol=1e-6)


def test_grounding_losses_shapes_and_finite():
    rs = np.random.RandomState(3)
    b, q, g, h, w, d = 2, 6, 3, 16, 16, 8
    pred_gmasks = jnp.asarray(rs.randn(b, q, h, w).astype(np.float32))
    pred_gtexts = jnp.asarray(rs.randn(b, q, d).astype(np.float32))
    masks = (rs.rand(b, g, h, w) > 0.5).astype(np.float32)
    targets = GroundingTargets(
        masks=jnp.asarray(masks),
        class_embs=jnp.asarray(rs.randn(b, g, d).astype(np.float32)),
        group_matrix=jnp.broadcast_to(jnp.eye(g), (b, g, g)),
        valid=jnp.asarray([[True, True, False], [True, True, True]]),
        task_weight=jnp.asarray([2.0, 0.5]),
    )
    losses = grounding_losses(
        jax.random.PRNGKey(0), pred_gmasks, pred_gtexts, targets,
        jnp.asarray(0.0, jnp.float32), GroundingConfig(num_points=64),
    )
    assert set(losses) == {
        "loss_grounding_bce_0", "loss_grounding_dice_0", "loss_grounding_ce_0"
    }
    for v in losses.values():
        assert np.isfinite(float(v))


def test_captioning_loss_perfect_prediction_low():
    rs = np.random.RandomState(4)
    vocab, d, t = 12, 8, 5
    table = _norm(rs.randn(vocab, d)).astype(np.float32) * 10
    ids = np.array([[1, 3, 5, 7, 0]])
    mask = np.array([[1, 1, 1, 1, 0]])
    # pred at position i should predict token at i+1
    pred = np.stack([table[ids[0, i + 1]] if i + 1 < t else table[0]
                     for i in range(t)])[None]
    good = captioning_loss(
        jnp.asarray(pred), jnp.asarray(table), jnp.asarray(ids), jnp.asarray(mask)
    )
    bad = captioning_loss(
        jnp.asarray(-pred), jnp.asarray(table), jnp.asarray(ids), jnp.asarray(mask)
    )
    assert float(good) < float(bad)


def test_retrieval_loss_finite():
    rs = np.random.RandomState(5)
    v = jnp.asarray(rs.randn(4, 8).astype(np.float32))
    t = jnp.asarray(rs.randn(4, 8).astype(np.float32))
    loss = retrieval_loss(v, t, jnp.asarray(0.0, jnp.float32))
    assert np.isfinite(float(loss))


def test_caption_loss_finite_and_sensible():
    from iuvl_tpu.losses.grounding import caption_loss

    rs = np.random.RandomState(7)
    b, q, t, p, d, k = 2, 8, 2, 3, 16, 5
    pred = jnp.asarray(rs.randn(b, q, d).astype(np.float32))
    assigned = jnp.asarray([[0, 3], [2, 5]], jnp.int32)
    labels = jnp.asarray([[1, 4], [0, 2]], jnp.int32)
    valid = jnp.ones((b, t), bool)
    class_emb = jnp.asarray(_norm(rs.randn(k, d)).astype(np.float32))
    phr = jnp.asarray(_norm(rs.randn(b, p, d)).astype(np.float32))
    phr_valid = jnp.asarray([[True, True, False], [True, False, False]])
    groups = jnp.broadcast_to(jnp.eye(p), (b, p, p))
    loss = caption_loss(
        jax.random.PRNGKey(0), pred, assigned, labels, valid, class_emb,
        phr, phr_valid, groups, jnp.asarray(np.log(10.0), jnp.float32),
    )
    assert np.isfinite(float(loss))

    # Aligned predictions should score lower loss than random.
    aligned_pred = jnp.zeros((b, q, d))
    t_matched = jnp.take(class_emb, labels, axis=0)
    aligned_pred = jax.vmap(
        lambda ap, a, tm: ap.at[a].set(tm * 10)
    )(aligned_pred, assigned, t_matched)
    # place phrase targets at distinct free query slots
    aligned_pred = jax.vmap(
        lambda ap, ph: ap.at[jnp.asarray([6, 7, 1])].set(ph * 10)
    )(aligned_pred, phr)
    loss_aligned = caption_loss(
        jax.random.PRNGKey(0), aligned_pred, assigned, labels, valid,
        class_emb, phr, phr_valid, groups, jnp.asarray(np.log(10.0)),
    )
    assert float(loss_aligned) < float(loss)


def test_openimage_losses():
    """Openimage mode: CE favors the positive class of the matched query;
    a query aligned with its class embedding drives the CE down."""
    import jax
    import jax.numpy as jnp

    from iuvl_tpu.losses.openimage import openimage_losses

    rs = np.random.RandomState(0)
    b, q, t, n, d, h, w = 1, 4, 2, 6, 16, 8, 8
    pos = rs.randn(b, t, d).astype(np.float32)
    neg = rs.randn(n, d).astype(np.float32)
    tgt_masks = np.zeros((b, t, h, w), np.float32)
    tgt_masks[0, 0, :4] = 1.0
    tgt_masks[0, 1, 4:] = 1.0

    # Aligned: queries 0/1 carry the pos embeddings and the right masks.
    caps = rs.randn(b, q, d).astype(np.float32) * 0.01
    caps[0, 0] = pos[0, 0] * 5
    caps[0, 1] = pos[0, 1] * 5
    pred_masks = np.full((b, q, h, w), -8.0, np.float32)
    pred_masks[0, 0, :4] = 8.0
    pred_masks[0, 1, 4:] = 8.0

    good = openimage_losses(
        jax.random.PRNGKey(0), jnp.asarray(caps), jnp.asarray(pred_masks),
        jnp.asarray(pos), jnp.asarray(tgt_masks), jnp.ones((b, t), bool),
        jnp.asarray(neg), jnp.asarray(2.0), num_points=64,
    )
    # Misaligned: query embeddings point at negatives.
    caps_bad = caps.copy()
    caps_bad[0, 0] = neg[0] * 5
    caps_bad[0, 1] = neg[1] * 5
    bad = openimage_losses(
        jax.random.PRNGKey(0), jnp.asarray(caps_bad), jnp.asarray(pred_masks),
        jnp.asarray(pos), jnp.asarray(tgt_masks), jnp.ones((b, t), bool),
        jnp.asarray(neg), jnp.asarray(2.0), num_points=64,
    )
    for k, v in good.items():
        assert np.isfinite(float(v)), k
    assert float(good["loss_openimage_ce_0"]) < float(bad["loss_openimage_ce_0"])
    # bce/dice reflect the (boundary-band) point sampling; just require the
    # matched masks to be clearly better than chance.
    assert float(good["loss_openimage_dice_0"]) < 0.2
