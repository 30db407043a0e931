"""Parity of the TPU-layout point sampling fast paths against the naive
per-tap clip-and-mask formulation (the reference point_features.py:21
semantics: grid_sample align_corners=False, zero padding)."""

import numpy as np
import jax
import jax.numpy as jnp

from iuvl_tpu.ops.point_sample import (
    build_wide_table,
    point_sample,
    point_sample_from_table,
    point_sample_shared,
)


def _naive_point_sample(masks, coords):
    n, h, w = masks.shape
    x = coords[..., 0] * w - 0.5
    y = coords[..., 1] * h - 0.5
    x0 = np.floor(x)
    y0 = np.floor(y)
    fx = x - x0
    fy = y - y0
    out = np.zeros(coords.shape[:-1], masks.dtype)
    flat = masks.reshape(n, h * w)
    for dy, dx, wgt in (
        (0, 0, (1 - fy) * (1 - fx)),
        (0, 1, (1 - fy) * fx),
        (1, 0, fy * (1 - fx)),
        (1, 1, fy * fx),
    ):
        xi = x0 + dx
        yi = y0 + dy
        valid = (xi >= 0) & (xi <= w - 1) & (yi >= 0) & (yi <= h - 1)
        idx = (np.clip(yi, 0, h - 1).astype(np.int32) * w
               + np.clip(xi, 0, w - 1).astype(np.int32))
        g = np.take_along_axis(flat, idx, axis=1)
        out = out + g * (wgt * valid.astype(masks.dtype))
    return out


def test_point_sample_matches_naive_including_edges():
    rs = np.random.RandomState(0)
    n, h, w, p = 5, 13, 17, 400
    masks = rs.randn(n, h, w).astype(np.float32)
    coords = rs.rand(n, p, 2).astype(np.float32)
    # force plenty of exact-edge and sub-half-pixel cases
    coords[:, :40] = np.array([0.0, 0.0], np.float32)
    coords[:, 40:80] = np.array([1.0, 1.0], np.float32)
    coords[:, 80:120, 0] = 0.01
    coords[:, 120:160, 1] = 0.999
    got = np.asarray(point_sample(jnp.asarray(masks), jnp.asarray(coords)))
    want = _naive_point_sample(masks, coords)
    np.testing.assert_allclose(got, want, rtol=0, atol=1e-6)


def test_point_sample_shared_matches_per_channel():
    rs = np.random.RandomState(1)
    b, c, h, w, p = 2, 7, 9, 11, 123
    masks = rs.randn(b, c, h, w).astype(np.float32)
    coords = rs.rand(b, p, 2).astype(np.float32)
    coords[:, :10] = 0.0
    coords[:, 10:20] = 1.0
    got = np.asarray(
        point_sample_shared(jnp.asarray(masks), jnp.asarray(coords))
    )  # (B, C, P)
    for bi in range(b):
        want = _naive_point_sample(
            masks[bi], np.broadcast_to(coords[bi][None], (c, p, 2))
        )
        np.testing.assert_allclose(got[bi], want, rtol=0, atol=1e-6)


def test_store_dtype_bf16_bitexact_on_binary_masks():
    """The round-5 gt-side fast path: store_dtype=bf16 gather tables are
    BIT-exact for binary masks in both samplers (the criterion's loss and
    the matcher's cost sampling rely on this)."""
    rs = np.random.RandomState(3)
    masks = (rs.rand(4, 33, 29) > 0.5).astype(np.float32)
    coords = rs.rand(4, 333, 2).astype(np.float32)
    coords[:, :8] = 0.0
    coords[:, 8:16] = 1.0
    a = np.asarray(point_sample(jnp.asarray(masks), jnp.asarray(coords)))
    b = np.asarray(point_sample(jnp.asarray(masks), jnp.asarray(coords),
                                store_dtype=jnp.bfloat16))
    np.testing.assert_array_equal(a, b)

    shm = (rs.rand(2, 5, 17, 19) > 0.5).astype(np.float32)
    shc = rs.rand(2, 77, 2).astype(np.float32)
    a = np.asarray(point_sample_shared(jnp.asarray(shm), jnp.asarray(shc)))
    b = np.asarray(point_sample_shared(jnp.asarray(shm), jnp.asarray(shc),
                                       store_dtype=jnp.bfloat16))
    np.testing.assert_array_equal(a, b)


def test_wide_table_bf16_exact_on_binary_masks():
    # bf16 storage is exact for {0,1} gt; f32 weight math makes the table
    # path bit-identical to point_sample on float32 binary masks.
    rs = np.random.RandomState(3)
    n, h, w, p = 4, 13, 17, 300
    masks = (rs.rand(n, h, w) > 0.6).astype(np.float32)
    coords = rs.rand(n, p, 2).astype(np.float32)
    coords[:, :20] = 0.0
    coords[:, 20:40] = 1.0
    table = build_wide_table(jnp.asarray(masks), store_dtype=jnp.bfloat16)
    got = np.asarray(point_sample_from_table(table, jnp.asarray(coords)))
    want = np.asarray(point_sample(jnp.asarray(masks), jnp.asarray(coords)))
    np.testing.assert_array_equal(got, want)


def test_wide_table_f32_matches_naive_general_maps():
    rs = np.random.RandomState(4)
    n, h, w, p = 3, 9, 11, 200
    masks = rs.randn(n, h, w).astype(np.float32)
    coords = rs.rand(n, p, 2).astype(np.float32)
    table = build_wide_table(jnp.asarray(masks))
    got = np.asarray(point_sample_from_table(table, jnp.asarray(coords)))
    want = _naive_point_sample(masks, coords)
    np.testing.assert_allclose(got, want, rtol=0, atol=1e-6)


def test_criterion_gt_table_matches_default_losses():
    # The opt-in shared-gt-table path (CriterionConfig.gt_table_dtype) must
    # produce the same losses as the default per-layer rebuild — bit-exact
    # for binary gt in bf16 storage.
    from iuvl_tpu.losses.criterion import (
        CriterionConfig, SegCriterion, SegTargets,
    )

    rs = np.random.RandomState(5)
    b, q, t, k, hp, hg = 2, 8, 3, 6, 16, 32
    targets = SegTargets(
        labels=jnp.asarray(rs.randint(0, k - 1, (b, t)), jnp.int32),
        masks=jnp.asarray(rs.rand(b, t, hg, hg) > 0.5, jnp.float32),
        valid=jnp.asarray(rs.rand(b, t) > 0.3),
    )
    outputs = {
        "pred_logits": jnp.asarray(rs.randn(b, q, k), jnp.float32),
        "pred_masks": jnp.asarray(rs.randn(b, q, hp, hp), jnp.float32),
        "pred_boxes": None,
        "aux_outputs": [],
    }
    rng = jax.random.PRNGKey(3)
    base = SegCriterion(CriterionConfig(num_classes=k - 1, num_points=32))(
        rng, outputs, targets, match_points=32
    )
    for dt in ("float32", "bfloat16"):
        got = SegCriterion(
            CriterionConfig(num_classes=k - 1, num_points=32,
                            gt_table_dtype=dt)
        )(rng, outputs, targets, match_points=32)
        assert base.keys() == got.keys()
        for key in base:
            np.testing.assert_array_equal(
                np.asarray(base[key]), np.asarray(got[key]), err_msg=key
            )


def test_point_sample_gradients_flow():
    rs = np.random.RandomState(2)
    masks = jnp.asarray(rs.randn(3, 8, 8).astype(np.float32))
    coords = jnp.asarray(rs.rand(3, 16, 2).astype(np.float32))
    g = jax.grad(lambda m: point_sample(m, coords).sum())(masks)
    assert np.isfinite(np.asarray(g)).all()
    gs = jax.grad(
        lambda m: point_sample_shared(m, coords).sum()
    )(jnp.asarray(rs.randn(3, 4, 8, 8).astype(np.float32)))
    assert np.isfinite(np.asarray(gs)).all()


def test_point_sample_trainable_grad_matches_plain():
    """Round-4 custom VJP (Pallas tap scatter on TPU, XLA scatter off-TPU):
    d_masks matches autodiff of the plain point_sample, including
    out-of-bounds coords (zero-weight taps)."""
    import jax

    from iuvl_tpu.ops.point_sample import point_sample, point_sample_trainable

    rs = np.random.RandomState(5)
    n, h, w, p = 3, 9, 7, 23
    masks = jnp.asarray(rs.randn(n, h, w).astype(np.float32))
    coords = jnp.asarray(rs.uniform(-0.2, 1.2, (n, p, 2)).astype(np.float32))

    def loss(fn):
        return jax.grad(
            lambda m: (fn(m, coords) ** 2).sum()
        )(masks)

    g_ref = loss(point_sample)
    g_new = loss(point_sample_trainable)
    np.testing.assert_allclose(np.asarray(g_new), np.asarray(g_ref),
                               atol=1e-5)


def test_tap_scatter_interpret_matches_xla_scatter():
    """The Pallas tap-scatter kernel (interpret mode) vs .at[].add."""
    import jax
    import jax.experimental.pallas as pl

    from iuvl_tpu.ops.pallas import tap_scatter as ts

    rs = np.random.RandomState(6)
    n, p, span = 2, 17, 40
    base = jnp.asarray(rs.randint(0, span, (n, p)), jnp.int32)
    rows = jnp.asarray(rs.randn(n, p, 4).astype(np.float32))

    ref = np.zeros((n, span, 4), np.float32)
    for i in range(n):
        for j in range(p):
            ref[i, int(base[i, j])] += np.asarray(rows)[i, j]

    orig = pl.pallas_call

    def interp(*a, **kw):
        kw["interpret"] = True
        return orig(*a, **kw)

    ts.pl.pallas_call = interp
    try:
        out = ts.tap_scatter(base, rows, span)
    finally:
        ts.pl.pallas_call = orig
    np.testing.assert_allclose(np.asarray(out), ref, atol=1e-6)
