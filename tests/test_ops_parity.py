"""Op-level parity vs the reference's pure-PyTorch oracles — mirrors the
reference kernel test strategy (modeling/vision/encoder/ops/test.py)."""

import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")
sys.path.insert(0, "/root/reference")

import jax.numpy as jnp  # noqa: E402

from iuvl_tpu.ops.msdeform import ms_deform_attn_core  # noqa: E402
from iuvl_tpu.ops.position_embedding import position_embedding_sine  # noqa: E402


def _torch_msdeform(value, shapes, loc, w):
    import torch.nn.functional as F

    N_, S_, M_, D_ = value.shape
    _, Lq_, _, L_, P_, _ = loc.shape
    value_list = value.split([h * w_ for h, w_ in shapes], dim=1)
    grids = 2 * loc - 1
    sampled = []
    for lid, (H_, W_) in enumerate(shapes):
        v = value_list[lid].flatten(2).transpose(1, 2).reshape(N_ * M_, D_, H_, W_)
        g = grids[:, :, :, lid].transpose(1, 2).flatten(0, 1)
        sampled.append(
            F.grid_sample(v, g, mode="bilinear", padding_mode="zeros", align_corners=False)
        )
    aw = w.transpose(1, 2).reshape(N_ * M_, 1, Lq_, L_ * P_)
    out = (torch.stack(sampled, dim=-2).flatten(-2) * aw).sum(-1).view(N_, M_ * D_, Lq_)
    return out.transpose(1, 2).contiguous()


def test_msdeform_matches_grid_sample_oracle():
    rs = np.random.RandomState(0)
    shapes = [(8, 12), (4, 6), (2, 3)]
    S = sum(h * w for h, w in shapes)
    B, Lq, M, D, L, P = 2, 7, 4, 16, 3, 4
    value = rs.randn(B, S, M, D).astype(np.float32)
    # Locations mostly in [0,1] with some out of bounds to test zero padding.
    loc = rs.uniform(-0.2, 1.2, size=(B, Lq, M, L, P, 2)).astype(np.float32)
    w = rs.rand(B, Lq, M, L, P).astype(np.float32)
    w /= w.reshape(B, Lq, M, -1).sum(-1)[..., None, None]

    ref = _torch_msdeform(
        torch.from_numpy(value), shapes, torch.from_numpy(loc), torch.from_numpy(w)
    ).numpy()
    ours = np.asarray(
        ms_deform_attn_core(jnp.asarray(value), shapes, jnp.asarray(loc), jnp.asarray(w))
    )
    np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_msdeform_grad_finite():
    import jax

    shapes = [(4, 4), (2, 2)]
    S = sum(h * w for h, w in shapes)
    rs = np.random.RandomState(1)
    value = jnp.asarray(rs.randn(1, S, 2, 8).astype(np.float32))
    loc = jnp.asarray(rs.rand(1, 5, 2, 2, 3, 2).astype(np.float32))
    w = jax.nn.softmax(jnp.asarray(rs.randn(1, 5, 2, 2, 3).astype(np.float32)))

    def f(v, l, w_):
        return ms_deform_attn_core(v, shapes, l, w_).sum()

    grads = jax.grad(f, argnums=(0, 1, 2))(value, loc, w)
    for g in grads:
        assert np.isfinite(np.asarray(g)).all()


def test_sine_position_embedding_parity():
    # Load the reference file directly; its package __init__ pulls in
    # detectron2 which isn't installed.
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "ref_pos_enc", "/root/reference/modeling/modules/position_encoding.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    PositionEmbeddingSine = mod.PositionEmbeddingSine

    pe_t = PositionEmbeddingSine(64, normalize=True)
    x = torch.zeros(1, 128, 6, 9)
    ref = pe_t(x).numpy().transpose(0, 2, 3, 1)[0]  # (6, 9, 128)
    ours = np.asarray(position_embedding_sine(6, 9, num_pos_feats=64))
    np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_msdeform_patch_gather_matches_oracle():
    rs = np.random.RandomState(4)
    shapes = [(8, 12), (4, 6)]
    S = sum(h * w for h, w in shapes)
    B, Lq, M, D, L, P = 1, 9, 2, 8, 2, 3
    value = rs.randn(B, S, M, D).astype(np.float32)
    loc = rs.uniform(-0.2, 1.2, size=(B, Lq, M, L, P, 2)).astype(np.float32)
    w = rs.rand(B, Lq, M, L, P).astype(np.float32)
    w /= w.reshape(B, Lq, M, -1).sum(-1)[..., None, None]
    ref = np.asarray(
        ms_deform_attn_core(jnp.asarray(value), shapes, jnp.asarray(loc),
                            jnp.asarray(w), impl="xla")
    )
    ours = np.asarray(
        ms_deform_attn_core(jnp.asarray(value), shapes, jnp.asarray(loc),
                            jnp.asarray(w), impl="xla_patch")
    )
    np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_msdeform_wide_gather_matches_torch_oracle():
    """'wide' (all-taps-in-one-row) vs the grid_sample oracle, including
    out-of-bounds locations exercising every clip/wrap edge case."""
    rs = np.random.RandomState(11)
    shapes = [(8, 12), (4, 6), (2, 3)]
    S = sum(h * w for h, w in shapes)
    B, Lq, M, D, L, P = 2, 7, 4, 16, 3, 4
    value = rs.randn(B, S, M, D).astype(np.float32)
    loc = rs.uniform(-0.2, 1.2, size=(B, Lq, M, L, P, 2)).astype(np.float32)
    w = rs.rand(B, Lq, M, L, P).astype(np.float32)
    w /= w.reshape(B, Lq, M, -1).sum(-1)[..., None, None]

    ref = _torch_msdeform(
        torch.from_numpy(value), shapes, torch.from_numpy(loc),
        torch.from_numpy(w),
    ).numpy()
    ours = np.asarray(
        ms_deform_attn_core(jnp.asarray(value), shapes, jnp.asarray(loc),
                            jnp.asarray(w), impl="wide")
    )
    np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_msdeform_wide_grad_matches_xla():
    import jax

    rs = np.random.RandomState(12)
    shapes = [(4, 4), (2, 2)]
    S = sum(h * w for h, w in shapes)
    B, Lq, M, D, L, P = 1, 5, 2, 8, 2, 2
    value = rs.randn(B, S, M, D).astype(np.float32)
    loc = rs.uniform(0.05, 0.95, size=(B, Lq, M, L, P, 2)).astype(np.float32)
    w = rs.rand(B, Lq, M, L, P).astype(np.float32)

    def loss(impl):
        def f(v, l, a):
            return ms_deform_attn_core(v, shapes, l, a, impl=impl).sum()
        return jax.grad(f, argnums=(0, 1, 2))(
            jnp.asarray(value), jnp.asarray(loc), jnp.asarray(w)
        )

    g_ref = loss("xla")
    g_wide = loss("wide")
    for a, b in zip(g_ref, g_wide):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_onehot_level_matches_wide():
    """Pallas one-hot deformable sampling (interpret mode) vs the wide XLA
    gather oracle, including out-of-bounds locations and grad parity."""
    import jax
    import jax.numpy as jnp
    import jax.experimental.pallas as pl
    from iuvl_tpu.ops import msdeform as md
    from iuvl_tpu.ops.pallas import onehot_gather as og

    rng = jax.random.PRNGKey(0)
    b, nh, h, w, d, lq, p = 1, 2, 8, 8, 16, 40, 4
    v = jax.random.normal(rng, (b, nh, h * w, d), jnp.float32)
    # locations spanning out-of-bounds on both sides
    x = jax.random.uniform(jax.random.fold_in(rng, 1), (b, nh, lq, p)) * (w + 4) - 2
    y = jax.random.uniform(jax.random.fold_in(rng, 2), (b, nh, lq, p)) * (h + 4) - 2
    aw = jax.nn.softmax(
        jax.random.normal(jax.random.fold_in(rng, 3), (b, nh, lq, p)), -1
    )

    ref = md._level_contribution_wide_xla(v, h, w, x, y, aw)

    orig = pl.pallas_call

    def interp(*a, **kw):
        kw["interpret"] = True
        return orig(*a, **kw)

    og.pl.pallas_call = interp
    try:
        out = md._level_contribution_onehot(v, h, w, x, y, aw)
        g_fast = jax.grad(
            lambda vv, aww: (md._level_contribution_onehot(vv, h, w, x, y, aww) ** 2).sum(),
            argnums=(0, 1),
        )(v, aw)
    finally:
        og.pl.pallas_call = orig

    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)
    g_ref = jax.grad(
        lambda vv, aww: (md._level_contribution_wide_xla(vv, h, w, x, y, aww) ** 2).sum(),
        argnums=(0, 1),
    )(v, aw)
    for a, b_ in zip(g_fast, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), atol=1e-4)


def test_msdeform_scan_matches_torch_oracle():
    """'scan' (per-level gathers as lax.scan steps over stacked padded
    maps) vs the grid_sample oracle, out-of-bounds locations included."""
    rs = np.random.RandomState(21)
    shapes = [(8, 12), (4, 6), (2, 3)]
    S = sum(h * w for h, w in shapes)
    B, Lq, M, D, L, P = 2, 7, 4, 16, 3, 4
    value = rs.randn(B, S, M, D).astype(np.float32)
    loc = rs.uniform(-0.2, 1.2, size=(B, Lq, M, L, P, 2)).astype(np.float32)
    w = rs.rand(B, Lq, M, L, P).astype(np.float32)
    w /= w.reshape(B, Lq, M, -1).sum(-1)[..., None, None]

    ref = _torch_msdeform(
        torch.from_numpy(value), shapes, torch.from_numpy(loc),
        torch.from_numpy(w),
    ).numpy()
    ours = np.asarray(
        ms_deform_attn_core(jnp.asarray(value), shapes, jnp.asarray(loc),
                            jnp.asarray(w), impl="scan")
    )
    np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_msdeform_scan_grad_matches_xla():
    import jax

    rs = np.random.RandomState(22)
    shapes = [(4, 4), (2, 2)]
    S = sum(h * w for h, w in shapes)
    B, Lq, M, D, L, P = 1, 5, 2, 8, 2, 2
    value = rs.randn(B, S, M, D).astype(np.float32)
    loc = rs.uniform(0.05, 0.95, size=(B, Lq, M, L, P, 2)).astype(np.float32)
    w = rs.rand(B, Lq, M, L, P).astype(np.float32)

    def loss(impl):
        def f(v, l, a):
            return ms_deform_attn_core(v, shapes, l, a, impl=impl).sum()
        return jax.grad(f, argnums=(0, 1, 2))(
            jnp.asarray(value), jnp.asarray(loc), jnp.asarray(w)
        )

    g_ref = loss("xla")
    g_scan = loss("scan")
    for a, b in zip(g_ref, g_scan):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


@pytest.mark.parametrize("impl", ["wide_q", "fused", "fused_q"])
def test_msdeform_order_variants_match_torch_oracle(impl):
    """The gather row-order/call-count variants (q-minor ordering, fused
    cross-level gather) vs the grid_sample oracle, out-of-bounds included."""
    rs = np.random.RandomState(31)
    shapes = [(8, 12), (4, 6), (2, 3)]
    S = sum(h * w for h, w in shapes)
    B, Lq, M, D, L, P = 2, 7, 4, 16, 3, 4
    value = rs.randn(B, S, M, D).astype(np.float32)
    loc = rs.uniform(-0.2, 1.2, size=(B, Lq, M, L, P, 2)).astype(np.float32)
    w = rs.rand(B, Lq, M, L, P).astype(np.float32)
    w /= w.reshape(B, Lq, M, -1).sum(-1)[..., None, None]

    ref = _torch_msdeform(
        torch.from_numpy(value), shapes, torch.from_numpy(loc),
        torch.from_numpy(w),
    ).numpy()
    ours = np.asarray(
        ms_deform_attn_core(jnp.asarray(value), shapes, jnp.asarray(loc),
                            jnp.asarray(w), impl=impl)
    )
    np.testing.assert_allclose(ours, ref, atol=1e-5)


@pytest.mark.parametrize("impl", ["wide_q", "fused", "fused_q"])
def test_msdeform_order_variants_grad_matches_xla(impl):
    import jax

    rs = np.random.RandomState(32)
    shapes = [(4, 4), (2, 2)]
    S = sum(h * w for h, w in shapes)
    B, Lq, M, D, L, P = 1, 5, 2, 8, 2, 2
    value = rs.randn(B, S, M, D).astype(np.float32)
    loc = rs.uniform(0.05, 0.95, size=(B, Lq, M, L, P, 2)).astype(np.float32)
    w = rs.rand(B, Lq, M, L, P).astype(np.float32)

    def loss(impl_):
        def f(v, l, a):
            return ms_deform_attn_core(v, shapes, l, a, impl=impl_).sum()
        return jax.grad(f, argnums=(0, 1, 2))(
            jnp.asarray(value), jnp.asarray(loc), jnp.asarray(w)
        )

    g_ref = loss("xla")
    g_new = loss(impl)
    for a, b in zip(g_ref, g_new):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_msdeform_flat_matches_torch_oracle():
    """'flat' (round-4 flat-layout core with manual VJP) vs the grid_sample
    oracle, including out-of-bounds locations."""
    rs = np.random.RandomState(21)
    shapes = [(8, 12), (4, 6), (2, 3)]
    S = sum(h * w for h, w in shapes)
    B, Lq, M, D, L, P = 2, 7, 4, 16, 3, 4
    value = rs.randn(B, S, M, D).astype(np.float32)
    loc = rs.uniform(-0.2, 1.2, size=(B, Lq, M, L, P, 2)).astype(np.float32)
    w = rs.rand(B, Lq, M, L, P).astype(np.float32)
    w /= w.reshape(B, Lq, M, -1).sum(-1)[..., None, None]

    ref = _torch_msdeform(
        torch.from_numpy(value), shapes, torch.from_numpy(loc),
        torch.from_numpy(w),
    ).numpy()
    ours = np.asarray(
        ms_deform_attn_core(jnp.asarray(value), shapes, jnp.asarray(loc),
                            jnp.asarray(w), impl="flat")
    )
    np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_msdeform_flat_grad_matches_xla():
    """The hand-written _flat_level VJP vs XLA autodiff of the oracle path,
    for value, locations and attention weights, at B=1 and B=2."""
    import jax

    rs = np.random.RandomState(22)
    shapes = [(4, 4), (2, 2)]
    S = sum(h * w for h, w in shapes)
    for B in (1, 2):
        Lq, M, D, L, P = 5, 2, 8, 2, 2
        value = rs.randn(B, S, M, D).astype(np.float32)
        loc = rs.uniform(0.05, 0.95, size=(B, Lq, M, L, P, 2)).astype(np.float32)
        w = rs.rand(B, Lq, M, L, P).astype(np.float32)

        def loss(impl):
            def f(v, l, a):
                return ms_deform_attn_core(v, shapes, l, a, impl=impl).sum()
            return jax.grad(f, argnums=(0, 1, 2))(
                jnp.asarray(value), jnp.asarray(loc), jnp.asarray(w)
            )

        g_ref = loss("xla")
        g_flat = loss("flat")
        for a, b in zip(g_ref, g_flat):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=1e-5)


def test_msdeform_flat_grad_boundary_locations():
    """Out-of-bounds / boundary sampling locations: the clip/validity VJP of
    the flat path matches the oracle autodiff (zero-padding semantics)."""
    import jax

    rs = np.random.RandomState(23)
    shapes = [(4, 4)]
    S = 16
    B, Lq, M, D, L, P = 2, 6, 2, 8, 1, 3
    value = rs.randn(B, S, M, D).astype(np.float32)
    loc = rs.uniform(-0.3, 1.3, size=(B, Lq, M, L, P, 2)).astype(np.float32)
    w = rs.rand(B, Lq, M, L, P).astype(np.float32)

    def loss(impl):
        def f(v, l, a):
            return (ms_deform_attn_core(v, shapes, l, a, impl=impl) ** 2).sum()
        return jax.grad(f, argnums=(0, 1, 2))(
            jnp.asarray(value), jnp.asarray(loc), jnp.asarray(w)
        )

    g_ref = loss("xla")
    g_flat = loss("flat")
    for a, b in zip(g_ref, g_flat):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)


def test_deform_bwd_glue_kernel_matches_xla():
    """Interpret-mode parity of the fused backward glue kernel (contrib +
    per-slot dots) vs the XLA formulation in _flat_level_bwd."""
    import jax
    import jax.experimental.pallas as pl

    from iuvl_tpu.ops.pallas import deform_bwd_glue as dg

    rs = np.random.RandomState(31)
    q, p, d = 16, 4, 8
    r = q * p
    g4 = jnp.asarray(rs.randn(r, 4 * d).astype(np.float32))
    gout = jnp.asarray(rs.randn(q, d).astype(np.float32))
    wa = jnp.asarray(rs.rand(r, 4).astype(np.float32))

    gt = np.tile(np.asarray(gout), (1, 4))          # (q, 4d)
    gt_rows = np.repeat(gt, p, axis=0)              # (r, 4d)
    dots_ref = np.stack(
        [(np.asarray(g4)[:, k * d:(k + 1) * d]
          * gt_rows[:, k * d:(k + 1) * d]).sum(1) for k in range(4)], -1)
    contrib_ref = np.concatenate(
        [np.asarray(wa)[:, k:k + 1] * gt_rows[:, k * d:(k + 1) * d]
         for k in range(4)], -1)

    orig = pl.pallas_call

    def interp(*a, **kw):
        kw["interpret"] = True
        return orig(*a, **kw)

    dg.pl.pallas_call = interp
    try:
        contrib, dots = dg.deform_bwd_glue(g4, gout, wa, p)
        # query-row layout variant (the round-5 production default) must be
        # bit-identical on the same inputs
        contrib_q, dots_q = dg.deform_bwd_glue_q(g4, gout, wa, p)
    finally:
        dg.pl.pallas_call = orig
    np.testing.assert_allclose(np.asarray(dots), dots_ref, atol=1e-5)
    np.testing.assert_allclose(np.asarray(contrib), contrib_ref, atol=1e-5)
    np.testing.assert_array_equal(np.asarray(dots_q), np.asarray(dots))
    np.testing.assert_array_equal(np.asarray(contrib_q), np.asarray(contrib))
