"""Parity of the TPU-layout point sampling fast paths against the naive
per-tap clip-and-mask formulation (the reference point_features.py:21
semantics: grid_sample align_corners=False, zero padding)."""

import numpy as np
import jax
import jax.numpy as jnp

from iuvl_tpu.ops.point_sample import point_sample, point_sample_shared


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
