"""Device-side auction LSA vs scipy oracle.

The auction matcher (losses/matcher.py:auction_match) must produce
assignments whose total cost matches scipy.optimize.linear_sum_assignment
up to the documented quantization tolerance (2^-16 of the finite cost
range per assigned pair), with a valid injective assignment.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp
from scipy.optimize import linear_sum_assignment

from iuvl_tpu.losses.matcher import BIG_COST, auction_match, hungarian_match


def _total_cost(cost, assign):
    # cost (Q, T), assign (T,) query per target
    return float(cost[assign, np.arange(cost.shape[1])].sum())


def _oracle_total(cost):
    rows, cols = linear_sum_assignment(cost)
    return float(cost[rows, cols].sum())


@pytest.mark.parametrize("seed", [0, 1, 2])
@pytest.mark.parametrize("q,t,t_valid", [(100, 20, 7), (32, 32, 32), (64, 1, 1)])
def test_auction_matches_scipy_total_cost(seed, q, t, t_valid):
    rng = np.random.RandomState(seed)
    cost = rng.randn(2, q, t).astype(np.float32) * 7.0
    cost[:, :, t_valid:] = BIG_COST  # padded invalid target columns
    out = np.asarray(jax.jit(auction_match)(jnp.asarray(cost)))
    rng_span = cost[cost < BIG_COST / 2].max() - cost[cost < BIG_COST / 2].min()
    tol = t * rng_span / 2**16 + 1e-4
    for b in range(2):
        # injective over all target columns
        assert len(set(out[b].tolist())) == t
        assert out[b].min() >= 0 and out[b].max() < q
        # total cost on the VALID sub-assignment matches the oracle
        got = _total_cost(cost[b][:, :t_valid], out[b][:t_valid])
        want = _oracle_total(cost[b][:, :t_valid])
        assert got <= want + tol, (got, want)


def test_auction_exact_on_integer_costs():
    rng = np.random.RandomState(3)
    cost = rng.randint(0, 50, size=(3, 24, 24)).astype(np.float32)
    out = np.asarray(auction_match(jnp.asarray(cost)))
    for b in range(3):
        got = _total_cost(cost[b], out[b])
        want = _oracle_total(cost[b])
        # integer costs, range 50 << 2^16 quanta: exactly optimal
        assert got == pytest.approx(want, abs=1e-5)


def test_auction_identity_on_diagonal():
    t = 12
    cost = np.full((1, 16, t), 9.0, np.float32)
    cost[0, np.arange(t), np.arange(t)] = 0.0
    out = np.asarray(auction_match(jnp.asarray(cost)))
    np.testing.assert_array_equal(out[0], np.arange(t))


def test_hungarian_match_impl_switch():
    rng = np.random.RandomState(4)
    cost = jnp.asarray(rng.randn(2, 40, 9).astype(np.float32))
    host = np.asarray(hungarian_match(cost, impl="host"))
    dev = np.asarray(hungarian_match(cost, impl="auction"))
    c = np.asarray(cost)
    for b in range(2):
        got = _total_cost(c[b], dev[b])
        want = _total_cost(c[b], host[b])
        assert got == pytest.approx(want, abs=1e-3)


def test_auction_under_grad_context():
    # matcher output feeds index ops only; make sure it traces inside grad
    rng = np.random.RandomState(5)
    cost_np = rng.randn(1, 10, 4).astype(np.float32)

    def loss(x):
        assign = auction_match(jnp.asarray(cost_np) + 0.0 * x)
        return (x * assign.sum()).sum()

    g = jax.grad(loss)(jnp.float32(2.0))
    assert np.isfinite(float(g))


# ---------------- JV (successive shortest paths) matcher ---------------- #

from iuvl_tpu.losses.matcher import jv_match


@pytest.mark.parametrize("seed", [0, 1, 2])
@pytest.mark.parametrize("q,t,t_valid", [(100, 20, 7), (32, 32, 32), (64, 1, 1)])
def test_jv_matches_scipy_total_cost(seed, q, t, t_valid):
    """JV is exact (no quantization): the valid sub-assignment's total
    must equal scipy's within float32 arithmetic noise."""
    rng = np.random.RandomState(seed)
    cost = rng.randn(2, q, t).astype(np.float32) * 7.0
    cost[:, :, t_valid:] = BIG_COST
    out = np.asarray(jax.jit(jv_match)(jnp.asarray(cost)))
    for b in range(2):
        assert len(set(out[b].tolist())) == t
        assert out[b].min() >= 0 and out[b].max() < q
        got = _total_cost(cost[b][:, :t_valid], out[b][:t_valid])
        want = _oracle_total(cost[b][:, :t_valid])
        assert got <= want + 1e-3, (got, want)


def test_jv_exact_on_integer_costs():
    rng = np.random.RandomState(3)
    cost = rng.randint(0, 50, size=(3, 24, 24)).astype(np.float32)
    out = np.asarray(jv_match(jnp.asarray(cost)))
    for b in range(3):
        got = _total_cost(cost[b], out[b])
        want = _oracle_total(cost[b])
        assert got == pytest.approx(want, abs=1e-4)


def test_jv_identity_on_diagonal():
    t = 12
    cost = np.full((1, 16, t), 9.0, np.float32)
    cost[0, np.arange(t), np.arange(t)] = 0.0
    out = np.asarray(jv_match(jnp.asarray(cost)))
    np.testing.assert_array_equal(out[0], np.arange(t))


def test_jv_impl_matches_host():
    rng = np.random.RandomState(4)
    cost = jnp.asarray(rng.randn(2, 40, 9).astype(np.float32))
    host = np.asarray(hungarian_match(cost, impl="host"))
    dev = np.asarray(hungarian_match(cost, impl="jv"))
    c = np.asarray(cost)
    for b in range(2):
        got = _total_cost(c[b], dev[b])
        want = _total_cost(c[b], host[b])
        assert got == pytest.approx(want, abs=1e-3)


def test_jv_under_grad_context():
    rng = np.random.RandomState(5)
    cost_np = rng.randn(1, 10, 4).astype(np.float32)

    def loss(x):
        assign = jv_match(jnp.asarray(cost_np) + 0.0 * x)
        return (x * assign.sum()).sum()

    g = jax.grad(loss)(jnp.float32(2.0))
    assert np.isfinite(float(g))


def test_jv_under_vmap_lanes():
    """Mixed-difficulty lanes exercise the per-lane masked while_loop
    fixpoints (one lane finishes its Dijkstra long before the other)."""
    rng = np.random.RandomState(6)
    easy = np.full((30, 8), 5.0, np.float32)
    easy[np.arange(8), np.arange(8)] = 0.0
    hard = rng.randn(30, 8).astype(np.float32) * 11.0
    cost = jnp.asarray(np.stack([easy, hard]))
    out = np.asarray(jv_match(cost))
    for b, c in enumerate([easy, hard]):
        got = _total_cost(c, out[b])
        want = _oracle_total(c)
        assert got == pytest.approx(want, abs=1e-3)


@pytest.mark.parametrize("impl", ["jv", "auction"])
def test_device_matchers_sanitize_inf(impl):
    """±inf cost entries must be treated as BIG_COST (like the host path's
    nan_to_num), not leak into the dual arithmetic as NaN-producing -inf."""
    rng = np.random.RandomState(3)
    cost = rng.randn(1, 16, 5).astype(np.float32)
    cost[0, 0, 0] = -np.inf
    cost[0, 3, 1] = np.inf
    cost[0, 5, 2] = np.nan
    assign = np.asarray(hungarian_match(jnp.asarray(cost), impl=impl))[0]
    ref = np.nan_to_num(cost[0], nan=BIG_COST, posinf=BIG_COST,
                        neginf=BIG_COST)
    assert len(set(assign.tolist())) == 5  # injective, no garbage
    got = _total_cost(ref, assign)
    assert abs(got - _oracle_total(ref)) < 1e-3 * max(1.0, abs(got))
