"""Hungarian matcher, TPU-native.

Parity target: /root/reference/modeling/modules/matcher.py:106-170
(memory_efficient_forward): cost = cost_class * (-prob[target]) +
cost_mask * point-sampled pairwise sigmoid-CE + cost_dice * pairwise dice,
over a shared set of randomly sampled points, solved with
``scipy.optimize.linear_sum_assignment``.

TPU design: targets are padded to a static T_max with a validity mask; the
full (B, Q, T) cost tensor is computed on device in one shot (batched
matmuls on the MXU — no per-image Python loop). Invalid target columns get
a large constant cost so they absorb leftover queries; their assignments
are masked out downstream.

The assignment itself has three implementations, selected by
``set_matcher_impl`` / ``$IUVL_MATCHER_IMPL`` (``auto`` = jv on TPU,
host elsewhere):

* ``host`` — ``scipy.linear_sum_assignment`` through ``jax.pure_callback``
  (the reference also assigns on CPU inside the step: matcher.py:158-165).
  Under multi-chip pjit this forces the sharded cost tensor to be gathered
  to host 0 every step and stalls the device pipeline on the round-trip.
* ``jv`` — Jonker–Volgenant successive shortest augmenting paths on
  device (the algorithm scipy runs on host), exact in float arithmetic.
  The default on TPU: 0.6 ms for the train step's 20-lane solve vs the
  auction's 534-678 ms (scripts/bench_auction.py) — the auction must
  square the asymmetric problem with dummy persons and runs ~13k tiny
  latency-bound while_loop iterations, JV scans at most T*Q objects on
  the raw Q x T problem.
* ``auction`` — Bertsekas' auction algorithm with epsilon-scaling running
  entirely on device in one ``lax.while_loop`` (vmap/pjit-safe, no host
  sync). Costs are quantized to integers scaled by (T+1), so the final
  epsilon = 1 phase is provably optimal for the quantized costs; the only
  divergence from scipy is tie-breaking within one quantization step
  (``2^-16`` of the finite cost range), which only reorders near-equal-cost
  assignments. Kept selectable as a measured-slower alternative.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.point_sample import point_sample_shared

BIG_COST = 1e6
_INT_MIN = jnp.int32(-(2**30))


def pairwise_sigmoid_ce(inputs: jax.Array, targets: jax.Array) -> jax.Array:
    """inputs (Q, P) logits, targets (T, P) in {0,1} -> (Q, T) mean-BCE.
    Decomposition trick (reference matcher.py batch_sigmoid_ce_loss)."""
    p = inputs.shape[-1]
    pos = jax.nn.softplus(-inputs)  # loss when target == 1
    neg = jax.nn.softplus(inputs)  # loss when target == 0
    return (
        jnp.einsum("qp,tp->qt", pos, targets)
        + jnp.einsum("qp,tp->qt", neg, 1.0 - targets)
    ) / p


def pairwise_dice(inputs: jax.Array, targets: jax.Array) -> jax.Array:
    """inputs (Q, P) logits, targets (T, P) -> (Q, T) dice loss."""
    probs = jax.nn.sigmoid(inputs)
    numerator = 2.0 * jnp.einsum("qp,tp->qt", probs, targets)
    denominator = probs.sum(-1)[:, None] + targets.sum(-1)[None, :]
    return 1.0 - (numerator + 1.0) / (denominator + 1.0)


def _lsa_host(cost: np.ndarray) -> np.ndarray:
    """Host callback: per-image linear_sum_assignment.
    cost: (B, Q, T) -> (B, T) assigned query index per target column."""
    from scipy.optimize import linear_sum_assignment

    cost = np.nan_to_num(np.asarray(cost, dtype=np.float64), nan=BIG_COST)
    b, q, t = cost.shape
    out = np.zeros((b, t), dtype=np.int32)
    for i in range(b):
        rows, cols = linear_sum_assignment(cost[i])
        out[i, cols] = rows.astype(np.int32)
    return out


def compute_match_cost(
    rng: jax.Array,
    pred_logits: jax.Array,  # (B, Q, K)
    pred_masks: jax.Array,  # (B, Q, H, W)
    tgt_labels: jax.Array,  # (B, T) int
    tgt_masks: jax.Array,  # (B, T, H, W) float {0,1}
    tgt_valid: jax.Array,  # (B, T) bool
    num_points: int = 12544,
    cost_class: float = 2.0,
    cost_mask: float = 5.0,
    cost_dice: float = 5.0,
) -> jax.Array:
    """Vectorized (B, Q, T) matching cost."""
    b, q = pred_logits.shape[:2]
    t = tgt_labels.shape[1]
    prob = jax.nn.softmax(pred_logits.astype(jnp.float32), axis=-1)
    c_class = -jnp.take_along_axis(prob, tgt_labels[:, None, :], axis=2)  # (B, Q, T)

    coords = jax.random.uniform(rng, (b, num_points, 2))
    # points are shared across queries/targets: channels-wide row gathers
    # (point_sample_shared docstring has the measured 50x rate argument)
    pm = point_sample_shared(pred_masks.astype(jnp.float32), coords)
    # gt is binary: bf16 channels-last gather table is bit-exact and halves
    # the 1024^2 row bytes (see point_sample's store_dtype note)
    tm = point_sample_shared(tgt_masks.astype(jnp.float32), coords,
                             store_dtype=jnp.bfloat16)

    c_mask = jax.vmap(pairwise_sigmoid_ce)(pm, tm)
    c_dice = jax.vmap(pairwise_dice)(pm, tm)

    cost = cost_class * c_class + cost_mask * c_mask + cost_dice * c_dice
    cost = jnp.where(jnp.isfinite(cost), cost, BIG_COST)
    # Invalid target columns absorb leftover queries at uniform high cost.
    return jnp.where(tgt_valid[:, None, :], cost, BIG_COST)


def _auction_single(cost: jax.Array, quant_bits: int = 16,
                    scale_factor: int = 4, max_iters: int = 200_000,
                    return_iters: bool = False):
    """One instance: (Q, T) float cost -> (T,) assigned query per target.

    Forward auction (persons = target columns, objects = query rows) with
    epsilon-scaling. Jacobi bidding: every unassigned person bids each
    iteration; the highest bid per object wins. All state transitions are
    fixpoints once assignment completes and eps reaches 0, so the loop is
    safe under vmap's select-masked while_loop batching.
    """
    q, t = cost.shape
    if t > q:
        raise ValueError(f"auction matcher needs T <= Q, got Q={q} T={t}")

    # --- integer benefits, BIG_COST columns clipped to max_finite + 1 --- #
    cost = cost.astype(jnp.float32)
    cost = jnp.where(jnp.isfinite(cost), cost, BIG_COST)  # _lsa_host nan_to_num (incl. +/-inf)
    finite = cost < BIG_COST * 0.5
    lo = jnp.min(jnp.where(finite, cost, jnp.inf))
    hi = jnp.max(jnp.where(finite, cost, -jnp.inf))
    no_finite = ~jnp.isfinite(lo)
    lo = jnp.where(no_finite, 0.0, lo)
    hi = jnp.where(no_finite, 1.0, jnp.maximum(hi, lo + 1e-12))
    clipped = jnp.clip(cost, lo, hi + (hi - lo) / (2**quant_bits))
    scale = (2**quant_bits) / (hi - lo + 1e-30)
    ints = jnp.round((clipped - lo) * scale).astype(jnp.int32)
    # benefits scaled by (n_persons + 1): final eps = 1 < 1/n in original
    # integer units guarantees an optimal assignment of the quantized costs.
    # The problem is squared with dummy persons of uniform zero benefit:
    # epsilon-scaling keeps prices across phases, which is only sound when
    # every object ends each phase assigned (asymmetric forward auction
    # leaves stale high prices on unassigned objects). Uniform dummy rows
    # cannot change the optimum on the real sub-assignment.
    n = q  # squared person count
    a = jnp.concatenate(
        [-(ints.T) * (n + 1), jnp.zeros((q - t, q), jnp.int32)], axis=0
    )  # (Q, Q) person-major; rows [0, t) are the real targets

    eps0 = jnp.maximum(
        jnp.int32(1), (jnp.max(a) - jnp.min(a)) // jnp.int32(scale_factor)
    )
    prices0 = jnp.zeros((q,), jnp.int32)
    owner0 = jnp.full((q,), -1, jnp.int32)
    assign0 = jnp.full((n,), -1, jnp.int32)
    t_ids = jnp.arange(n, dtype=jnp.int32)
    q_ids = jnp.arange(q, dtype=jnp.int32)

    def cond(state):
        prices, owner, assign, eps, it = state
        return (eps >= 1) & (it < max_iters)

    def body(state):
        prices, owner, assign, eps, it = state
        unass = assign < 0
        # --- Jacobi bidding round ------------------------------------- #
        values = a - prices[None, :]  # (T, Q) int32
        j1 = jnp.argmax(values, axis=1).astype(jnp.int32)  # (T,)
        w1 = jnp.take_along_axis(values, j1[:, None], axis=1)[:, 0]
        v2 = jnp.where(q_ids[None, :] == j1[:, None], _INT_MIN, values)
        w2 = jnp.max(v2, axis=1)
        w2 = jnp.where(w2 <= _INT_MIN, w1, w2)  # Q == 1 degenerate
        bid = w1 - w2 + eps + jnp.take(prices, j1)  # == a[i, j1] - w2 + eps
        bidmat = jnp.where(
            unass[:, None] & (q_ids[None, :] == j1[:, None]),
            bid[:, None], _INT_MIN,
        )  # (T, Q)
        win_bid = jnp.max(bidmat, axis=0)  # (Q,)
        win_per = jnp.argmax(bidmat, axis=0).astype(jnp.int32)
        has = win_bid > _INT_MIN // 2
        # --- resolve winners / evictions ------------------------------ #
        won = has[None, :] & (win_per[None, :] == t_ids[:, None])  # (T, Q)
        won_any = jnp.any(won, axis=1)
        won_obj = jnp.argmax(won, axis=1).astype(jnp.int32)
        lost = jnp.any(has[None, :] & (owner[None, :] == t_ids[:, None]), axis=1)
        assign = jnp.where(won_any, won_obj, jnp.where(lost, -1, assign))
        owner = jnp.where(has, win_per, owner)
        prices = jnp.where(has, win_bid, prices)
        # --- phase advance when fully assigned ------------------------ #
        done_phase = ~jnp.any(unass)
        new_eps = jnp.where(
            done_phase,
            jnp.where(eps == 1, 0, jnp.maximum(1, eps // scale_factor)),
            eps,
        )
        reset = done_phase & (new_eps >= 1)
        assign = jnp.where(reset, -1, assign)
        owner = jnp.where(reset, -1, owner)
        return prices, owner, assign, new_eps, it + 1

    _, _, assign, _, iters = jax.lax.while_loop(
        cond, body, (prices0, owner0, assign0, eps0, jnp.int32(0))
    )
    if return_iters:
        return jnp.maximum(assign[:t], 0), iters
    # real persons only; cap-exhaustion safety clamp (normally complete)
    return jnp.maximum(assign[:t], 0)


def _auction_single_iters(cost, quant_bits: int = 16, scale_factor: int = 4):
    """Bench instrumentation: while_loop iteration count of one solve."""
    return _auction_single(cost, quant_bits, scale_factor,
                           return_iters=True)[1]


def auction_match(cost: jax.Array) -> jax.Array:
    """(B, Q, T) cost -> (B, T): device-side epsilon-scaling auction LSA."""
    return jax.vmap(_auction_single)(jax.lax.stop_gradient(cost))


def _jv_single(cost: jax.Array) -> jax.Array:
    """One instance: (Q, T) float cost -> (T,) assigned query per target.

    Jonker–Volgenant successive shortest augmenting paths with dual
    potentials (the algorithm scipy's ``linear_sum_assignment`` runs on
    host): T sequential augmentations, each a Dijkstra ``while_loop`` over
    the Q objects in the reduced-cost graph, EXACT in float arithmetic —
    no quantization phase schedule at all. Replaces the epsilon-scaling
    auction as the default device matcher: the auction must square the
    asymmetric problem to Q x Q with dummy persons for cross-phase price
    soundness and then runs ~13k tiny latency-bound while_loop iterations
    (scripts/bench_auction.py: 507-707 ms for the train step's 20-lane
    solve, schedule tuning flat), while JV scans at most T*Q objects on
    the raw Q x T problem — two orders of magnitude fewer iterations.
    Person potentials are implicit: for a matched tight pair (i0, j0),
    u[i0] == c[i0, j0] - v[j0], which is all the relaxation needs.
    vmap-safe (pure lax control flow, per-lane masked fixpoints).
    """
    q, t = cost.shape
    if t > q:
        raise ValueError(f"jv matcher needs T <= Q, got Q={q} T={t}")
    cost = cost.astype(jnp.float32)
    # Sanitize non-finite entries (NaN AND +/-inf -- a -inf would make
    # lo=-inf below, leave itself un-clipped by jnp.clip, and poison the
    # Dijkstra dual arithmetic; mirrors the host path's nan_to_num).
    cost = jnp.where(jnp.isfinite(cost), cost, BIG_COST)
    # Same range compression as the auction: BIG_COST sentinels clipped to
    # just above the finite maximum — keeps float arithmetic on the dual
    # updates well-conditioned; uniform high padding columns still absorb
    # exactly one leftover query each.
    finite = cost < BIG_COST * 0.5
    lo = jnp.min(jnp.where(finite, cost, jnp.inf))
    hi = jnp.max(jnp.where(finite, cost, -jnp.inf))
    no_finite = ~jnp.isfinite(lo)
    lo = jnp.where(no_finite, 0.0, lo)
    hi = jnp.where(no_finite, 1.0, jnp.maximum(hi, lo + 1e-12))
    gap = (hi - lo) * 1e-3 + 1e-6
    c = jnp.clip(cost, lo, hi + gap).T  # (T, Q) person-major
    inf = jnp.float32(jnp.inf)

    def person_step(i, state):
        v, owner, match = state
        dist = c[i] - v  # (Q,) shortest known path cost to each object
        pred = jnp.full((q,), i, jnp.int32)  # person preceding object j
        scanned = jnp.zeros((q,), bool)

        def dj_cond(s):
            return ~s[5]

        def dj_body(s):
            dist, pred, scanned, _, _, _ = s
            dmask = jnp.where(scanned, inf, dist)
            j = jnp.argmin(dmask).astype(jnp.int32)
            dj = dmask[j]
            free = owner[j] < 0  # reached an unassigned object: path found
            i0 = jnp.maximum(owner[j], 0)
            # Relax via j's owner: u[i0] = c[i0, j] - v[j] (tight pair).
            nd = dj + (c[i0] - v) - (c[i0, j] - v[j])
            scanned2 = scanned.at[j].set(True)
            better = (nd < dist) & ~scanned2
            dist = jnp.where(free, dist, jnp.where(better, nd, dist))
            pred = jnp.where(free, pred, jnp.where(better, i0, pred))
            scanned = jnp.where(free, scanned, scanned2)
            return dist, pred, scanned, j, dj, free

        dist, pred, scanned, j0, delta, _ = jax.lax.while_loop(
            dj_cond, dj_body,
            (dist, pred, scanned, jnp.int32(0), jnp.float32(0.0),
             jnp.asarray(False)),
        )
        # Dual update on the scanned set keeps reduced costs nonnegative
        # for the next Dijkstra (scipy's rectangular LSA does the same).
        v = jnp.where(scanned, v + (dist - delta), v)

        def aug_cond(s):
            return ~s[3]

        def aug_body(s):
            j, owner, match, _ = s
            i0 = pred[j]
            j_next = match[i0]
            owner = owner.at[j].set(i0)
            match = match.at[i0].set(j)
            return j_next, owner, match, i0 == i

        _, owner, match, _ = jax.lax.while_loop(
            aug_cond, aug_body, (j0, owner, match, jnp.asarray(False))
        )
        return v, owner, match

    v0 = jnp.zeros((q,), jnp.float32)
    owner0 = jnp.full((q,), -1, jnp.int32)
    match0 = jnp.full((t,), -1, jnp.int32)
    _, _, match = jax.lax.fori_loop(0, t, person_step, (v0, owner0, match0))
    return jnp.maximum(match, 0)


def jv_match(cost: jax.Array) -> jax.Array:
    """(B, Q, T) cost -> (B, T): device-side exact JV/shortest-path LSA."""
    return jax.vmap(_jv_single)(jax.lax.stop_gradient(cost))


def batched_hungarian(costs, impl: str | None = None):
    """Solve several (B, Q, T_i) assignment problems in ONE matcher call;
    returns the per-problem (B, T_i) assignments.

    The auction while_loop runs all lanes in parallel, so k batched solves
    cost about one solve (the loop runs to the slowest lane) instead of k
    sequential 60+ ms calls — this is how the per-layer matchings of the
    criterion/caption/grounding losses stay off the train-step critical
    path. T dims are padded to a common width with uniform BIG_COST
    columns, which cannot change the valid sub-assignment (every padded
    column absorbs a leftover query at identical cost regardless of
    which). All costs must share Q, and (for the device impls) the padded
    max(T_i) must still be <= Q — see ``hungarian_match``.
    """
    if len(costs) == 1:
        return [hungarian_match(costs[0], impl=impl)]
    tmax = max(c.shape[2] for c in costs)
    padded = [
        jnp.pad(c, ((0, 0), (0, 0), (0, tmax - c.shape[2])),
                constant_values=BIG_COST)
        for c in costs
    ]
    out = hungarian_match(jnp.concatenate(padded, axis=0), impl=impl)
    res, off = [], 0
    for c in costs:
        b, _, t = c.shape
        res.append(out[off:off + b, :t])
        off += b
    return res


_MATCHER_IMPL = os.environ.get("IUVL_MATCHER_IMPL", "auto")


def set_matcher_impl(impl: str) -> None:
    """'host' | 'auction' | 'jv' | 'auto' (auto = jv on TPU, host
    elsewhere). Threaded from cfg MATCHER_IMPL by the trainer;
    module-level because the matcher is called from loss closures, not
    from model config."""
    global _MATCHER_IMPL
    if impl not in ("host", "auction", "jv", "auto"):
        raise ValueError(f"unknown matcher impl {impl!r}")
    _MATCHER_IMPL = impl


def hungarian_match(cost: jax.Array, impl: str | None = None) -> jax.Array:
    """(B, Q, T) cost -> (B, T) assigned query per target.

    Contract: the device solvers ('jv', 'auction') require T <= Q (queries
    at least as numerous as targets — always true for the 100-query
    decoder matching <=100 gt instances) and raise at trace time
    otherwise; the 'host' scipy callback handles any rectangle. Callers
    with a possibly-wide T must pass ``impl='host'`` explicitly.
    """
    impl = impl or _MATCHER_IMPL
    if impl == "auto":
        impl = "jv" if jax.default_backend() == "tpu" else "host"
    if impl == "jv":
        return jv_match(cost)
    if impl == "auction":
        return auction_match(cost)
    b, _, t = cost.shape
    return jax.pure_callback(
        _lsa_host,
        jax.ShapeDtypeStruct((b, t), jnp.int32),
        jax.lax.stop_gradient(cost),
        vmap_method="sequential",
    )
