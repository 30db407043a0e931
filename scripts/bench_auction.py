"""Device LSA solver timing: JV successive-shortest-paths vs the
epsilon-scaling auction (chained-scan differencing, host-fetch forced).

The batched solve measures ~507 ms of the ~1.1 s criterion forward
(scripts/profile_criterion.py) — the largest non-model piece of the train
step. Shapes: 20 lanes (B=2 x 10 layers) of 100x20 costs with padded
BIG_COST columns, the train step's real workload.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/bench_auction.py
"""
from __future__ import annotations

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from iuvl_tpu.losses import matcher as m


def chain(fn, iters):
    def run(*args):
        def body(carry, _):
            return fn(carry, *args), None
        out, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=iters)
        return out
    return jax.jit(run)


def timed_diff(run1, runk, args, k_minus_1: float, repeats: int = 3):
    float(run1(*args)); float(runk(*args))
    b1 = bk = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter(); float(run1(*args)); b1 = min(b1, time.perf_counter() - t0)
        t0 = time.perf_counter(); float(runk(*args)); bk = min(bk, time.perf_counter() - t0)
    return (bk - b1) / k_minus_1


def main():
    rs = np.random.RandomState(0)
    lanes, q, t = 20, 100, 20
    cost = rs.randn(lanes, q, t).astype(np.float32) * 7.0
    cost[:, :, 14:] = m.BIG_COST  # padded invalid target columns
    cost = jnp.asarray(cost)

    def run_jv(c, cost):
        out = jax.vmap(m._jv_single)(cost + c * 1e-12)
        return out.sum().astype(jnp.float32)

    def run_auction(c, cost, sf=4):
        out = jax.vmap(functools.partial(
            m._auction_single, scale_factor=sf))(cost + c * 1e-12)
        return out.sum().astype(jnp.float32)

    cases = [("jv", run_jv)]
    for sf in (4, 8):
        cases.append((f"auction sf={sf}",
                      functools.partial(run_auction, sf=sf)))
    for name, fn in cases:
        tt = timed_diff(chain(fn, 1), chain(fn, 3), (cost,), 2.0)
        iters = ""
        if name == "jv":
            pass
        else:
            sf = int(name.split("=")[1])
            it = int(jax.vmap(functools.partial(
                m._auction_single_iters, scale_factor=sf))(cost).max())
            iters = f"  max_iters={it}"
        print(f"{name}: {tt*1e3:.1f} ms{iters}", flush=True)


if __name__ == "__main__":
    main()
