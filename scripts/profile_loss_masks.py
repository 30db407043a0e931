"""loss_masks component breakdown (chained-scan differencing).

The criterion's losses phase measures ~138 ms/step after the JV matcher
(scripts/profile_criterion.py: costs+losses 175 - costs 37). Per layer
(x10): uncertainty sampling (uniform point_sample on 256^2 logits),
exact lax.top_k over 37632 candidates x 40 maps, then point_sample of
src (256^2) and gt (1024^2) at the 12544 picked points.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/profile_loss_masks.py
"""
from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from iuvl_tpu.ops.point_sample import point_sample, uncertain_point_coords


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
    bt, hp, wp, hg, wg = 40, 256, 256, 1024, 1024
    npts, overs = 12544, 3.0
    ncand = int(npts * overs)
    rs = np.random.RandomState(0)
    src = jnp.asarray(rs.randn(bt, hp, wp), jnp.float32)
    tgt = jnp.asarray(rs.rand(bt, hg, wg) > 0.7, jnp.float32)
    unc = jnp.asarray(rs.randn(bt, ncand), jnp.float32)
    cand = jnp.asarray(rs.rand(bt, ncand, 2), jnp.float32)
    coords = jnp.asarray(rs.rand(bt, npts, 2), jnp.float32)
    rng = jax.random.PRNGKey(0)

    def f_coords(c, src):
        out = uncertain_point_coords(rng, src + c * 1e-12, npts, overs, 0.75)
        return out.mean().astype(jnp.float32)

    def f_topk(c, unc, cand):
        _, idx = jax.lax.top_k(unc + c * 1e-12, int(0.75 * npts))
        p = jnp.take_along_axis(cand, idx[..., None], axis=1)
        return p.mean().astype(jnp.float32)

    def f_cand_sample(c, src, cand):
        out = point_sample(src + c * 1e-12, cand)
        return out.mean().astype(jnp.float32)

    def f_src_sample(c, src, coords):
        out = point_sample(src + c * 1e-12, coords)
        return out.mean().astype(jnp.float32)

    def f_tgt_sample(c, tgt, coords):
        out = point_sample(tgt + c * 1e-12, coords)
        return out.mean().astype(jnp.float32)

    for name, fn, args in [
        ("uncertain_coords(all)", f_coords, (src,)),
        ("  topk+take", f_topk, (unc, cand)),
        ("  cand point_sample 256^2 x37632", f_cand_sample, (src, cand)),
        ("src point_sample 256^2 x12544", f_src_sample, (src, coords)),
        ("gt point_sample 1024^2 x12544", f_tgt_sample, (tgt, coords)),
    ]:
        t = timed_diff(chain(fn, 1), chain(fn, 5), args, 4.0)
        print(f"{name}: {t*1e3:7.2f} ms/layer  ({t*1e4:.1f} ms x10 layers)",
              flush=True)


if __name__ == "__main__":
    main()
