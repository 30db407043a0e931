"""Does splitting the batch-2 deformable gather into two batch-1 gathers
recover the batch-1 gather rate? (round-4: the composed B=2 pixel decoder
runs ~100M gather-rows/s vs ~258M at B=1 — the 'batch-2 eval cliff' of
ROADMAP lives inside the HLO gather, not in broadcasts.)

Cases, on compass-local indices (res3-level shapes, wide 256B bf16 rows):
  take_b2     one jnp.take over the (2*8*hw, 4d) operand, 5.5M rows
  take_split  two jnp.take calls over (8*hw, 4d) operands, 2.75M rows each
  scat_b2     one scatter-add, 5.5M rows
  scat_split  two scatter-adds into the per-image maps

Usage: PYTHONPATH=... python scripts/bench_gather_bsplit.py
"""
from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

B, NH, D, P = 2, 8, 64, 4
H = W = 128
HW = H * W
LQ = 21504
WID = 4 * D


def make(seed=0):
    rs = np.random.RandomState(seed)
    # compass-local cells in a HxW map, one per (q, h, p)
    qy = rs.randint(0, H, LQ)
    qx = rs.randint(0, W, LQ)
    offs = rs.randn(LQ, NH, P, 2) * (np.arange(P)[None, None, :, None] + 1)
    y = np.clip(qy[:, None, None] + offs[..., 1], 0, H - 1).astype(np.int64)
    x = np.clip(qx[:, None, None] + offs[..., 0], 0, W - 1).astype(np.int64)
    cell = (y * W + x).astype(np.int64)  # (LQ, NH, P)
    base_h = np.arange(NH)[None, :, None] * HW
    idx1 = (cell + base_h).transpose(1, 0, 2).reshape(-1)  # (NH*LQ*P) h-major
    idx2 = np.concatenate([idx1, idx1 + NH * HW])
    v1 = rs.randn(NH * HW, WID).astype(np.float32)
    v2 = np.concatenate([v1, v1])
    return (jnp.asarray(idx1, jnp.int32), jnp.asarray(idx2, jnp.int32),
            jnp.asarray(v1, jnp.bfloat16), jnp.asarray(v2, jnp.bfloat16))


def chain(fn, iters):
    def run(*a):
        def body(carry, _):
            return fn(carry, *a), None
        o, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=iters)
        return o
    return jax.jit(run)


def timed_diff(run1, runk, args, k_minus_1, repeats=3):
    float(run1(*args)); float(runk(*args))
    b1 = bk = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter(); float(run1(*args)); b1 = min(b1, time.perf_counter() - t0)
        t0 = time.perf_counter(); float(runk(*args)); bk = min(bk, time.perf_counter() - t0)
    return (bk - b1) / k_minus_1


def main():
    idx1, idx2, v1, v2 = make()
    n2 = idx2.shape[0]

    # Everything big goes in as ARGUMENTS — closure constants get embedded
    # in the remote-compile request (HTTP 413 past ~2 GB).
    pay2 = jnp.asarray(np.random.RandomState(1).randn(n2, WID), jnp.bfloat16)

    cases = {
        "take_b2": lambda c, i1, i2, v1_, v2_, p2: jnp.take(
            v2_ + c.astype(jnp.bfloat16), i2, axis=0, mode="clip"
        ).astype(jnp.float32).sum(),
        "take_split": lambda c, i1, i2, v1_, v2_, p2: sum(
            jnp.take(v + c.astype(jnp.bfloat16), i1, axis=0, mode="clip")
            .astype(jnp.float32).sum() for v in (v1_, v2_[NH * HW:])),
        "scat_b2": lambda c, i1, i2, v1_, v2_, p2: (
            jnp.zeros((2 * NH * HW, WID), jnp.bfloat16)
            .at[i2].add(p2 + c.astype(jnp.bfloat16))
            .astype(jnp.float32).sum()),
        "scat_split": lambda c, i1, i2, v1_, v2_, p2: sum(
            jnp.zeros((NH * HW, WID), jnp.bfloat16)
            .at[i1].add(p + c.astype(jnp.bfloat16))
            .astype(jnp.float32).sum()
            for p in (p2[: n2 // 2], p2[n2 // 2:])),
    }

    # does building the operand from concat+rolls (the v4 wide map) change
    # the gather's speed vs a raw buffer? (composed gathers run 84M rows/s
    # vs 251M in take_split — same rows, same map size)
    v1q = v1[:, :64]

    def build_v4(v):
        return jnp.concatenate(
            [v, jnp.roll(v, -1, 0), jnp.roll(v, -W, 0),
             jnp.roll(v, -(W + 1), 0)], axis=1)

    cases_extra = {
        "take_rolled": lambda c, i1, i2, v1_, v2_, p2: jnp.take(
            build_v4(v1q + c.astype(jnp.bfloat16)), i1, axis=0, mode="clip"
        ).astype(jnp.float32).sum(),
        "take_rolled_barrier": lambda c, i1, i2, v1_, v2_, p2: jnp.take(
            jax.lax.optimization_barrier(
                build_v4(v1q + c.astype(jnp.bfloat16))),
            i1, axis=0, mode="clip").astype(jnp.float32).sum(),
        "take_raw1": lambda c, i1, i2, v1_, v2_, p2: jnp.take(
            v1_ + c.astype(jnp.bfloat16), i1, axis=0, mode="clip"
        ).astype(jnp.float32).sum(),
    }

    # RASTER-ordered reference points (the composed model's real pattern:
    # consecutive queries step ~1 map pixel) in head-major vs head-minor
    # row order — head-major makes consecutive rows near-sequential
    # addresses (the q-minor serialization of ROADMAP r2); head-minor puts
    # 8 distant head-streams in flight.
    rs2 = np.random.RandomState(7)
    qy2 = np.resize(np.repeat(np.arange(H), W), LQ)
    qx2 = np.resize(np.tile(np.arange(W), H), LQ)
    offs2 = rs2.randn(LQ, NH, P, 2) * (np.arange(P)[None, None, :, None] + 1)
    y2 = np.clip(qy2[:, None, None] + offs2[..., 1], 0, H - 1).astype(np.int64)
    x2 = np.clip(qx2[:, None, None] + offs2[..., 0], 0, W - 1).astype(np.int64)
    cell2 = (y2 * W + x2).astype(np.int64)          # (LQ, NH, P)
    base_h2 = np.arange(NH)[None, :, None] * HW
    idx_hmaj = jnp.asarray(
        (cell2 + base_h2).transpose(1, 0, 2).reshape(-1), jnp.int32)
    idx_hmin = jnp.asarray((cell2 + base_h2).reshape(-1), jnp.int32)
    cases_extra["take_raster_hmajor"] = (
        lambda c, i1, i2, v1_, v2_, p2: jnp.take(
            v1_ + c.astype(jnp.bfloat16), idx_hmaj, axis=0, mode="clip"
        ).astype(jnp.float32).sum())
    cases_extra["take_raster_hminor"] = (
        lambda c, i1, i2, v1_, v2_, p2: jnp.take(
            v1_ + c.astype(jnp.bfloat16), idx_hmin, axis=0, mode="clip"
        ).astype(jnp.float32).sum())

    only = sys.argv[1].split(",") if len(sys.argv) > 1 else None
    args = (idx1, idx2, v1, v2, pay2)
    for name, f in cases_extra.items():
        if only and name not in only:
            continue
        t0 = time.time()
        t = timed_diff(chain(f, 1), chain(f, 4), args, 3.0)
        rate = idx1.shape[0] / t / 1e6
        print(f"{name}: {t*1e3:.2f} ms  ({rate:.0f}M rows/s)  "
              f"(compile {time.time()-t0:.0f}s)", flush=True)
    for name, f in cases.items():
        if only and name not in only:
            continue
        t0 = time.time()
        t = timed_diff(chain(f, 1), chain(f, 4), args, 3.0)
        rate = n2 / t / 1e6
        print(f"{name}: {t*1e3:.2f} ms  ({rate:.0f}M rows/s)  "
              f"(compile {time.time()-t0:.0f}s)", flush=True)


if __name__ == "__main__":
    main()
