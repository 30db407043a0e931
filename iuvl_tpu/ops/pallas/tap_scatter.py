"""Pallas tap-row scatter-accumulate for point-sample backwards.

The VJP of bilinear point sampling is a scatter-add of per-point 4-tap
weighted rows into the sampled map. XLA's scatter lowering runs this at
~25M narrow rows/s (20.6 ms for the criterion's 40x12544-point layer —
the single largest item of the composed criterion backward, 204 ms across
10 layers). This kernel keeps one map's accumulator resident in VMEM and
streams the point rows through a serial fori_loop: 8.0 ms for the same
shape (scripts/bench_crit_scatter.py; sort+segment 26.4, four scalar
scatters 13.4).

Layout: rows are scattered in the WIDE-TABLE address space (row ``base``
holds the 4 taps at flat offsets base - pad + {0, 1, w, w+1}) — the caller
folds the 4 tap planes back with shifted slices, mirroring
point_sample's gather.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _scat_kernel(cell_ref, rows_ref, acc_ref):
    acc_ref[...] = jnp.zeros_like(acc_ref)

    def body(i, _):
        c = cell_ref[0, 0, i]
        acc_ref[0, pl.ds(c, 1), :] += rows_ref[0, pl.ds(i, 1), :]
        return 0

    jax.lax.fori_loop(0, cell_ref.shape[2], body, 0)


def tap_scatter(base: jax.Array, rows: jax.Array, span: int) -> jax.Array:
    """Accumulate ``rows[n, p, :]`` at row ``base[n, p]`` of a zeroed
    (N, span, L) table. base (N, P) int32 in [0, span); rows (N, P, L)
    float32 with L a supported lane width (4 for bilinear taps).
    Returns (N, span, L) float32."""
    n, p = base.shape
    lanes = rows.shape[-1]
    span8 = -(-span // 8) * 8
    out = pl.pallas_call(
        _scat_kernel,
        grid=(n,),
        in_specs=[
            pl.BlockSpec((1, 1, p), lambda i: (i, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, p, lanes), lambda i: (i, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, span8, lanes), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((n, span8, lanes), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
    )(base.reshape(n, 1, p).astype(jnp.int32), rows.astype(jnp.float32))
    return out[:, :span]
