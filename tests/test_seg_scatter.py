"""Block one-hot segmented scatter (ops/pallas/seg_scatter) — interpret-mode
parity vs the XLA scatter-add oracle, including block-padding edge cases.

Status: MEASURED NEGATIVE on v5e for the deformable d_value scatter (the
kernel itself hits ~1 ms as designed, but any formulation pays ~8 ms/pass
re-reading 688k permuted rows from a 352 MB HBM operand — the XLA scatter
is already at that row-rate floor; ROADMAP r5). Kept as an oracle-tested
building block for workloads whose rows fit VMEM-stageable operands."""
from __future__ import annotations

from unittest import mock

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import iuvl_tpu.ops.pallas.seg_scatter as ss


@pytest.fixture()
def interpret_pallas():
    orig = ss.pl.pallas_call

    def interp(*a, **k):
        k["interpret"] = True
        k.pop("compiler_params", None)
        return orig(*a, **k)

    with mock.patch.object(ss.pl, "pallas_call", interp):
        yield


@pytest.mark.parametrize("r,n_out,block,chunk", [
    (4096, 1024, 256, 128),
    (5000, 512, 512, 256),   # r not a chunk multiple
    (700, 2048, 256, 128),   # many empty blocks (must still be zeroed)
])
def test_matches_xla_scatter_add(interpret_pallas, r, n_out, block, chunk):
    rs = np.random.RandomState(r)
    contrib = jnp.asarray(rs.randn(r, 256), jnp.bfloat16)
    idx = jnp.asarray(rs.randint(0, n_out, r), jnp.int32)
    got = ss.segmented_scatter_add(contrib, idx, n_out, block=block,
                                   chunk=chunk)
    want = jnp.zeros((n_out, 256), jnp.float32).at[idx].add(
        contrib.astype(jnp.float32))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=0, atol=1e-4)


def test_skewed_all_rows_one_cell(interpret_pallas):
    rs = np.random.RandomState(0)
    contrib = jnp.asarray(rs.randn(3000, 64), jnp.bfloat16)
    idx = jnp.zeros(3000, jnp.int32)
    got = ss.segmented_scatter_add(contrib, idx, 512, block=512, chunk=256)
    want = jnp.zeros((512, 64), jnp.float32).at[idx].add(
        contrib.astype(jnp.float32))
    scale = float(jnp.abs(want).max())
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=0, atol=3e-4 * max(scale, 1.0))
