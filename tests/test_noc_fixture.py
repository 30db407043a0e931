"""Pin the synthetic NoC protocol fixture (VERDICT r4 item 5).

The fixture (scripts/bench_noc.py) drives the REAL click protocol — conv-dt
argmax first click, uniform-over-FN next clicks via sample_fn_click, the
STOP_IOU gate, InteractiveEvaluator NoC math — over known-geometry masks
with a deterministic oracle head. Any change to click placement, the FN
draw, stop gating, or evaluator scoring shifts these numbers; this test
pins them (threefry PRNG is backend-deterministic)."""
from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts"))


def test_noc_fixture_pinned():
    from bench_noc import run_noc_fixture

    m = run_noc_fixture()
    assert m["NoC@0.85"] == 8.0, m
    assert m["Fail@0.85"] == 0.0, m
    np.testing.assert_allclose(m["mIoU@5"], 68.44, atol=0.5)
    # Monotone coverage under the oracle head: more clicks never hurt.
    assert m["mIoU@1"] < m["mIoU@3"] < m["mIoU@5"] < m["mIoU@10"]


def test_noc_fixture_first_click_is_conv_dt_argmax():
    """The fixture's first click must be the production placement (kornia
    conv-dt argmax), not the exact-EDT one — guards the ADVICE r4 fix."""
    from bench_noc import fixture_masks

    from iuvl_tpu.data.visual_sampler import conv_dt_argmax

    gts = fixture_masks()
    # L-shape (index 4): a geometry where placements can differ.
    y, x = conv_dt_argmax(gts[4])
    assert gts[4][y, x]
