"""Synthetic-fixture NoC protocol bench (VERDICT r4 item 5).

Regression-locks the interactive click PROTOCOL — the product's namesake
metric — without VOC data (zero-egress): known-geometry masks run through
the REAL protocol pieces:

  - first click: ``conv_dt_argmax`` (the reference's kornia conv-dt argmax,
    simpleclick_sampler.py:64-66),
  - next clicks: ``iuvl_tpu.inference.interactive.sample_fn_click`` (the
    production uniform-over-FN draw, proven == the reference's dt>0 draw),
  - stop rule: STOP_IOU = 0.925 (xdecoder_model.py:889),
  - scoring: ``InteractiveEvaluator`` NoC/mIoU math
    (interactive_evaluation.py:42-79).

The ONLY synthetic piece is the mask head: a deterministic "disk painter"
predictor (pred = union of radius-5 disks at the clicks) whose IoU rises
with click count, so NoC@0.85 exercises the full click loop dynamics. Any
change to click placement, FN sampling, stop gating, or evaluator math
shifts the emitted numbers.

Deterministic: fixed fixtures + threefry PRNG -> stable across runs and
backends. Used by bench.py (BENCH_EXTRA rows noc_at_085_synthetic /
miou_at_5_synthetic) and pinned by tests/test_noc_fixture.py.
"""
from __future__ import annotations

import numpy as np


def fixture_masks(size: int = 64):
    """Known-geometry instances: disks, rectangles, an L, a thin bar."""
    yy, xx = np.meshgrid(np.arange(size), np.arange(size), indexing="ij")
    masks = []
    for cy, cx, r in ((20, 20, 10), (40, 44, 13), (32, 12, 7)):
        masks.append((yy - cy) ** 2 + (xx - cx) ** 2 <= r * r)
    rect = np.zeros((size, size), bool)
    rect[10:30, 35:60] = True
    masks.append(rect)
    ell = np.zeros((size, size), bool)
    ell[40:60, 8:18] = True
    ell[52:60, 8:40] = True
    masks.append(ell)
    bar = np.zeros((size, size), bool)
    bar[5:9, 5:55] = True
    masks.append(bar)
    return np.stack(masks)


def disk_predictor(gt: np.ndarray, radius: int = 5):
    """Oracle-shaped head: pred = (union of radius-``radius`` disks at the
    clicks) ∩ gt — IoU rises monotonically with coverage, so NoC@thr counts
    the clicks the FN-sampling protocol needs to cover the instance."""
    size = gt.shape[0]
    yy, xx = np.meshgrid(np.arange(size), np.arange(size), indexing="ij")

    def predict(clicks):
        pred = np.zeros((size, size), bool)
        for x, y in clicks:
            pred |= (yy - y) ** 2 + (xx - x) ** 2 <= radius * radius
        return pred & gt

    return predict


def run_noc_fixture(max_clicks: int = 20, seed: int = 0):
    """Returns the InteractiveEvaluator metrics dict for the fixture set."""
    import jax
    import jax.numpy as jnp

    from iuvl_tpu.data.visual_sampler import conv_dt_argmax
    from iuvl_tpu.evaluation import InteractiveEvaluator
    from iuvl_tpu.inference.interactive import STOP_IOU, sample_fn_click

    gts = fixture_masks()
    evaluator = InteractiveEvaluator(max_clicks=max_clicks)
    sample_jit = jax.jit(sample_fn_click)
    for i, gt in enumerate(gts):
        predict = disk_predictor(gt)
        y, x = conv_dt_argmax(gt)
        clicks = [(x, y)]
        rng = jax.random.PRNGKey(seed * 1000 + i)
        traj = []
        for rnd in range(max_clicks):
            pred = predict(clicks)
            inter = (pred & gt).sum()
            union = (pred | gt).sum()
            iou = inter / (union + 1e-8)
            traj.append(iou)
            rng, r_click = jax.random.split(rng)
            click = np.asarray(
                sample_jit(r_click, jnp.asarray(gt[None]),
                           jnp.asarray(pred[None]))
            )[0]
            if iou < STOP_IOU:  # the loop's keep gate (interactive.py:120)
                clicks.append((float(click[0]), float(click[1])))
        evaluator.process(np.asarray(traj))
    return evaluator.evaluate()


if __name__ == "__main__":
    import json

    print(json.dumps({k: round(v, 4) for k, v in run_noc_fixture().items()},
                     indent=1))
