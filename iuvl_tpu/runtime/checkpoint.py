"""Orbax checkpoint management.

Replaces the reference's torch checkpointing (trainer/utils_trainer.py:63-115
+ BaseModel.py:12-48): two modes — WEIGHT (params only, with fuzzy key
alignment on load) and RESUME (full state: params + optimizer + step +
loss-meter scalars), saved per epoch under auto-incremented ``run_N``
directories (distributed_trainer.py:75-110). Orbax writes a single pytree
asynchronously; only process 0 writes in multi-host runs (handled by Orbax).
"""

from __future__ import annotations

import os
import re
from typing import Any

import jax
import numpy as np
import orbax.checkpoint as ocp


def latest_run_dir(base_dir: str, prefix: str = "run_") -> str | None:
    """Highest-numbered existing run directory, or None. RESUME roots the
    checkpoint manager here so a restarted run actually finds its steps
    (reference utils_trainer.py resume semantics)."""
    if not os.path.isdir(base_dir):
        return None
    existing = [
        int(m.group(1))
        for d in os.listdir(base_dir)
        if (m := re.fullmatch(rf"{prefix}(\d+)", d))
    ]
    if not existing:
        return None
    return os.path.join(base_dir, f"{prefix}{max(existing)}")


def next_run_dir(base_dir: str, prefix: str = "run_") -> str:
    """Auto-incrementing run directory (reference distributed_trainer.py:75-110)."""
    os.makedirs(base_dir, exist_ok=True)
    existing = [
        int(m.group(1))
        for d in os.listdir(base_dir)
        if (m := re.fullmatch(rf"{prefix}(\d+)", d))
    ]
    run = max(existing, default=0) + 1
    path = os.path.join(base_dir, f"{prefix}{run}")
    os.makedirs(path, exist_ok=True)
    return path


class CheckpointManager:
    def __init__(self, directory: str, max_to_keep: int = 5):
        self.directory = os.path.abspath(directory)
        self.manager = ocp.CheckpointManager(
            self.directory,
            options=ocp.CheckpointManagerOptions(
                max_to_keep=max_to_keep, create=True
            ),
        )

    def save(self, step: int, state: Any, wait: bool = False):
        self.manager.save(step, args=ocp.args.StandardSave(state))
        if wait:
            self.manager.wait_until_finished()

    def restore(self, step: int | None = None, template: Any = None):
        step = step if step is not None else self.manager.latest_step()
        if step is None:
            return None
        if template is not None:
            return self.manager.restore(
                step, args=ocp.args.StandardRestore(template)
            )
        return self.manager.restore(step)

    @property
    def latest_step(self):
        return self.manager.latest_step()


def align_and_update_params(template: dict, loaded: dict) -> tuple[dict, list[str]]:
    """Fuzzy weight loading: match leaves by longest path suffix + shape
    (reference utils/model.py:31-56 align_and_update_state_dicts).
    Returns (merged params, log of remapped/missing keys)."""
    t_leaves = jax.tree_util.tree_leaves_with_path(template)
    l_leaves = {
        "/".join(str(getattr(k, "key", k)) for k in path): leaf
        for path, leaf in jax.tree_util.tree_leaves_with_path(loaded)
    }
    log = []

    def path_str(path):
        return "/".join(str(getattr(k, "key", k)) for k in path)

    merged = {}
    for path, leaf in t_leaves:
        key = path_str(path)
        if key in l_leaves and np.shape(l_leaves[key]) == np.shape(leaf):
            merged[key] = l_leaves[key]
            continue
        # longest-suffix match with shape agreement
        best, best_len = None, -1
        for lk, lv in l_leaves.items():
            if np.shape(lv) != np.shape(leaf):
                continue
            # common suffix length in path segments
            a, b = key.split("/")[::-1], lk.split("/")[::-1]
            n = 0
            for x, y in zip(a, b):
                if x != y:
                    break
                n += 1
            if n > best_len and n > 0:
                best, best_len = lk, n
        if best is not None:
            merged[key] = l_leaves[best]
            log.append(f"remap {best} -> {key}")
        else:
            merged[key] = leaf
            log.append(f"missing {key} (kept init)")

    # Rebuild the tree structure of the template.
    flat_template, treedef = jax.tree_util.tree_flatten_with_path(template)
    new_leaves = [merged[path_str(p)] for p, _ in flat_template]
    return jax.tree_util.tree_unflatten(treedef, new_leaves), log
