"""Aggregate a jax.profiler chrome trace (vm.trace.json.gz) into top HLO ops
by device self-time. Zero-dependency replacement for the tensorboard
hlo_stats tool (which fails to parse xplane in this environment).

Usage: python scripts/trace_top_ops.py [trace.json.gz|latest] [topn] [pattern]
"""
from __future__ import annotations

import glob
import gzip
import json
import re
import sys
from collections import defaultdict


def load(path):
    with gzip.open(path, "rt") as f:
        return json.load(f)


def main():
    arg = sys.argv[1] if len(sys.argv) > 1 else "latest"
    topn = int(sys.argv[2]) if len(sys.argv) > 2 else 40
    pat = sys.argv[3] if len(sys.argv) > 3 else None
    if arg == "latest":
        xs = sorted(glob.glob("/tmp/jaxtrace/**/*.trace.json.gz",
                              recursive=True))
        arg = xs[-1]
    data = load(arg)
    events = data["traceEvents"]
    # find TPU device tracks (pid names like "/device:TPU:0" or "TPU:0")
    pid_names = {}
    tid_names = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pid_names[e["pid"]] = e["args"].get("name", "")
        if e.get("ph") == "M" and e.get("name") == "thread_name":
            tid_names[(e["pid"], e["tid"])] = e["args"].get("name", "")
    dev_pids = {p for p, n in pid_names.items()
                if "TPU" in n or "device" in n.lower()}
    agg = defaultdict(float)
    cnt = defaultdict(int)
    total = 0.0
    for e in events:
        if e.get("ph") != "X" or e.get("pid") not in dev_pids:
            continue
        tname = tid_names.get((e["pid"], e["tid"]), "")
        # XLA op track events carry the HLO op name; skip step/annotation rows
        if "step" in tname.lower():
            continue
        name = e.get("name", "")
        dur = e.get("dur", 0) / 1e3  # us -> ms
        # strip trailing .N ids so clones aggregate
        base = re.sub(r"\.[0-9]+$", "", name)
        agg[base] += dur
        cnt[base] += 1
        total += dur
    print(f"file: {arg}")
    print(f"tracks: {sorted(set(tid_names.values()))[:12]}")
    print(f"total device op time: {total:.1f} ms over {sum(cnt.values())} events")
    rows = sorted(agg.items(), key=lambda kv: -kv[1])
    shown = 0
    for name, ms in rows:
        if pat and not re.search(pat, name):
            continue
        print(f"{ms:9.2f} ms  x{cnt[name]:<5d} {name[:110]}")
        shown += 1
        if shown >= topn:
            break


if __name__ == "__main__":
    main()
