#!/usr/bin/env python
"""Summarize a jax.profiler Chrome trace: per-op device time, grouped.

Finds the newest `*.trace.json.gz` under the given trace dir (the layout
`plugins/profile/<stamp>/<host>.trace.json.gz` that `jax.profiler.trace`
emits), sums the duration of complete events on the device tracks, and
prints the top ops plus a grouped rollup (pallas custom-calls vs XLA
fusions vs convolutions/dots vs infeed/outfeed/sync).

    python scripts/analyze_trace.py /tmp/trace_r3 [--top 40]
"""

import argparse
import collections
import glob
import gzip
import json
import os
import re
import sys


def find_trace(root: str) -> str:
    hits = sorted(glob.glob(os.path.join(root, "**", "*.trace.json.gz"),
                            recursive=True), key=os.path.getmtime)
    if not hits:
        sys.exit(f"no *.trace.json.gz under {root}")
    return hits[-1]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("trace_dir")
    ap.add_argument("--top", type=int, default=40)
    ap.add_argument("--pid-filter", type=str, default="TPU|/device:|Device",
                    help="regex a track (process) name must match")
    cli = ap.parse_args()

    path = find_trace(cli.trace_dir)
    with gzip.open(path, "rt") as f:
        data = json.load(f)
    events = data["traceEvents"]

    # map pid -> process name from metadata events
    pid_name = {}
    tid_name = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pid_name[e["pid"]] = e["args"].get("name", "")
        if e.get("ph") == "M" and e.get("name") == "thread_name":
            tid_name[(e["pid"], e["tid"])] = e["args"].get("name", "")

    pat = re.compile(cli.pid_filter)
    device_pids = {pid for pid, name in pid_name.items() if pat.search(name)}
    if not device_pids:
        print("process names seen:", sorted(set(pid_name.values())))
        sys.exit("no device track matched the filter")

    per_op = collections.Counter()
    per_op_n = collections.Counter()
    total = 0.0
    for e in events:
        if e.get("ph") != "X" or e.get("pid") not in device_pids:
            continue
        tname = tid_name.get((e["pid"], e["tid"]), "")
        # XLA op lanes are usually named "XLA Ops"/"Steps"/"TensorFlow Ops";
        # skip derived lanes that double-count (e.g. "Steps", "Framework ops")
        if tname and not re.search(r"XLA Ops|XLA TraceMe|Ops", tname):
            continue
        dur = float(e.get("dur", 0.0))
        name = e.get("name", "?")
        per_op[name] += dur
        per_op_n[name] += 1
        total += dur

    print(f"trace: {path}")
    print(f"device tracks: {[pid_name[p] for p in sorted(device_pids)]}")
    print(f"total device op time: {total/1e3:.3f} ms "
          f"(across all captured steps)\n")

    groups = collections.Counter()
    for name, dur in per_op.items():
        low = name.lower()
        if "custom-call" in low or "pallas" in low or "mosaic" in low or low.startswith("tpu_custom_call"):
            g = "pallas/custom-call"
        elif low.startswith("fusion") or ".fusion" in low:
            g = "xla fusion"
        elif "cholesky" in low or "triangular" in low:
            g = "cholesky/solve"
        elif "dot" in low or "conv" in low:
            g = "dot/conv"
        elif "dynamic" in low or "slice" in low or "concat" in low or "copy" in low or "transpose" in low or "reshape" in low or "bitcast" in low:
            g = "data movement"
        elif "rng" in low or "threefry" in low:
            g = "rng"
        elif "infeed" in low or "outfeed" in low or "barrier" in low or "sync" in low:
            g = "host sync"
        else:
            g = "other"
        groups[g] += dur

    print("== groups ==")
    for g, dur in groups.most_common():
        print(f"{dur/1e3:9.3f} ms  {100*dur/max(total,1e-9):5.1f}%  {g}")

    print(f"\n== top {cli.top} ops ==")
    for name, dur in per_op.most_common(cli.top):
        print(f"{dur/1e3:9.3f} ms  n={per_op_n[name]:4d}  "
              f"{100*dur/max(total,1e-9):5.1f}%  {name[:110]}")


if __name__ == "__main__":
    main()
