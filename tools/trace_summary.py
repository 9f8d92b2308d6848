"""Summarize a jax.profiler trace: device time by op, top-N table.

Reads the perfetto trace.json.gz written under <profile_dir>/plugins/profile/
by `--profile-dir` (utils/profiling.py) and aggregates slice durations per
op name, separating device lanes (TPU/accelerator tracks) from host lanes.
No tensorboard needed — the driver for perf work on this machine.

Usage: python tools/trace_summary.py <profile_dir> [top_n]
"""

import glob
import gzip
import json
import os
import sys
from collections import defaultdict


def find_trace(root: str) -> str:
    pats = [
        os.path.join(root, "**", "*.trace.json.gz"),
        os.path.join(root, "**", "trace.json.gz"),
    ]
    for p in pats:
        hits = sorted(glob.glob(p, recursive=True))
        if hits:
            return hits[-1]
    raise FileNotFoundError(f"no trace.json.gz under {root}")


def main():
    root = sys.argv[1]
    top_n = int(sys.argv[2]) if len(sys.argv) > 2 else 30
    path = find_trace(root)
    print(f"trace: {path}")
    with gzip.open(path, "rt") as f:
        data = json.load(f)
    events = data["traceEvents"]

    # pid -> process name, to split device vs host tracks
    pid_name = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pid_name[e["pid"]] = e.get("args", {}).get("name", "")

    def is_device(pid):
        n = pid_name.get(pid, "").lower()
        return "tpu" in n or "device" in n or "/device" in n or "accelerator" in n

    # leaf ops only: while/jit wrapper slices nest the real HLO ops and would
    # double-count; hlo_category identifies real ops and also buckets them
    dev_by_op = defaultdict(float)
    dev_count = defaultdict(int)
    cat_of = {}
    by_cat = defaultdict(float)
    host_total = 0.0
    for e in events:
        if e.get("ph") != "X" or "dur" not in e:
            continue
        name = e["name"]
        if not is_device(e["pid"]):
            host_total += e["dur"]
            continue
        if name.startswith(("while", "jit_", "jit(")):
            continue
        dev_by_op[name] += e["dur"]
        dev_count[name] += 1
        cat = e.get("args", {}).get("hlo_category", "?")
        cat_of[name] = cat
        by_cat[cat] += e["dur"]

    dev_total = sum(dev_by_op.values())
    print(f"device leaf total: {dev_total/1e3:.1f} ms   host slices total: {host_total/1e3:.1f} ms")
    print("\nby category:")
    for c, d in sorted(by_cat.items(), key=lambda kv: -kv[1]):
        if d > dev_total * 0.002:
            print(f"  {c:30s} {d/1e3:8.1f} ms {100*d/max(dev_total,1e-9):5.1f}%")
    print(f"\n{'device op':58s} {'ms':>9s} {'x':>5s} {'%':>6s}  category")
    for name, dur in sorted(dev_by_op.items(), key=lambda kv: -kv[1])[:top_n]:
        print(
            f"{name[:58]:58s} {dur/1e3:9.2f} {dev_count[name]:5d} "
            f"{100*dur/max(dev_total,1e-9):6.1f}  {cat_of.get(name,'')[:24]}"
        )


if __name__ == "__main__":
    main()
