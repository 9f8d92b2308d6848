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

    dev_by_op = defaultdict(float)
    host_total = 0.0
    dev_total = 0.0
    for e in events:
        if e.get("ph") != "X" or "dur" not in e:
            continue
        if is_device(e["pid"]):
            dev_by_op[e["name"]] += e["dur"]
            dev_total += e["dur"]
        else:
            host_total += e["dur"]

    print(f"device total: {dev_total/1e3:.1f} ms   host slices total: {host_total/1e3:.1f} ms")
    print(f"{'device op':70s} {'ms':>9s} {'%':>6s}")
    for name, dur in sorted(dev_by_op.items(), key=lambda kv: -kv[1])[:top_n]:
        print(f"{name[:70]:70s} {dur/1e3:9.2f} {100*dur/max(dev_total,1e-9):6.1f}")


if __name__ == "__main__":
    main()
