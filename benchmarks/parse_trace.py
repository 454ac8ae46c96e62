"""Aggregate device op times from a jax.profiler trace.json.gz.

Usage: python benchmarks/parse_trace.py <trace.json.gz> [top_n]
Prints total device-track time per op name (grouped), descending.
"""

from __future__ import annotations

import collections
import gzip
import json
import re
import sys


def main():
    path = sys.argv[1]
    top_n = int(sys.argv[2]) if len(sys.argv) > 2 else 40
    with gzip.open(path, "rt") as f:
        data = json.load(f)
    events = data["traceEvents"]

    # find process ids whose name suggests a device (TPU/XLA ops track)
    pid_names = {}
    for ev in events:
        if ev.get("ph") == "M" and ev.get("name") == "process_name":
            pid_names[ev["pid"]] = ev["args"].get("name", "")
    dev_pids = {p for p, n in pid_names.items()
                if "TPU" in n or "/device" in n.lower()}
    print("processes:", pid_names, file=sys.stderr)

    agg = collections.defaultdict(float)
    cnt = collections.Counter()
    total = 0.0
    for ev in events:
        if ev.get("ph") != "X" or ev.get("pid") not in dev_pids:
            continue
        name = ev.get("name", "?")
        dur = ev.get("dur", 0) / 1e3  # ms
        # strip trailing numeric ids: fusion.123 -> fusion
        base = re.sub(r"[.\d]+$", "", name)
        agg[base] += dur
        cnt[base] += 1
        total += dur
    print(f"total device op time: {total:.1f} ms")
    for name, ms in sorted(agg.items(), key=lambda kv: -kv[1])[:top_n]:
        print(f"{ms:9.1f} ms  {cnt[name]:6d}x  {name}")


if __name__ == "__main__":
    main()
