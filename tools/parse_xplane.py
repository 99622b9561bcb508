#!/usr/bin/env python
"""Aggregate per-op device time from a jax.profiler trace (xplane.pb).

Usage: python tools/parse_xplane.py <trace_dir> [top_n]

Parses the TPU device plane directly with the tsl xplane proto (the
tensorboard_plugin_profile converter is broken against this TF build) and
prints the top-N HLO ops by total self time, grouped by a coarse category
(fusion / conv / select-and-scatter / copy / all-reduce / ...).
"""

import collections
import glob
import os
import sys

os.environ.setdefault("PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION", "python")


def load_xspace(trace_dir):
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    files = sorted(glob.glob(os.path.join(trace_dir, "**", "*.xplane.pb"),
                             recursive=True))
    if not files:
        raise SystemExit(f"no xplane.pb under {trace_dir}")
    xs = xplane_pb2.XSpace()
    xs.ParseFromString(open(files[-1], "rb").read())
    return xs


def categorize(name: str) -> str:
    n = name.lower()
    for key in ("select-and-scatter", "all-reduce", "reduce-window",
                "convolution", "fusion", "copy", "transpose", "scatter",
                "dynamic-slice", "reduce", "sort", "iota", "dot"):
        if key in n:
            return key
    return name.split(".")[0][:32]


def op_totals(xs, device_only=True):
    per_op = collections.Counter()
    per_cat = collections.Counter()
    total = 0
    for plane in xs.planes:
        if device_only and not plane.name.startswith("/device:TPU"):
            continue
        for line in plane.lines:
            lname = line.name.lower()
            # XLA op lines carry per-op events; skip step/module summary lines
            if "xla op" not in lname and "xla ops" not in lname:
                continue
            for ev in line.events:
                name = plane.event_metadata[ev.metadata_id].name
                dur = ev.duration_ps / 1e6  # -> microseconds
                per_op[name] += dur
                per_cat[categorize(name)] += dur
                total += dur
    return per_op, per_cat, total


def main():
    trace_dir = sys.argv[1]
    top_n = int(sys.argv[2]) if len(sys.argv) > 2 else 25
    xs = load_xspace(trace_dir)
    per_op, per_cat, total = op_totals(xs)
    if not per_op:  # fall back: list planes/lines to debug
        for plane in xs.planes:
            print("PLANE:", plane.name,
                  [ln.name for ln in plane.lines][:10])
        return
    print(f"total device op time: {total/1e3:.2f} ms (all steps in trace)")
    print("\n-- by category --")
    for cat, us in per_cat.most_common(15):
        print(f"{us/1e3:9.2f} ms  {100*us/total:5.1f}%  {cat}")
    print(f"\n-- top {top_n} ops --")
    for name, us in per_op.most_common(top_n):
        print(f"{us/1e3:9.2f} ms  {100*us/total:5.1f}%  {name[:110]}")


if __name__ == "__main__":
    main()
