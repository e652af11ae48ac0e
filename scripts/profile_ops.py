"""Aggregate a jax.profiler xplane trace into a per-op time table.

The tensorboard profiler plugin's converter is broken against the installed
TF on this host, so we parse the xplane proto directly (TPU device plane,
'XLA Ops' line) and roll up durations by fusion/op name.

Usage: PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION=python \
       python scripts/profile_ops.py /tmp/trace_train [topN]
"""

from __future__ import annotations

import collections
import glob
import re
import sys


def load_op_times(trace_dir: str):
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    paths = glob.glob(f"{trace_dir}/plugins/profile/*/*.xplane.pb")
    if not paths:
        raise SystemExit(f"no xplane.pb under {trace_dir}")
    space = xplane_pb2.XSpace()
    with open(sorted(paths)[-1], "rb") as f:
        space.ParseFromString(f.read())
    for plane in space.planes:
        if "TPU" not in plane.name and "device" not in plane.name.lower():
            continue
        emeta = plane.event_metadata
        for line in plane.lines:
            if line.name != "XLA Ops":
                continue
            per_op = collections.Counter()
            counts = collections.Counter()
            total = 0
            for ev in line.events:
                name = emeta[ev.metadata_id].name
                per_op[name] += ev.duration_ps
                counts[name] += 1
                total += ev.duration_ps
            return per_op, counts, total
    raise SystemExit("no 'XLA Ops' line in any device plane")


GROUPS = [
    ("conv backward", r"(gradients|transpose).*conv|conv.*(backward|grad)"),
    ("convolution", r"convolution|conv_general|%conv"),
    ("fusion", r"^%?(loop_)?fusion"),
    ("copy/reshape", r"copy|reshape|transpose|bitcast"),
    ("allreduce", r"all-reduce|reduce-scatter|all-gather"),
    ("dynamic-slice/update", r"dynamic.(update.)?slice"),
]


def main() -> None:
    trace_dir = sys.argv[1]
    topn = int(sys.argv[2]) if len(sys.argv) > 2 else 40
    per_op, counts, total = load_op_times(trace_dir)
    print(f"total device op time: {total/1e12:.3f} s over all steps")
    print(f"{'op':<72} {'count':>6} {'ms':>9} {'%':>6}")
    for name, ps in per_op.most_common(topn):
        print(f"{name[:72]:<72} {counts[name]:>6} {ps/1e9:>9.2f} {100*ps/total:>6.2f}")


if __name__ == "__main__":
    main()
