"""Capture a jax.profiler trace of the ResNet-50 train step and print a
per-fusion duration breakdown (top ops by total device time).

Usage: python perf/trace_step.py [variant] [outdir]
"""

import glob
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np


def capture(variant="base", outdir="/tmp/jaxtrace"):
    from perf.variants import build
    state, run_once, fetch, rng = build(variant)
    state, m = run_once(state)
    fetch(state, m)  # compile
    with jax.profiler.trace(outdir):
        for _ in range(3):
            state, m = run_once(state)
        fetch(state, m)
    return outdir


def analyze(outdir):
    from tensorflow.tsl.profiler.protobuf import xplane_pb2
    paths = sorted(glob.glob(os.path.join(outdir, "**", "*.xplane.pb"),
                             recursive=True))
    assert paths, f"no xplane under {outdir}"
    xspace = xplane_pb2.XSpace()
    with open(paths[-1], "rb") as f:
        xspace.ParseFromString(f.read())

    for plane in xspace.planes:
        if "TPU" not in plane.name and "Device" not in plane.name:
            continue
        print(f"== plane: {plane.name}")
        totals = {}
        counts = {}
        for line in plane.lines:
            if "XLA Ops" not in line.name and "XLA Op" != line.name and \
                    "Steps" in line.name:
                continue
            for ev in line.events:
                meta = plane.event_metadata[ev.metadata_id]
                name = meta.name
                totals[name] = totals.get(name, 0) + ev.duration_ps
                counts[name] = counts.get(name, 0) + 1
        if not totals:
            continue
        items = sorted(totals.items(), key=lambda kv: -kv[1])
        grand = sum(totals.values())
        print(f"total device-op time: {grand/1e12*1000:.2f} ms "
              f"(over all traced steps)")
        for name, ps in items[:40]:
            print(f"{ps/1e12*1000:8.3f} ms  x{counts[name]:<4d} {name[:110]}")


if __name__ == "__main__":
    variant = sys.argv[1] if len(sys.argv) > 1 else "base"
    outdir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/jaxtrace"
    capture(variant, outdir)
    analyze(outdir)
