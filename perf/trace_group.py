"""Group an existing xplane trace by op-category (base fusion name), print
per-step totals. Async copy/slice-start ops are listed separately — their
spans overlap compute and don't add to occupancy.

Usage: python perf/trace_group.py [trace_dir] [n_steps]
"""

import glob
import re
import sys


def main(outdir="/tmp/jaxtrace_r2", n_steps=3):
    n_steps = int(n_steps)
    from tensorflow.tsl.profiler.protobuf import xplane_pb2
    paths = sorted(glob.glob(f"{outdir}/**/*.xplane.pb", recursive=True))
    assert paths, f"no xplane under {outdir}"
    xspace = xplane_pb2.XSpace()
    with open(paths[-1], "rb") as f:
        xspace.ParseFromString(f.read())

    for plane in xspace.planes:
        if "TPU" not in plane.name:
            continue
        print(f"== plane: {plane.name}")
        sync_tot, async_tot = {}, {}
        for line in plane.lines:
            if "XLA Ops" not in line.name and line.name != "XLA Op":
                continue
            for ev in line.events:
                meta = plane.event_metadata[ev.metadata_id]
                name = meta.name.split(" = ")[0].lstrip("%")
                base = re.sub(r"[.\d]+$", "", name)
                is_async = ("copy-start" in base or "slice-start" in base
                            or "copy-done" in base or "slice-done" in base
                            or "all-reduce-start" in base)
                d = async_tot if is_async else sync_tot
                d[base] = d.get(base, 0) + ev.duration_ps
        for label, totals in (("SYNC (occupancy)", sync_tot),
                              ("ASYNC (overlapped spans)", async_tot)):
            grand = sum(totals.values())
            print(f"-- {label}: {grand/1e12*1000/n_steps:.2f} ms/step")
            for name, ps in sorted(totals.items(), key=lambda kv: -kv[1])[:25]:
                print(f"  {ps/1e12*1000/n_steps:8.3f} ms/step  {name}")


if __name__ == "__main__":
    args = sys.argv[1:]
    main(*(args or ["/tmp/jaxtrace_r2"]))
