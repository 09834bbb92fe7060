"""Print the top individual SYNC ops of an xplane trace with their HLO
instruction text (shapes + called computation), so a category like 'fusion'
can be attributed to actual model ops (qkv / FFN GEMMs / layernorm / ...).

Usage: python perf/trace_ops.py [trace_dir] [n_steps] [top]
"""

import glob
import re
import sys


def main(outdir="/tmp/vittrace", n_steps=3, top=40, width=200):
    n_steps, top = int(n_steps), int(top)
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
        tot = {}
        for line in plane.lines:
            if "XLA Ops" not in line.name and line.name != "XLA Op":
                continue
            for ev in line.events:
                meta = plane.event_metadata[ev.metadata_id]
                name = meta.name.split(" = ")[0].lstrip("%")
                if ("-start" in name or "-done" in name):
                    continue  # async spans overlap compute
                cur = tot.get(name)
                if cur is None:
                    tot[name] = [ev.duration_ps, meta.name]
                else:
                    cur[0] += ev.duration_ps
        items = sorted(tot.items(), key=lambda kv: -kv[1][0])
        s = sum(v[0] for v in tot.values())
        print(f"sync occupancy: {s / 1e12 * 1000 / n_steps:.2f} ms/step; "
              f"top {top} ops:")
        for name, (ps, text) in items[:top]:
            text = re.sub(r"\s+", " ", text)[:width]
            print(f"  {ps / 1e12 * 1000 / n_steps:8.3f} ms/step  {text}")


if __name__ == "__main__":
    a = sys.argv[1:]
    main(*a)
