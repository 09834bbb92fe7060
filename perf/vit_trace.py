"""Capture a ViT-B/16 train-step trace, print per-fusion device-time
breakdown (top ops). Usage: python perf/vit_trace.py [outdir]"""

import glob
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def capture(outdir="/tmp/vittrace"):
    import bench_all
    from simpleaicv_tpu.core.registry import BACKBONES
    from simpleaicv_tpu.losses import CELoss
    from simpleaicv_tpu.tasks.classification import make_loss_fn

    batch, image = 128, 224
    model = BACKBONES.create("vit_base_patch16", image_size=image,
                             num_classes=1000)
    x0 = jnp.zeros((batch, image, image, 3), jnp.bfloat16)
    data = {
        "image": jnp.asarray(np.random.RandomState(0).randn(
            batch, image, image, 3), jnp.bfloat16),
        "label": jnp.asarray(np.random.RandomState(1).randint(
            0, 1000, (batch,)), jnp.int32),
    }
    state, step, rng = bench_all._build_step(model, CELoss(), make_loss_fn,
                                             data, (x0, True))
    state, m = step(state, data, rng)
    float(m["loss"])
    rngs = [jax.random.fold_in(rng, i) for i in range(4)]
    jax.block_until_ready(rngs)
    with jax.profiler.trace(outdir):
        for i in range(3):
            state, m = step(state, data, rngs[i])
        float(m["loss"])
    return outdir


def analyze(outdir, n_steps=3, top=25):
    from tensorflow.tsl.profiler.protobuf import xplane_pb2
    paths = sorted(glob.glob(os.path.join(outdir, "**", "*.xplane.pb"),
                             recursive=True))
    assert paths, f"no xplane under {outdir}"
    xspace = xplane_pb2.XSpace()
    with open(paths[-1], "rb") as f:
        xspace.ParseFromString(f.read())
    import re
    for plane in xspace.planes:
        if "TPU" not in plane.name:
            continue
        print(f"== plane: {plane.name}")
        tot = {}
        for line in plane.lines:
            if "XLA Ops" not in line.name and line.name != "XLA Op":
                continue
            for ev in line.events:
                name = plane.event_metadata[ev.metadata_id].name
                base = re.sub(r"\.\d+$", "", name)
                tot[base] = tot.get(base, 0) + ev.duration_ps / 1e9
        items = sorted(tot.items(), key=lambda kv: -kv[1])
        s = sum(tot.values())
        print(f"total device ms over {n_steps} steps: {s:.2f} "
              f"({s / n_steps:.2f}/step)")
        for k, v in items[:top]:
            print(f"  {v / n_steps:8.3f} ms/step  {k}")


if __name__ == "__main__":
    outdir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/vittrace"
    analyze(capture(outdir))
