"""Capture a SAM-B 1024² flash train-step trace; analyze with
perf/trace_group.py (categories) + perf/trace_ops.py (op attribution).

Usage: python -u perf/sam_trace.py [outdir] [batch]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def capture(outdir="/tmp/samtrace", batch=1):
    import bench_all
    from simpleaicv_tpu.core.registry import LOSSES
    from simpleaicv_tpu.models.interactive_segmentation.sam import sam_b
    from simpleaicv_tpu.tasks.interactive_segmentation import make_loss_fn

    image = 1024
    model = sam_b(image_size=image, use_flash_attention=True)
    rng_np = np.random.RandomState(0)
    pts = np.zeros((batch, 1, 3), np.float32)
    pts[:, :, :2] = rng_np.rand(batch, 1, 2) * image
    pts[:, :, 2] = 1.0
    data = {
        "image": jnp.asarray(rng_np.randn(batch, image, image, 3),
                             jnp.bfloat16),
        "prompt_point": jnp.asarray(pts),
        "prompt_box": None,
        "prompt_mask": None,
        "mask": jnp.asarray(rng_np.rand(batch, image, image) > 0.5,
                            jnp.float32),
    }
    init_prompts = {"prompt_point": data["prompt_point"],
                    "prompt_box": None, "prompt_mask": None}
    state, step, rng = bench_all._build_step(
        model, LOSSES.create("SAMMultiLevelLoss"), make_loss_fn, data,
        (data["image"][:1], init_prompts))
    state, m = step(state, data, rng)
    float(m["loss"])
    rngs = [jax.random.fold_in(rng, i) for i in range(4)]
    jax.block_until_ready(rngs)
    with jax.profiler.trace(outdir):
        for i in range(3):
            state, m = step(state, data, rngs[i])
        float(m["loss"])
    return outdir


if __name__ == "__main__":
    outdir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/samtrace"
    batch = int(sys.argv[2]) if len(sys.argv) > 2 else 1
    capture(outdir, batch)
    print(f"trace -> {outdir}; analyze with perf/trace_group.py + "
          f"perf/trace_ops.py")
