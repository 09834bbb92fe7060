"""Localise SAM-B encoder cost (enc fwd 127ms at 1024^2 = ~2.4% MFU):
slope-time single EncoderBlock variants at the real shape [1,64,64,768].

  windowed   window_size=14 block (8 of 12 layers)
  global     window_size=0 block, full 4096-token attention (4 of 12)
  mlp_only   the block's MLP half alone (LN + 768->3072->768)
  patch_neck patch-embed conv + neck convs (once per model)

12-layer prediction = 8*windowed + 4*global; compare against measured
127ms fwd / 209ms fwd+bwd to find the unexplained remainder.

Run: python perf/sam_encoder_ablation.py
"""

import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")


def slope(fn, args, lo=3, hi=9):
    res = {}
    for reps in (lo, hi):
        @jax.jit
        def chain(v, x, _r=reps):
            acc = jnp.zeros((), jnp.float32)
            for _ in range(_r):
                y = fn(v, x)
                acc = acc + jnp.sum(y.astype(jnp.float32)) * 1e-6
                x = x + (y * 1e-6).astype(x.dtype)
            return acc
        float(chain(*args))
        t0 = time.perf_counter()
        float(chain(*args))
        res[reps] = time.perf_counter() - t0
    return (res[hi] - res[lo]) / (hi - lo)


def slope_grad(fn, args, lo=2, hi=6):
    res = {}
    v0, x0 = args
    for reps in (lo, hi):
        def loss(v, x, _r=reps):
            acc = jnp.zeros((), jnp.float32)
            for _ in range(_r):
                y = fn(v, x)
                acc = acc + jnp.sum(y.astype(jnp.float32) ** 2) * 1e-9
                x = x + (y * 1e-6).astype(x.dtype)
            return acc
        g = jax.jit(jax.grad(loss, argnums=0))
        r = g(v0, x0)
        float(jnp.sum(jax.tree.leaves(r)[0]))
        t0 = time.perf_counter()
        r = g(v0, x0)
        float(jnp.sum(jax.tree.leaves(r)[0]))
        res[reps] = time.perf_counter() - t0
    return (res[hi] - res[lo]) / (hi - lo)


def main():
    from simpleaicv_tpu.models.interactive_segmentation.image_encoder import (
        EncoderBlock)

    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(1, 64, 64, 768) * 0.1, jnp.bfloat16)
    out = {"device_kind": getattr(jax.devices()[0], "device_kind", "?")}

    cases = {
        "windowed": EncoderBlock(12, 4.0, (64, 64), 14),
        "global": EncoderBlock(12, 4.0, (64, 64), 0),
    }
    for name, blk in cases.items():
        v = jax.jit(lambda r, b=blk: b.init({"params": r}, x, False))(
            jax.random.PRNGKey(0))

        def fwd(vv, xx, b=blk):
            return b.apply(vv, xx, False)

        out[f"{name}_fwd_ms"] = round(slope(fwd, (v, x)) * 1000, 2)
        out[f"{name}_fwdbwd_ms"] = round(slope_grad(fwd, (v, x)) * 1000, 2)
        print(json.dumps(out), flush=True)

    pred_f = 8 * out["windowed_fwd_ms"] + 4 * out["global_fwd_ms"]
    pred_b = 8 * out["windowed_fwdbwd_ms"] + 4 * out["global_fwdbwd_ms"]
    out["encoder12_pred_fwd_ms"] = round(pred_f, 1)
    out["encoder12_pred_fwdbwd_ms"] = round(pred_b, 1)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
