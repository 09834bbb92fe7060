"""On-chip flash-attention decision bench (VERDICT r2 #3).

Two measurements on the real TPU chip:
  1. raw attention op, fwd+bwd, seq 4096 / head-dim 64 (SAM-B global-attn
     shape): Pallas flash kernel (ops/flash_attention.py) vs the XLA einsum
     softmax path, slope-timed;
  2. full SAM-B 1024^2 train step with use_flash_attention on vs off
     (bench_all.bench_sam_b_1024).

Outcome gates the `use_flash_attention` default: the round-2 probes
(perf/pallas_bw_probe.py) measured Pallas lowering through this stack at
~250-330 GB/s while XLA fusions exceed 1 TB/s, so flash is expected to LOSE
below the sequence length where O(n^2) materialisation dominates.

Run: python perf/flash_attn_bench.py
"""

import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")


def einsum_attention(q, k, v):
    """Reference XLA path: materialised softmax attention."""
    s = jnp.einsum("bhnd,bhmd->bhnm", q, k) / np.sqrt(q.shape[-1])
    p = jax.nn.softmax(s, -1)
    return jnp.einsum("bhnm,bhmd->bhnd", p, v)


def slope_time(fn, args, lo=4, hi=12):
    """Chained-call slope timing (one host fetch per measurement)."""
    res = {}
    for reps in (lo, hi):
        @jax.jit
        def chain(*a, _reps=reps):
            q, k, v = a
            out = q
            for i in range(_reps):
                out = fn(out, k, v)
            return jnp.sum(out)

        float(chain(*args))
        t0 = time.perf_counter()
        float(chain(*args))
        res[reps] = time.perf_counter() - t0
    return (res[hi] - res[lo]) / (hi - lo)


def slope_time_grad(fn, args, lo=3, hi=9):
    res = {}
    for reps in (lo, hi):
        def loss(q, k, v, _reps=reps):
            out = q
            for i in range(_reps):
                out = fn(out, k, v)
            return jnp.sum(out * out)

        g = jax.jit(jax.grad(loss))
        jnp.sum(g(*args)).block_until_ready()
        float(jnp.sum(g(*args)))
        t0 = time.perf_counter()
        float(jnp.sum(g(*args)))
        res[reps] = time.perf_counter() - t0
    return (res[hi] - res[lo]) / (hi - lo)


def main():
    out = {"device_kind": getattr(jax.devices()[0], "device_kind", "?")}

    # ---- raw op, SAM-B global-attn shape: B=1(x14 windows eq), H=12,
    # N=4096, D=64
    rng = np.random.RandomState(0)
    shape = (1, 12, 4096, 64)
    q = jnp.asarray(rng.randn(*shape), jnp.bfloat16)
    k = jnp.asarray(rng.randn(*shape), jnp.bfloat16)
    v = jnp.asarray(rng.randn(*shape), jnp.bfloat16)

    from simpleaicv_tpu.ops.flash_attention import flash_attention

    def flash(qq, kk, vv):
        return flash_attention(qq, kk, vv)

    out["einsum_fwd_ms"] = round(slope_time(einsum_attention,
                                            (q, k, v)) * 1000, 3)
    out["flash_fwd_ms"] = round(slope_time(flash, (q, k, v)) * 1000, 3)
    out["einsum_fwdbwd_ms"] = round(slope_time_grad(
        einsum_attention, (q, k, v)) * 1000, 3)
    out["flash_fwdbwd_ms"] = round(slope_time_grad(
        flash, (q, k, v)) * 1000, 3)
    print(json.dumps(out), flush=True)

    # ---- full SAM-B 1024 train step on/off
    import bench_all
    out["sam_b_1024_step_flash_off"] = bench_all.bench_sam_b_1024(
        steps=8, use_flash=False)
    print(json.dumps(out), flush=True)
    out["sam_b_1024_step_flash_on"] = bench_all.bench_sam_b_1024(
        steps=8, use_flash=True)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
