"""Slope timing: run an op chained (data-dependent) inside one jit at two
unroll counts; (t_hi - t_lo) / (hi - lo) gives ms/op with the ~26ms
per-call relay latency and any fixed compile/dispatch cost cancelled.

Helper used by the perf/*_slope.py microbenchmarks.
"""

import time

import jax
import jax.numpy as jnp


def time_slope(build_chain, lo=10, hi=60, warm=True):
    """build_chain(reps) -> jitted fn f(*args)->scalar and its args."""
    results = {}
    for reps in (lo, hi):
        fn, args = build_chain(reps)
        float(fn(*args))  # compile + warm
        t0 = time.perf_counter()
        float(fn(*args))
        results[reps] = time.perf_counter() - t0
    return (results[hi] - results[lo]) / (hi - lo)


def report(name, ms, flops=None, gbytes=None):
    msg = f"{name}: {ms*1000:.3f} ms/op"
    if flops:
        msg += f"  ({flops/ms/1e12:.1f} TF/s, {flops/ms/1e12/197*100:.0f}% MXU)"
    if gbytes:
        msg += f"  ({gbytes/ms:.0f} GB/s)"
    print(msg, flush=True)
