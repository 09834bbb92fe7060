"""SAM global-attention layer shootout at the real shape (VERDICT r2 #3 +
the sam_breakdown 570ms mystery): b*heads=12, N=4096 tokens, d=64, with
decomposed rel-pos bias.

Candidates:
  einsum    the model's default XLA path (materialises [12,4096,4096] f32)
  pallas    ops.flash_attention.flash_attention_relpos (online softmax)
  xla_scan  blockwise online-softmax in plain jnp under lax.scan — flash
            semantics without Pallas's ~300GB/s lowering cap

Each timed fwd and fwd+bwd with slope timing (two chain lengths, single
host fetch). Run: python perf/attn_probe.py
"""

import functools
import json
import time

import jax
import jax.numpy as jnp
import numpy as np

BH, N, D = 12, 4096, 64           # SAM-B global layer: 1 img x 12 heads
H = W = 64                        # 64x64 token grid
SCALE = D ** -0.5


def einsum_attn(q, k, v, rel_h, rel_w):
    """Default path: full [BH,N,N] f32 logits + decomposed bias."""
    attn = jnp.einsum("bnd,bmd->bnm", q * SCALE, k,
                      preferred_element_type=jnp.float32)
    attn = attn.reshape(BH, H, W, H, W)
    attn = attn + rel_h.reshape(BH, H, W, H)[..., :, None] \
                + rel_w.reshape(BH, H, W, W)[..., None, :]
    attn = attn.reshape(BH, N, N)
    p = jax.nn.softmax(attn, axis=-1).astype(jnp.bfloat16)
    return jnp.einsum("bnm,bmd->bnd", p, v,
                      preferred_element_type=jnp.float32)


def xla_scan_attn(q, k, v, rel_h, rel_w, block_k=512):
    """Online-softmax over key blocks in plain XLA. The [N, block] logits
    tile is the only score-shaped buffer; bias is recomputed per block from
    the decomposed tables (rel_h [BH,N,H], rel_w [BH,N,W])."""
    qf = q.astype(jnp.float32) * SCALE
    kb = k.reshape(BH, N // block_k, block_k, D).transpose(1, 0, 2, 3)
    vb = v.reshape(BH, N // block_k, block_k, D).transpose(1, 0, 2, 3)
    # bias for key index m = kh*W + kw is rel_h[:, n, kh] + rel_w[:, n, kw]
    rows_per_b = block_k // W            # key rows covered by one block

    def body(carry, inp):
        acc, m_prev, l_prev = carry
        i, kblk, vblk = inp
        s = jnp.einsum("bnd,bmd->bnm", qf, kblk.astype(jnp.float32))
        kh0 = i * rows_per_b
        bh = jax.lax.dynamic_slice_in_dim(rel_h, kh0, rows_per_b, axis=2)
        bias = (bh[:, :, :, None] + rel_w[:, :, None, :]).reshape(
            BH, N, block_k)
        s = s + bias
        m_cur = jnp.max(s, axis=-1, keepdims=True)
        m_new = jnp.maximum(m_prev, m_cur)
        p = jnp.exp(s - m_new)
        alpha = jnp.exp(m_prev - m_new)
        l_new = l_prev * alpha + jnp.sum(p, axis=-1, keepdims=True)
        acc = acc * alpha + jnp.einsum(
            "bnm,bmd->bnd", p.astype(jnp.bfloat16), vblk,
            preferred_element_type=jnp.float32)
        return (acc, m_new, l_new), None

    nb = N // block_k
    init = (jnp.zeros((BH, N, D), jnp.float32),
            jnp.full((BH, N, 1), -jnp.inf, jnp.float32),
            jnp.zeros((BH, N, 1), jnp.float32))
    (acc, m, l), _ = jax.lax.scan(body, init, (jnp.arange(nb), kb, vb))
    return acc / l


def pallas_attn(q, k, v, rel_h, rel_w):
    import sys
    sys.path.insert(0, ".")
    from simpleaicv_tpu.ops.flash_attention import flash_attention_relpos
    return flash_attention_relpos(q, k, v, rel_h, rel_w)


def slope(fn, args, lo=2, hi=6):
    res = {}
    for reps in (lo, hi):
        @jax.jit
        def chain(q, k, v, rh, rw, _r=reps):
            acc = jnp.zeros((), jnp.float32)
            for _ in range(_r):
                o = fn(q, k, v, rh, rw)
                acc = acc + jnp.sum(o.astype(jnp.float32))
                q = q + (o * 1e-6).astype(q.dtype)
            return acc
        float(chain(*args))
        t0 = time.perf_counter()
        float(chain(*args))
        res[reps] = time.perf_counter() - t0
    return (res[hi] - res[lo]) / (hi - lo)


def slope_grad(fn, args, lo=1, hi=3):
    res = {}
    for reps in (lo, hi):
        def loss(q, k, v, rh, rw, _r=reps):
            acc = jnp.zeros((), jnp.float32)
            for _ in range(_r):
                o = fn(q, k, v, rh, rw)
                acc = acc + jnp.sum(o.astype(jnp.float32) ** 2) * 1e-6
                q = q + (o * 1e-6).astype(q.dtype)
            return acc
        g = jax.jit(jax.grad(loss, argnums=(0, 1, 2)))
        r = g(*args)
        float(jnp.sum(r[0]))
        t0 = time.perf_counter()
        r = g(*args)
        float(jnp.sum(r[0]))
        res[reps] = time.perf_counter() - t0
    return (res[hi] - res[lo]) / (hi - lo)


def main():
    rng = np.random.RandomState(0)
    q = jnp.asarray(rng.randn(BH, N, D) * 0.1, jnp.bfloat16)
    k = jnp.asarray(rng.randn(BH, N, D) * 0.1, jnp.bfloat16)
    v = jnp.asarray(rng.randn(BH, N, D) * 0.1, jnp.bfloat16)
    rel_h = jnp.asarray(rng.randn(BH, N, H) * 0.05, jnp.float32)
    rel_w = jnp.asarray(rng.randn(BH, N, W) * 0.05, jnp.float32)
    args = (q, k, v, rel_h, rel_w)

    out = {"device_kind": getattr(jax.devices()[0], "device_kind", "?"),
           "shape": f"bh{BH} n{N} d{D}"}

    # numeric agreement first
    ref = np.asarray(jax.jit(einsum_attn)(*args), np.float32)
    for name, fn in (("xla_scan", xla_scan_attn), ("pallas", pallas_attn)):
        try:
            got = np.asarray(jax.jit(fn)(*args), np.float32)
            out[f"{name}_maxerr"] = float(np.abs(got - ref).max())
        except Exception as e:
            out[f"{name}_maxerr"] = f"{type(e).__name__}: {e}"[:150]
    print(json.dumps(out), flush=True)

    for name, fn in (("einsum", einsum_attn), ("xla_scan", xla_scan_attn),
                     ("pallas", pallas_attn)):
        try:
            out[f"{name}_fwd_ms"] = round(slope(fn, args) * 1000, 2)
            out[f"{name}_fwdbwd_ms"] = round(slope_grad(fn, args) * 1000, 2)
        except Exception as e:
            out[name] = f"{type(e).__name__}: {e}"[:150]
        print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
