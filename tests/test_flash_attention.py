"""Flash-attention Pallas kernel vs plain softmax attention (runs in pallas
interpret mode on the CPU test mesh; the same kernel compiles on TPU)."""

import numpy as np
import jax
import jax.numpy as jnp

import simpleaicv_tpu  # noqa: F401
from simpleaicv_tpu.ops.flash_attention import (flash_attention,
                                                reference_attention)


def test_flash_matches_reference():
    rng = np.random.RandomState(0)
    b, h, n, d = 2, 2, 256, 32
    q = jnp.asarray(rng.randn(b, h, n, d).astype(np.float32))
    k = jnp.asarray(rng.randn(b, h, n, d).astype(np.float32))
    v = jnp.asarray(rng.randn(b, h, n, d).astype(np.float32))
    ref = reference_attention(q, k, v)
    ours = flash_attention(q, k, v, block_q=64, block_k=64)
    np.testing.assert_allclose(np.asarray(ours), np.asarray(ref), atol=2e-5,
                               rtol=2e-5)


def test_flash_gradients_match_reference():
    """Custom-VJP backward (FlashAttention-2 recipe) vs autodiff through the
    einsum reference."""
    rng = np.random.RandomState(1)
    b, h, n, d = 1, 2, 128, 32
    q = jnp.asarray(rng.randn(b, h, n, d).astype(np.float32))
    k = jnp.asarray(rng.randn(b, h, n, d).astype(np.float32))
    v = jnp.asarray(rng.randn(b, h, n, d).astype(np.float32))
    w = jnp.asarray(rng.randn(b, h, n, d).astype(np.float32))

    def loss_flash(q, k, v):
        return jnp.sum(flash_attention(q, k, v, block_q=64, block_k=64) * w)

    def loss_ref(q, k, v):
        return jnp.sum(reference_attention(q, k, v) * w)

    gf = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b_ in zip(gf, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), atol=1e-4,
                                   rtol=1e-4)


def test_flash_gradients_bf16():
    rng = np.random.RandomState(2)
    b, h, n, d = 1, 1, 128, 64
    q = jnp.asarray(rng.randn(b, h, n, d), jnp.bfloat16)
    k = jnp.asarray(rng.randn(b, h, n, d), jnp.bfloat16)
    v = jnp.asarray(rng.randn(b, h, n, d), jnp.bfloat16)

    def loss_flash(q, k, v):
        o = flash_attention(q, k, v, block_q=128, block_k=128)
        return jnp.sum(o.astype(jnp.float32)**2)

    def loss_ref(q, k, v):
        o = reference_attention(q, k, v)
        return jnp.sum(o.astype(jnp.float32)**2)

    gf = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b_ in zip(gf, gr):
        np.testing.assert_allclose(np.asarray(a, np.float32),
                                   np.asarray(b_, np.float32),
                                   atol=0.15, rtol=0.1)


def test_flash_relpos_matches_reference():
    """Rel-pos flash (bias decomposed per key row) vs the explicit einsum
    reference with the same bias."""
    from simpleaicv_tpu.ops.flash_attention import flash_attention_relpos
    rng = np.random.RandomState(3)
    bh, kh, kw, d = 3, 16, 16, 32
    n = kh * kw
    q = jnp.asarray(rng.randn(bh, n, d).astype(np.float32))
    k = jnp.asarray(rng.randn(bh, n, d).astype(np.float32))
    v = jnp.asarray(rng.randn(bh, n, d).astype(np.float32))
    rel_h = jnp.asarray(rng.randn(bh, n, kh).astype(np.float32))
    rel_w = jnp.asarray(rng.randn(bh, n, kw).astype(np.float32))

    def ref(q, k, v, rel_h, rel_w):
        s = jnp.einsum("bnd,bmd->bnm", q, k) * (d**-0.5)
        bias = (rel_h[:, :, :, None] + rel_w[:, :, None, :]).reshape(
            bh, n, n)
        p = jax.nn.softmax(s + bias, axis=-1)
        return jnp.einsum("bnm,bmd->bnd", p, v)

    ours = flash_attention_relpos(q, k, v, rel_h, rel_w, block_q=64)
    expect = ref(q, k, v, rel_h, rel_w)
    np.testing.assert_allclose(np.asarray(ours), np.asarray(expect),
                               atol=2e-5, rtol=2e-5)

    w = jnp.asarray(rng.randn(bh, n, d).astype(np.float32))
    gf = jax.grad(lambda *a: jnp.sum(flash_attention_relpos(
        *a, block_q=64) * w), argnums=(0, 1, 2, 3, 4))(q, k, v, rel_h, rel_w)
    gr = jax.grad(lambda *a: jnp.sum(ref(*a) * w),
                  argnums=(0, 1, 2, 3, 4))(q, k, v, rel_h, rel_w)
    for a, b_ in zip(gf, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), atol=1e-4,
                                   rtol=1e-4)


def test_sam_encoder_flash_equivalence():
    """ViTImageEncoder with use_flash_attention=True (global layers route
    through flash_attention_relpos) matches the einsum path."""
    from simpleaicv_tpu.models.interactive_segmentation.image_encoder import \
        ViTImageEncoder

    kwargs = dict(image_size=128, patch_size=16, embedding_planes=64,
                  block_nums=2, head_nums=2, window_size=2,
                  global_attn_indexes=(1,), out_planes=32)
    enc_ref = ViTImageEncoder(**kwargs)
    enc_flash = ViTImageEncoder(use_flash_attention=True, **kwargs)

    x = jnp.asarray(np.random.RandomState(0).rand(2, 128, 128, 3),
                    jnp.float32)
    v = jax.jit(lambda: enc_ref.init({"params": jax.random.PRNGKey(0)}, x,
                                     False))()
    # n = (128/16)^2 = 64 tokens -> NOT a 128 multiple: falls back to einsum
    a = enc_ref.apply(v, x, False)
    b = enc_flash.apply(v, x, False)
    np.testing.assert_allclose(np.asarray(a, np.float32),
                               np.asarray(b, np.float32), atol=1e-5)

    # 256 tokens (grid 16x16): flash kicks in on the global layer
    kwargs["image_size"] = 256
    enc_ref = ViTImageEncoder(**kwargs)
    enc_flash = ViTImageEncoder(use_flash_attention=True, **kwargs)
    x = jnp.asarray(np.random.RandomState(1).rand(1, 256, 256, 3),
                    jnp.float32)
    v = jax.jit(lambda: enc_ref.init({"params": jax.random.PRNGKey(0)}, x,
                                     False))()
    a = np.asarray(enc_ref.apply(v, x, False), np.float32)
    b = np.asarray(enc_flash.apply(v, x, False), np.float32)
    # einsum path casts probs to bf16 before PV; flash keeps f32 accumulators
    np.testing.assert_allclose(a, b, atol=5e-2, rtol=5e-2)
    assert np.corrcoef(a.ravel(), b.ravel())[0, 1] > 0.9999


def test_xla_flash_matches_reference_fwd_and_grad():
    """The production (plain-XLA online-softmax) flash path: exact vs the
    reference einsum attention, forward and gradients."""
    from simpleaicv_tpu.ops.flash_attention import (flash_attention_xla,
                                                    reference_attention)
    rng = np.random.RandomState(0)
    q = jnp.asarray(rng.randn(2, 3, 64, 16) * 0.1, jnp.float32)
    k = jnp.asarray(rng.randn(2, 3, 64, 16) * 0.1, jnp.float32)
    v = jnp.asarray(rng.randn(2, 3, 64, 16) * 0.1, jnp.float32)
    want = reference_attention(q, k, v)
    got = flash_attention_xla(q, k, v, block_k=16)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-6)

    def grads(fn):
        return jax.grad(lambda *a: jnp.sum(fn(*a) ** 2),
                        argnums=(0, 1, 2))(q, k, v)

    for a, b in zip(grads(reference_attention),
                    grads(lambda q, k, v: flash_attention_xla(
                        q, k, v, block_k=16))):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_xla_relpos_flash_matches_reference_fwd_and_grad():
    from simpleaicv_tpu.ops.flash_attention import flash_attention_relpos_xla
    rng = np.random.RandomState(1)
    BH, KH, KW, D = 3, 8, 8, 16
    N = KH * KW
    q = jnp.asarray(rng.randn(BH, N, D) * 0.1, jnp.float32)
    k = jnp.asarray(rng.randn(BH, N, D) * 0.1, jnp.float32)
    v = jnp.asarray(rng.randn(BH, N, D) * 0.1, jnp.float32)
    rh = jnp.asarray(rng.randn(BH, N, KH) * 0.05, jnp.float32)
    rw = jnp.asarray(rng.randn(BH, N, KW) * 0.05, jnp.float32)

    def ref(q, k, v, rh, rw):
        s = jnp.einsum("bnd,bmd->bnm", q * (D ** -0.5), k)
        s = s.reshape(BH, N, KH, KW) + rh[..., :, None] + rw[..., None, :]
        p = jax.nn.softmax(s.reshape(BH, N, N), -1)
        return jnp.einsum("bnm,bmd->bnd", p, v)

    want = ref(q, k, v, rh, rw)
    got = flash_attention_relpos_xla(q, k, v, rh, rw)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-6)

    def grads(fn):
        return jax.grad(lambda *a: jnp.sum(fn(*a) ** 2),
                        argnums=(0, 1, 2, 3, 4))(q, k, v, rh, rw)

    for a, b in zip(grads(ref), grads(flash_attention_relpos_xla)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_xla_flash_padded_lengths_fwd_and_grad():
    """Sequence lengths that don't divide the key block (ViT's 197) take the
    auto-padding + key-mask path — exact vs einsum attention incl. grads."""
    from simpleaicv_tpu.ops.flash_attention import (flash_attention_xla,
                                                    reference_attention)
    rng = np.random.RandomState(1)
    for n, block in ((197, 64), (197, 512), (100, 32), (130, 128)):
        q = jnp.asarray(rng.randn(2, 2, n, 16) * 0.1, jnp.float32)
        k = jnp.asarray(rng.randn(2, 2, n, 16) * 0.1, jnp.float32)
        v = jnp.asarray(rng.randn(2, 2, n, 16) * 0.1, jnp.float32)
        want = reference_attention(q, k, v)
        got = flash_attention_xla(q, k, v, block_k=block)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=1e-6)

        def grads(fn):
            return jax.grad(lambda *a: jnp.sum(fn(*a) ** 2),
                            argnums=(0, 1, 2))(q, k, v)

        for a, b in zip(grads(reference_attention),
                        grads(lambda q, k, v: flash_attention_xla(
                            q, k, v, block_k=block))):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=1e-6, err_msg=f"n={n} b={block}")


def test_vit_flash_option_matches_einsum_path():
    """ViT-B attention block with use_flash_attention on/off: same outputs
    and grads at the real 197-token shape."""
    from simpleaicv_tpu.models.backbones.vit import MultiHeadAttention
    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.randn(2, 197, 64) * 0.1, jnp.float32)
    m_ein = MultiHeadAttention(head_nums=4, use_flash_attention=False,
                               dtype=jnp.float32)
    m_fla = MultiHeadAttention(head_nums=4, use_flash_attention=True,
                               dtype=jnp.float32)
    variables = m_ein.init(jax.random.PRNGKey(0), x)
    out_e = m_ein.apply(variables, x)
    out_f = m_fla.apply(variables, x)
    np.testing.assert_allclose(np.asarray(out_f), np.asarray(out_e),
                               atol=2e-5)
    ge = jax.grad(lambda p: jnp.sum(m_ein.apply(p, x) ** 2))(variables)
    gf = jax.grad(lambda p: jnp.sum(m_fla.apply(p, x) ** 2))(variables)
    for a, b in zip(jax.tree.leaves(ge), jax.tree.leaves(gf)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-4)


def test_attention_recompute_matches_reference_fwd_and_grad():
    """The short-sequence recompute path (one-shot softmax forward, FA-2
    einsum-recompute backward, lse-only residual): exact vs einsum
    attention, forward and gradients, incl. a non-divisible length."""
    from simpleaicv_tpu.ops.flash_attention import (attention_recompute_xla,
                                                    reference_attention)
    rng = np.random.RandomState(3)
    for n in (64, 197):
        q = jnp.asarray(rng.randn(2, 3, n, 16) * 0.1, jnp.float32)
        k = jnp.asarray(rng.randn(2, 3, n, 16) * 0.1, jnp.float32)
        v = jnp.asarray(rng.randn(2, 3, n, 16) * 0.1, jnp.float32)
        want = reference_attention(q, k, v)
        got = attention_recompute_xla(q, k, v)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=1e-6)

        def grads(fn):
            return jax.grad(lambda *a: jnp.sum(fn(*a) ** 2),
                            argnums=(0, 1, 2))(q, k, v)

        for a, b in zip(grads(reference_attention),
                        grads(attention_recompute_xla)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=1e-6, err_msg=f"n={n}")


def test_vit_recompute_option_matches_einsum_path():
    """ViT attention with use_recompute_attention: same outputs/grads at the
    197-token shape."""
    from simpleaicv_tpu.models.backbones.vit import MultiHeadAttention
    rng = np.random.RandomState(4)
    x = jnp.asarray(rng.randn(2, 197, 64) * 0.1, jnp.float32)
    m_ein = MultiHeadAttention(head_nums=4, dtype=jnp.float32)
    m_rec = MultiHeadAttention(head_nums=4, use_recompute_attention=True,
                               dtype=jnp.float32)
    variables = m_ein.init(jax.random.PRNGKey(0), x)
    out_e = m_ein.apply(variables, x)
    out_r = m_rec.apply(variables, x)
    np.testing.assert_allclose(np.asarray(out_r), np.asarray(out_e),
                               atol=2e-5)
    ge = jax.grad(lambda p: jnp.sum(m_ein.apply(p, x) ** 2))(variables)
    gr = jax.grad(lambda p: jnp.sum(m_rec.apply(p, x) ** 2))(variables)
    for a, b in zip(jax.tree.leaves(ge), jax.tree.leaves(gr)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-4)
