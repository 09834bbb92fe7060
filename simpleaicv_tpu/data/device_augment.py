"""On-device (jit-compiled) batched data augmentation.

TPU-first replacement for the host PIL augmentation path
(``data/auto_rand_augment.py``; reference
``simpleAICV/classification/auto_rand_augment.py:36-690``): the reference
runs AutoAugment/RandAugment per image in Python/PIL inside DataLoader
workers, which needs dozens of host cores to keep an accelerator fed.  Here
the whole op zoo runs *inside the jitted train step* on the sharded global
batch, so augmentation rides the MXU/VPU and host workers only decode.

The op zoo factors into three batched primitives (instead of 16 scalar ops):

  * **one affine warp** — ShearX/Y, TranslateX/Y (abs+rel) and Rotate are all
    affine; per-image 6-coeff matrices are built arithmetically and applied
    with a single nearest-neighbour gather.  The gather moves 32-element
    channel-padded slices: TPU XLA lowers tiny-slice gathers (3 floats) into
    scalar loops, while >=32-element slices take the fast vector path (the
    same regime ops/msda.py runs in).
  * **closed-form point ops** — Invert, Solarize, SolarizeAdd, Posterize and
    AutoContrast are analytic per-pixel maps (AutoContrast's scale/offset
    are per-channel reductions), computed directly on the VPU; no table, no
    gather.  Only **Equalize** needs a data-dependent 256-entry LUT: its
    histogram is two 16-wide one-hot nibble tensors contracted on the MXU
    (``hist[v] = sum_p onehot16(v>>4) x onehot16(v&15)``, an exact [16,P]@
    [P,16] matmul), and the LUT is applied by the inverse nibble
    contraction — augmentation never scatters and never gathers per-pixel.
  * **one blend** — Brightness/Color/Contrast/Sharpness are
    ``clip(floor(deg + f*(img-deg)))`` against four degenerate images
    (black / grayscale / mean-gray / smoothed).

PIL semantics were pinned empirically and are matched exactly (integer
math) except where PIL's own float32 rounding makes the last bit
platform-defined (enhance blends, autocontrast scale) — those are tested to
±1 uint8 LSB (see tests/test_device_augment.py):

  * affine/rotate nearest:  ``src = floor(M @ (out + 0.5))``; out-of-bounds
    pixels take the fill colour (128,128,128).  Rotate is about the image
    centre (w/2, h/2).
  * enhance blend: truncation, ``clip(trunc(deg + f*(img - deg)), 0, 255)``.
  * grayscale L (ITU-R 601-2 fixed point):
    ``(19595 R + 38470 G + 7471 B + 32768) >> 16``.
  * equalize: PIL ImageOps.equalize integer LUT —
    ``step = (npix - hist[last_nonzero]) // 255``,
    ``lut[i] = clip((step//2 + cumsum_excl(hist)[i]) // step, 0, 255)``,
    identity when ``step == 0`` or the channel has <= 1 occupied bin.
  * autocontrast (cutoff=0): ``lut[i] = clip(trunc((i - lo) * 255/(hi-lo)))``.

Randomness contract mirrors the host classes 1:1: AutoAugment draws ONE
sub-policy per image and applies its two (op, prob, magnitude) slots in
order; RandAugment draws N ops uniformly (with replacement) per image, each
applied with probability ``prob`` and magnitude jittered by
``magnitude_std``; geometric / increasing-enhance magnitudes are negated
with probability 1/2.

All fns take float32 images [B,H,W,3] valued in [0,255] (they are floored
to the uint8 lattice first, mirroring the host path's
``np.clip(img,0,255).astype(uint8)``) and are differentiable-free data ops:
use only on inputs, under ``jax.lax.stop_gradient`` semantics (no params).
"""

from __future__ import annotations

import math
import os

import numpy as np
import jax
import jax.numpy as jnp

from .auto_rand_augment import (_POLICIES, _RAND_TRANSFORMS,
                                _RAND_INCREASING_TRANSFORMS, _MAX_LEVEL,
                                _TRANSLATE_CONST)

__all__ = [
    "DeviceAutoAugment", "DeviceRandAugment", "DeviceNormalize",
    "DeviceRandomErasing", "DeviceMixupCutmix", "DeviceAugmentPipeline",
]

_FILL = 128.0

# op classes
_CLS_ID, _CLS_GEOM, _CLS_LUT, _CLS_BLEND = 0, 1, 2, 3
# geometric kinds
_G_SHEARX, _G_SHEARY, _G_TXABS, _G_TYABS, _G_TXREL, _G_TYREL, _G_ROT = \
    1, 2, 3, 4, 5, 6, 7
# LUT kinds
_L_INV, _L_SOL, _L_SOLADD, _L_POST, _L_EQ, _L_AC = 1, 2, 3, 4, 5, 6
# blend kinds
_B_BRIGHT, _B_COLOR, _B_CONTRAST, _B_SHARP = 1, 2, 3, 4

# Unified level->arg spec (host _level_to_arg, data/auto_rand_augment.py:123):
#   m = clip(level_jittered, 0, 10) / 10
#   inner = p1 * m ; f = floor(inner) if cast else inner
#   sign = +/-1 with prob 1/2 if neg else +1
#   arg = clip(q0 + q1 * sign * f, qlo, qhi)
# row layout: [prob, op_class, kind, p1, cast, q0, q1, neg, qlo, qhi, level]
_ROW_LEN = 11


def _op_spec(name):
    inf = 1e30
    if name == "AutoContrast":
        return (_CLS_LUT, _L_AC, 1, 0, 0, 0, 0, 0, 0)
    if name == "Equalize":
        return (_CLS_LUT, _L_EQ, 1, 0, 0, 0, 0, 0, 0)
    if name == "Invert":
        return (_CLS_LUT, _L_INV, 1, 0, 0, 0, 0, 0, 0)
    if name == "Rotate":
        return (_CLS_GEOM, _G_ROT, 1, 0, 0, 30.0, 1, -inf, inf)
    if name == "Posterize":
        return (_CLS_LUT, _L_POST, 4, 1, 0, 1, 0, 0, 8)
    if name == "PosterizeIncreasing":
        return (_CLS_LUT, _L_POST, 4, 1, 4, -1, 0, 0, 8)
    if name == "PosterizeOriginal":
        return (_CLS_LUT, _L_POST, 4, 1, 4, 1, 0, 0, 8)
    if name == "Solarize":
        return (_CLS_LUT, _L_SOL, 256, 1, 0, 1, 0, 0, 256)
    if name == "SolarizeIncreasing":
        return (_CLS_LUT, _L_SOL, 256, 1, 256, -1, 0, 0, 256)
    if name == "SolarizeAdd":
        return (_CLS_LUT, _L_SOLADD, 110, 1, 0, 1, 0, 0, 128)
    if name in ("Color", "Contrast", "Brightness", "Sharpness"):
        kind = {"Brightness": _B_BRIGHT, "Color": _B_COLOR,
                "Contrast": _B_CONTRAST, "Sharpness": _B_SHARP}[name]
        return (_CLS_BLEND, kind, 1, 0, 0.1, 1.8, 0, -inf, inf)
    if name in ("ColorIncreasing", "ContrastIncreasing",
                "BrightnessIncreasing", "SharpnessIncreasing"):
        kind = {"BrightnessIncreasing": _B_BRIGHT, "ColorIncreasing": _B_COLOR,
                "ContrastIncreasing": _B_CONTRAST,
                "SharpnessIncreasing": _B_SHARP}[name]
        return (_CLS_BLEND, kind, 1, 0, 1.0, 0.9, 1, 0.1, inf)
    if name == "ShearX":
        return (_CLS_GEOM, _G_SHEARX, 1, 0, 0, 0.3, 1, -inf, inf)
    if name == "ShearY":
        return (_CLS_GEOM, _G_SHEARY, 1, 0, 0, 0.3, 1, -inf, inf)
    if name == "TranslateX":
        return (_CLS_GEOM, _G_TXABS, 1, 0, 0, _TRANSLATE_CONST, 1, -inf, inf)
    if name == "TranslateY":
        return (_CLS_GEOM, _G_TYABS, 1, 0, 0, _TRANSLATE_CONST, 1, -inf, inf)
    if name == "TranslateXRel":
        return (_CLS_GEOM, _G_TXREL, 1, 0, 0, 0.45, 1, -inf, inf)
    if name == "TranslateYRel":
        return (_CLS_GEOM, _G_TYREL, 1, 0, 0, 0.45, 1, -inf, inf)
    raise KeyError(name)


def _row(name, prob, level):
    cls, kind, p1, cast, q0, q1, neg, qlo, qhi = _op_spec(name)
    return [prob, cls, kind, p1, cast, q0, q1, neg, qlo, qhi, float(level)]


# ----------------------------------------------------------------------
# primitives
# ----------------------------------------------------------------------

def _quantize(img):
    """Mirror the host path's float -> uint8 lattice (truncating cast)."""
    return jnp.floor(jnp.clip(img, 0.0, 255.0))


def _grayscale_l(img):
    """PIL convert('L') ITU-R 601-2 fixed point; exact (ints < 2^24)."""
    v = (img[..., 0] * 19595.0 + img[..., 1] * 38470.0 +
         img[..., 2] * 7471.0 + 32768.0)
    return jnp.floor(v / 65536.0)


def _smooth(img):
    """PIL ImageFilter.SMOOTH: 3x3 [[1,1,1],[1,5,1],[1,1,1]]/13, rounded,
    1-pixel border kept from the input."""
    k = jnp.asarray([[1., 1., 1.], [1., 5., 1.], [1., 1., 1.]],
                    jnp.float32) / 13.0
    x = jnp.moveaxis(img, -1, 1)                       # [B,C,H,W]
    b, c, h, w = x.shape
    y = jax.lax.conv_general_dilated(
        x.reshape(b * c, 1, h, w), k[None, None], (1, 1), "VALID")
    y = jnp.floor(y.reshape(b, c, h - 2, w - 2) + 0.5)
    out = x.at[:, :, 1:-1, 1:-1].set(jnp.clip(y, 0.0, 255.0))
    return jnp.moveaxis(out, 1, -1)


def _warp_indices(mat, h, w):
    """PIL 16.16 fixed-point inverse-map coefficients and source coords.

    PIL's ImagingTransformAffine is a 16.16 fixed-point incremental
    rasterizer: coefficients are quantized with ``FIX(v) = floor(v*65536 +
    .5)`` and source coords accumulate per row/column, so
    ``src_x(y,x) = (FIX(a*.5 + b*.5 + c) + y*FIX(b) + x*FIX(a)) >> 16``
    (pinned empirically vs PIL 12, incl. the half-boundary rows a pure
    float ``floor(a(x+.5)+b(y+.5)+c)`` model gets wrong).  int32
    accumulators bound image extents + translations to < 2^15 px — far
    above any augmentation recipe."""

    def fix(v):
        return jnp.floor(v * 65536.0 + 0.5).astype(jnp.int32)[:, None, None]

    a, bb, cc, d, e, f = [mat[:, i] for i in range(6)]
    x0 = fix(a * 0.5 + bb * 0.5 + cc)
    y0 = fix(d * 0.5 + e * 0.5 + f)
    dxc, dxr, dyc, dyr = fix(a), fix(bb), fix(d), fix(e)
    ys = jnp.arange(h, dtype=jnp.int32)[None, :, None]
    xs = jnp.arange(w, dtype=jnp.int32)[None, None, :]
    sx = (x0 + ys * dxr + xs * dxc) >> 16
    sy = (y0 + ys * dyr + xs * dyc) >> 16
    return sx, sy, (x0, y0, dxc, dxr, dyc, dyr)


def _affine_warp_gather(img, mat):
    """PIL Image.transform(AFFINE, nearest), bit-exact — gather variant.

    One channel-padded 32-float slice per output pixel.  Measured 55.7ms
    at b128 224² on chip (perf/device_aug_phase_probe.py): the per-slice
    issue rate, not HBM bandwidth, is the wall.  Kept as the oracle for
    the MXU one-hot variant below and for shapes its preconditions
    exclude.  Out-of-bounds pixels take the fill colour."""
    bsz, h, w, c = img.shape
    sx, sy, _ = _warp_indices(mat, h, w)
    valid = (sx >= 0) & (sx < w) & (sy >= 0) & (sy < h)
    idx = (jnp.clip(sy, 0, h - 1) * w + jnp.clip(sx, 0, w - 1))
    # channel-pad the gather slices to 32: TPU XLA scalar-loops 3-float
    # slices but vectorizes >=32 (the ops/msda.py regime); the 10x padding
    # traffic is far cheaper than a per-pixel loop
    flat = jnp.pad(img.reshape(bsz, h * w, c), ((0, 0), (0, 0), (0, 32 - c)))
    out = jnp.take_along_axis(flat, idx.reshape(bsz, h * w, 1),
                              axis=1)[..., :c]
    out = out.reshape(bsz, h, w, c)
    return jnp.where(valid[..., None], out, _FILL)


def _affine_warp_onehot(img, mat, block=16):
    """PIL Image.transform(AFFINE, nearest), bit-exact — MXU variant.

    Replaces the per-pixel gather with two one-hot matmul passes (the
    perf/warp_onehot_probe.py pattern, 10.3ms vs 55.4ms at b128 224²):

    - pass V contracts a one-hot over source ROWS against the image, per
      source column: ``t[y,w] = src[syref(y,w), w]`` — plus a second
      candidate channel shifted by ``s = sign(FIX(d))``;
    - pass H contracts a one-hot over source COLUMNS: ``out[y,x] =
      t[y, sx(y,x)]`` picking the candidate elementwise afterwards.

    Exactness: with PIL's fixed-point map, ``sx(y, x)`` is strictly
    increasing in x with step ``dxc = FIX(a)``; every AutoAugment /
    RandAugment geometry op has ``a = 1`` (shear/translate) or
    ``a = cos θ`` with ``|θ| <= 30°``, so ``dxc > 32768`` and at most TWO
    consecutive output columns ``{xf, xf+1}`` land on any source column
    ``w``.  ``xf(y,w) = ceil((w<<16 - X(y)) / dxc)`` is elementwise
    computable, and the two columns' source rows differ by at most
    ``sign(dyc)`` (``|d| <= 1`` for the whole op zoo) — hence exactly two
    row candidates ``{syref, syref + s}``, one one-hot, and a
    channel-concatenated row-shifted copy of the source.  Falls back to
    the gather variant when ``dxc <= 32768`` cannot be guaranteed is NOT
    needed: the op tables bound rotation at 30°.
    """
    bsz, h, w, c = img.shape
    sx, sy, (x0, y0, dxc, dxr, dyc, dyr) = _warp_indices(mat, h, w)
    valid = (sx >= 0) & (sx < w) & (sy >= 0) & (sy < h)
    sxc = jnp.clip(sx, 0, w - 1)

    ws = jnp.arange(w, dtype=jnp.int32)[None, None, :]
    ys = jnp.arange(h, dtype=jnp.int32)[None, :, None]
    x_row = x0 + ys * dxr                      # [B,H,1] sx row base
    y_row = y0 + ys * dyr                      # [B,H,1] sy row base
    # first output column mapping to source column w (may be out of range
    # for unhit columns — harmless, those lanes are never selected)
    xf = -jnp.floor_divide(x_row - (ws << 16), dxc)        # [B,H,W]
    syref = (y_row + xf * dyc) >> 16                       # [B,H,W]
    # elementwise recomputation of syref at w = sx(y,x): which of the two
    # row candidates this output pixel needs
    xf_at = -jnp.floor_divide(x_row - (sxc << 16), dxc)
    syref_at = (y_row + xf_at * dyc) >> 16
    need_second = sy != syref_at                           # [B,H,W] bool

    s_sign = jnp.sign(dyc)                                 # [B,1,1]
    # source with 2-row halo so candidate rows syref ∈ [-1, h] and
    # syref+s stay addressable without clipping artefacts at the borders
    srcp = jnp.pad(img, ((0, 0), (2, 2), (0, 0), (0, 0)))
    base = srcp[:, 1:h + 3]                                # row j-1 of src
    up = srcp[:, 2:h + 4]                                  # row j   of src
    down = srcp[:, 0:h + 2]                                # row j-2 of src
    shifted = jnp.where((s_sign > 0)[..., None],
                        up, jnp.where((s_sign < 0)[..., None], down, base))
    src6 = jnp.concatenate([base, shifted], axis=-1)       # [B,H+2,W,2C]
    src6 = src6.astype(jnp.bfloat16)
    jj = jnp.arange(h + 2, dtype=jnp.int32)
    ww = jnp.arange(w, dtype=jnp.int32)

    outs = []
    y_lo = 0
    while y_lo < h:
        blk = min(block, h - y_lo)
        syb = jax.lax.dynamic_slice_in_dim(syref, y_lo, blk, axis=1)
        sxb = jax.lax.dynamic_slice_in_dim(sxc, y_lo, blk, axis=1)
        ohv = ((syb + 1)[..., None] == jj).astype(jnp.bfloat16)
        t = jnp.einsum("bywj,bjwe->bywe", ohv, src6,
                       preferred_element_type=jnp.float32)
        ohh = (sxb[..., None] == ww).astype(jnp.bfloat16)
        g = jnp.einsum("byxw,bywe->byxe", ohh, t.astype(jnp.bfloat16),
                       preferred_element_type=jnp.float32)
        outs.append(g)
        y_lo += blk
    g = outs[0] if len(outs) == 1 else jnp.concatenate(outs, axis=1)
    out = jnp.where(need_second[..., None], g[..., c:], g[..., :c])
    return jnp.where(valid[..., None], out.astype(img.dtype), _FILL)


def _affine_warp(img, mat):
    """Production warp: MXU one-hot passes on TPU/GPU, gather on CPU (the
    matmul pattern is a TPU win; CPU tests and tiny shapes keep the
    straightforward gather).  Both are PIL-bit-exact and pinned against
    each other + PIL goldens (tests/test_device_augment.py)."""
    if _WARP_IMPL == "onehot" or (_WARP_IMPL == "auto"
                                  and jax.default_backend() != "cpu"):
        return _affine_warp_onehot(img, mat)
    return _affine_warp_gather(img, mat)


_WARP_IMPL = os.environ.get("SIMPLEAICV_WARP_IMPL", "auto")


def _geom_matrices(kind, arg, h, w):
    """Per-image PIL inverse-affine coefficients [B, 6]."""
    zero = jnp.zeros_like(arg)
    one = jnp.ones_like(arg)
    vx = jnp.where(kind == _G_TXREL, arg * w,
                   jnp.where(kind == _G_TXABS, arg, zero))
    vy = jnp.where(kind == _G_TYREL, arg * h,
                   jnp.where(kind == _G_TYABS, arg, zero))
    b = jnp.where(kind == _G_SHEARX, arg, zero)
    d = jnp.where(kind == _G_SHEARY, arg, zero)
    lin = jnp.stack([one, b, vx, d, one, vy], axis=-1)
    # rotate: PIL Image.rotate(angle) about centre (w/2, h/2)
    t = -arg * (math.pi / 180.0)
    cos, sin = jnp.cos(t), jnp.sin(t)
    cx, cy = w / 2.0, h / 2.0
    rot = jnp.stack([cos, sin, cx - cos * cx - sin * cy,
                     -sin, cos, cy + sin * cx - cos * cy], axis=-1)
    return jnp.where((kind == _G_ROT)[:, None], rot, lin)


def _nibbles(img):
    """One-hot high/low nibbles of the uint8 lattice, [B,3,P,16] bf16.

    0/1 values and integer pixel values are exact in bf16; every use
    accumulates in f32, so the nibble factorization is bit-exact."""
    bsz, h, w, c = img.shape
    v = jnp.moveaxis(img, -1, 1).reshape(bsz, c, h * w).astype(jnp.int32)
    n16 = jnp.arange(16, dtype=jnp.int32)
    oh_hi = ((v >> 4)[..., None] == n16).astype(jnp.bfloat16)
    oh_lo = ((v & 15)[..., None] == n16).astype(jnp.bfloat16)
    return oh_hi, oh_lo


def _histogram(img):
    """Per image, per channel 256-bin histogram [B, 3, 256].

    TPU-native: scatter-add loop-lowers on TPU, so the histogram is the
    nibble outer product ``hist[16a+m] = sum_p oh_hi[p,a] * oh_lo[p,m]`` —
    one exact [16,P]@[P,16] matmul per (image, channel) on the MXU
    (counts <= npix < 2^24, exact in f32)."""
    bsz = img.shape[0]
    oh_hi, oh_lo = _nibbles(img)
    hist = jnp.einsum("bcpa,bcpm->bcam", oh_hi, oh_lo,
                      preferred_element_type=jnp.float32)
    return hist.reshape(bsz, 3, 256)


def _equalize_lut(img):
    """PIL ImageOps.equalize LUT from the per-channel histogram; exact
    integer math (all intermediates < 2^24 for images up to 16M pixels)."""
    hist = _histogram(img)                               # [B,3,256]
    npix = float(img.shape[1] * img.shape[2])
    nz = hist > 0
    last = 255 - jnp.argmax(nz[..., ::-1].astype(jnp.int32), axis=-1)
    h_last = jnp.take_along_axis(hist, last[..., None], axis=-1)[..., 0]
    step = jnp.floor((npix - h_last) / 255.0)
    cum_excl = jnp.cumsum(hist, axis=-1) - hist
    safe = jnp.maximum(step, 1.0)[..., None]
    lut = jnp.clip(jnp.floor((jnp.floor(step / 2.0)[..., None] + cum_excl)
                             / safe), 0.0, 255.0)
    ident = jnp.arange(256, dtype=jnp.float32)
    degenerate = (step < 1.0) | (jnp.sum(nz, axis=-1) <= 1)
    return jnp.where(degenerate[..., None], ident, lut)


def _lut_nibble_apply(img, lut):
    """Apply a data-dependent LUT [B,3,256] without a per-pixel gather:
    ``lut[v] = sum_{a,m} oh_hi[v,a] * L[a,m] * oh_lo[v,m]`` with the LUT
    reshaped [16,16].  Both contractions are MXU matmuls; LUT entries are
    integers 0..255 (exact in bf16) and exactly one product survives, so
    the result is bit-exact."""
    bsz, h, w, c = img.shape
    oh_hi, oh_lo = _nibbles(img)                         # [B,3,P,16]
    ltab = lut.reshape(bsz, 3, 16, 16).astype(jnp.bfloat16)
    rows = jnp.einsum("bcpa,bcam->bcpm", oh_hi, ltab,
                      preferred_element_type=jnp.float32)
    out = jnp.einsum("bcpm,bcpm->bcp", rows.astype(jnp.bfloat16), oh_lo,
                     preferred_element_type=jnp.float32)
    return jnp.moveaxis(out.reshape(bsz, 3, h, w), 1, -1)


def _apply_point_ops(img, kind, arg, want_eq, want_ac):
    """The LUT-class ops, computed point-wise (no table, no gather) except
    Equalize, whose data-dependent LUT goes through the nibble matmuls.

    Identical math to composing the PIL uint8 LUT then indexing it: each
    branch below is the closed form of the corresponding 256-entry table
    the host path builds (auto_rand_augment.py)."""
    k = kind[:, None, None, None]
    a = arg[:, None, None, None]
    out = img                                            # identity default
    out = jnp.where(k == _L_INV, 255.0 - img, out)
    out = jnp.where(k == _L_SOL, jnp.where(img < a, img, 255.0 - img), out)
    out = jnp.where(k == _L_SOLADD,
                    jnp.where(img < 128.0,
                              jnp.clip(img + a, 0.0, 255.0), img), out)
    # posterize: keep top `bits`; bits==0 -> all black (TPU EfficientNet)
    shift = jnp.exp2(8.0 - jnp.clip(a, 0.0, 8.0))
    out = jnp.where(k == _L_POST, jnp.floor(img / shift) * shift, out)
    if want_ac:
        # PIL ImageOps.autocontrast(cutoff=0): lut[i] = clip(trunc(i*scale
        # - lo*scale)); identity when the channel is constant (hi <= lo)
        lo = jnp.min(img, axis=(1, 2), keepdims=True)    # [B,1,1,3]
        hi = jnp.max(img, axis=(1, 2), keepdims=True)
        scale = 255.0 / jnp.maximum(hi - lo, 1.0)
        ac = jnp.clip(jnp.floor(img * scale - lo * scale), 0.0, 255.0)
        ac = jnp.where(hi <= lo, img, ac)
        out = jnp.where(k == _L_AC, ac, out)
    if want_eq:
        out = jnp.where(k == _L_EQ, _lut_nibble_apply(img, _equalize_lut(img)),
                        out)
    return out


def _blend_degenerates(img, need_sharp, need_contrast, need_color):
    """The four PIL ImageEnhance degenerate images, computed batched."""
    l = None
    if need_contrast or need_color:
        l = _grayscale_l(img)                            # [B,H,W]
    outs = {}
    if need_color:
        outs[_B_COLOR] = jnp.broadcast_to(l[..., None], img.shape)
    if need_contrast:
        mean = jnp.floor(jnp.mean(l, axis=(1, 2)) + 0.5)  # PIL int(mean+.5)
        outs[_B_CONTRAST] = jnp.broadcast_to(
            mean[:, None, None, None], img.shape)
    if need_sharp:
        outs[_B_SHARP] = _smooth(img)
    return outs


def _apply_blend(img, kind, factor, degenerates):
    deg = jnp.zeros_like(img)                            # brightness: black
    for bk, d in degenerates.items():
        deg = jnp.where((kind == bk)[:, None, None, None], d, deg)
    f = factor[:, None, None, None]
    return jnp.clip(jnp.floor(deg + f * (img - deg)), 0.0, 255.0)


def _slot_kinds(table):
    """Static sets of kinds present, to skip unused heavy paths."""
    cls = table[:, 1].astype(int)
    kind = table[:, 2].astype(int)
    luts = set(kind[cls == _CLS_LUT].tolist())
    blends = set(kind[cls == _CLS_BLEND].tolist())
    geoms = set(kind[cls == _CLS_GEOM].tolist())
    return luts, blends, geoms


def _row_draws(rows, rng, magnitude_std):
    """The random part of one op slot: (apply, arg, cls, kind) per image.
    Shared by the legacy per-slot path and the single-warp composition so
    both consume identical rng splits (bit-identical outcomes)."""
    prob, cls, kind = rows[:, 0], rows[:, 1], rows[:, 2]
    p1, cast = rows[:, 3], rows[:, 4]
    q0, q1, neg = rows[:, 5], rows[:, 6], rows[:, 7]
    qlo, qhi, level = rows[:, 8], rows[:, 9], rows[:, 10]
    bsz = rows.shape[0]
    r_apply, r_sign, r_std = jax.random.split(rng, 3)

    if magnitude_std > 0:
        level = level + magnitude_std * jax.random.normal(r_std, (bsz,))
    level = jnp.clip(level, 0.0, _MAX_LEVEL)
    m = level / _MAX_LEVEL
    inner = p1 * m
    f = jnp.where(cast > 0, jnp.floor(inner), inner)
    sgn = jnp.where(jax.random.uniform(r_sign, (bsz,)) < 0.5, -1.0, 1.0)
    sgn = jnp.where(neg > 0, sgn, 1.0)
    arg = jnp.clip(q0 + q1 * sgn * f, qlo, qhi)
    # host AugmentOp: skipped iff prob < 1 and random() > prob
    apply = jax.random.uniform(r_apply, (bsz,)) <= prob
    return apply, arg, cls, kind


def _apply_nongeom(img, apply, arg, cls, kind, table_static):
    """LUT- and blend-class ops of one slot (geometric-class images pass
    through untouched)."""
    luts, blends, _ = table_static
    out = img
    if luts:
        out = jnp.where((cls == _CLS_LUT)[:, None, None, None],
                        _apply_point_ops(img, kind, arg, _L_EQ in luts,
                                         _L_AC in luts), out)
    if blends:
        degs = _blend_degenerates(img, _B_SHARP in blends,
                                  _B_CONTRAST in blends, _B_COLOR in blends)
        out = jnp.where((cls == _CLS_BLEND)[:, None, None, None],
                        _apply_blend(img, kind, arg, degs), out)
    return jnp.where(apply[:, None, None, None], out, img)


def _apply_rows(img, rows, rng, table_static, magnitude_std):
    """Apply one op slot: per-image rows [B, _ROW_LEN] of op parameters."""
    apply, arg, cls, kind = _row_draws(rows, rng, magnitude_std)

    h, w = img.shape[1], img.shape[2]
    luts, blends, geoms = table_static
    out = img
    if luts:
        out = jnp.where((cls == _CLS_LUT)[:, None, None, None],
                        _apply_point_ops(img, kind, arg, _L_EQ in luts,
                                         _L_AC in luts), out)
    if blends:
        degs = _blend_degenerates(img, _B_SHARP in blends,
                                  _B_CONTRAST in blends, _B_COLOR in blends)
        out = jnp.where((cls == _CLS_BLEND)[:, None, None, None],
                        _apply_blend(img, kind, arg, degs), out)
    # geometric last (the warp gather is the most expensive pass); skipped
    # entirely when the slot's table has no geometric op
    if geoms:
        mats = _geom_matrices(kind, arg, h, w)
        out = jnp.where((cls == _CLS_GEOM)[:, None, None, None],
                        _affine_warp(img, mats), out)
    return jnp.where(apply[:, None, None, None], out, img)


# ----------------------------------------------------------------------
# policy classes
# ----------------------------------------------------------------------

class DeviceAutoAugment:
    """Device-batched AutoAugment, same policy tables as the host class
    (one sub-policy drawn per image; its 2 slots applied in order)."""

    def __init__(self, policy: str = "v0", magnitude_std: float = 0.0):
        table = _POLICIES[policy]
        rows = np.asarray([[_row(*op) for op in sub] for sub in table],
                          np.float32)                    # [25, 2, 11]
        self.table = jnp.asarray(np.swapaxes(rows, 0, 1))  # [2, 25, 11]
        self._static = _slot_kinds(rows.reshape(-1, _ROW_LEN))
        self._static_slot = tuple(_slot_kinds(rows[:, s, :])
                                  for s in range(rows.shape[1]))
        # single-warp composition: legal iff no sub-policy has geometric
        # ops in BOTH slots. The nearest-gather warp is the dominant pass
        # on chip (~60ms/batch at b128 224^2, perf/warp_variants_probe.py —
        # index-bound, invariant to dtype/padding), so collapsing two
        # geometric passes into one halves the pipeline where legal
        # ('original'/'originalr': 0 double-geom sub-policies; 'v0'/'v0r'
        # have 2 and keep the per-slot path).
        geom_count = (rows[:, :, 1] == _CLS_GEOM).sum(axis=1)
        any_geom = bool((geom_count > 0).any())
        self._single_warp = any_geom and not bool((geom_count >= 2).any())
        self.magnitude_std = float(magnitude_std)
        self.n_sub = rows.shape[0]

    def __call__(self, img, rng):
        img = _quantize(img)
        r_idx, r0, r1 = jax.random.split(rng, 3)
        idx = jax.random.randint(r_idx, (img.shape[0],), 0, self.n_sub)
        rows0 = jnp.take(self.table[0], idx, axis=0)
        rows1 = jnp.take(self.table[1], idx, axis=0)
        if not self._single_warp:
            img = _apply_rows(img, rows0, r0, self._static,
                              self.magnitude_std)
            return _apply_rows(img, rows1, r1, self._static,
                               self.magnitude_std)
        # ONE warp for both slots. Each image has at most one live
        # geometric op (static property checked in __init__), and the
        # ordering is exact: slot-0 colour ops run first, the warp sits
        # between the slots (a slot-0 geometric op precedes slot-1 colour;
        # a slot-1 geometric op follows slot-0 colour), slot-1 colour ops
        # run last. Identical rng consumption to the per-slot path, so
        # outputs are bit-identical (tests/test_device_augment.py).
        a0 = _row_draws(rows0, r0, self.magnitude_std)
        a1 = _row_draws(rows1, r1, self.magnitude_std)
        ap0, arg0, cls0, k0 = a0
        ap1, arg1, cls1, k1 = a1
        h, w = img.shape[1], img.shape[2]
        img = _apply_nongeom(img, *a0, self._static_slot[0])
        g0 = ap0 & (cls0 == _CLS_GEOM)
        g1 = ap1 & (cls1 == _CLS_GEOM)
        kind = jnp.where(g0, k0, k1)
        argg = jnp.where(g0, arg0, arg1)
        mats = _geom_matrices(kind, argg, h, w)
        img = jnp.where((g0 | g1)[:, None, None, None],
                        _affine_warp(img, mats), img)
        return _apply_nongeom(img, *a1, self._static_slot[1])


class DeviceRandAugment:
    """Device-batched RandAugment(N, M): N ops drawn uniformly (with
    replacement) per image, each applied with probability ``prob``."""

    def __init__(self, N: int = 2, M: float = 9.0, prob: float = 0.5,
                 magnitude_std: float = 0.5, increasing: bool = True):
        names = (_RAND_INCREASING_TRANSFORMS if increasing
                 else _RAND_TRANSFORMS)
        rows = np.asarray([_row(n, prob, M) for n in names], np.float32)
        self.table = jnp.asarray(rows)                   # [n_ops, 11]
        self._static = _slot_kinds(rows)
        self.N = int(N)
        self.magnitude_std = float(magnitude_std)
        self.n_ops = rows.shape[0]

    def __call__(self, img, rng):
        img = _quantize(img)
        for i in range(self.N):
            r_i, r_op, rng = jax.random.split(jax.random.fold_in(rng, i), 3)
            idx = jax.random.randint(r_i, (img.shape[0],), 0, self.n_ops)
            rows = jnp.take(self.table, idx, axis=0)
            img = _apply_rows(img, rows, r_op, self._static,
                              self.magnitude_std)
        return img


class DeviceNormalize:
    """image / 255 (host data/transforms.py Normalize)."""

    def __call__(self, img, rng=None):
        return img / 255.0


class DeviceRandomErasing:
    """timm-style random erasing in 'pixel' mode (host
    data/transforms.py:197; reference common.py:561-644).  Runs AFTER
    normalize, filling with N(0,1) pixels; 10 candidate (area, aspect)
    draws per image, first geometrically-valid one wins."""

    def __init__(self, prob=0.5, area_range=(0.02, 1. / 3.),
                 min_aspect_ratio=0.3, tries: int = 10):
        self.prob = float(prob)
        self.area_range = tuple(area_range)
        self.log_aspect = (math.log(min_aspect_ratio),
                           math.log(1.0 / min_aspect_ratio))
        self.tries = int(tries)

    def __call__(self, img, rng):
        bsz, h, w, c = img.shape
        r_on, r_a, r_ar, r_y, r_x, r_fill = jax.random.split(rng, 6)
        t = self.tries
        area = h * w
        target = jax.random.uniform(
            r_a, (bsz, t), minval=self.area_range[0],
            maxval=self.area_range[1]) * area
        aspect = jnp.exp(jax.random.uniform(
            r_ar, (bsz, t), minval=self.log_aspect[0],
            maxval=self.log_aspect[1]))
        eh = jnp.round(jnp.sqrt(target * aspect))
        ew = jnp.round(jnp.sqrt(target / aspect))
        valid = (eh < h) & (ew < w)
        pick = jnp.argmax(valid, axis=1)                 # first valid try
        ehp = jnp.take_along_axis(eh, pick[:, None], 1)[:, 0]
        ewp = jnp.take_along_axis(ew, pick[:, None], 1)[:, 0]
        any_valid = jnp.any(valid, axis=1)
        y0 = jnp.floor(jax.random.uniform(r_y, (bsz,)) * (h - ehp))
        x0 = jnp.floor(jax.random.uniform(r_x, (bsz,)) * (w - ewp))
        ys = jnp.arange(h, dtype=jnp.float32)[None, :, None]
        xs = jnp.arange(w, dtype=jnp.float32)[None, None, :]
        box = ((ys >= y0[:, None, None]) & (ys < (y0 + ehp)[:, None, None]) &
               (xs >= x0[:, None, None]) & (xs < (x0 + ewp)[:, None, None]))
        on = (jax.random.uniform(r_on, (bsz,)) <= self.prob) & any_valid
        mask = box & on[:, None, None]
        fill = jax.random.normal(r_fill, img.shape, img.dtype)
        return jnp.where(mask[..., None], fill, img)


class DeviceMixupCutmix:
    """Batch-mode mixup/cutmix with soft one-hot labels (host
    data/mixupcutmix.py; reference mixupcutmixclassificationcollator.py:
    99-284).  Mixing partner is the flipped batch; one lam / one box per
    batch ('batch' mode); cutmix lam corrected by the realized box area."""

    def __init__(self, use_mixup=True, mixup_alpha=0.8, cutmix_alpha=1.0,
                 mixup_cutmix_prob=1.0, switch_to_cutmix_prob=0.5,
                 label_smoothing=0.1, num_classes=1000):
        self.use_mixup = bool(use_mixup)
        self.mixup_alpha = float(mixup_alpha)
        self.cutmix_alpha = float(cutmix_alpha)
        self.prob = float(mixup_cutmix_prob)
        self.switch = float(switch_to_cutmix_prob)
        self.smoothing = float(label_smoothing)
        self.num_classes = int(num_classes)

    def _one_hot(self, labels, on, off):
        oh = jax.nn.one_hot(labels, self.num_classes, dtype=jnp.float32)
        return oh * (on - off) + off

    def __call__(self, img, labels, rng):
        ncls = self.num_classes
        off = self.smoothing / ncls
        on = 1.0 - self.smoothing + off
        y1 = self._one_hot(labels, on, off)
        if not self.use_mixup:
            return img, y1
        y2 = self._one_hot(labels[::-1], on, off)
        r_on, r_sw, r_lam_m, r_lam_c, r_cy, r_cx = jax.random.split(rng, 6)
        enabled = jax.random.uniform(r_on, ()) < self.prob
        use_cutmix = jax.random.uniform(r_sw, ()) < self.switch
        lam_m = jax.random.beta(r_lam_m, self.mixup_alpha, self.mixup_alpha)
        lam_c = jax.random.beta(r_lam_c, self.cutmix_alpha, self.cutmix_alpha)

        h, w = img.shape[1], img.shape[2]
        ratio = jnp.sqrt(1.0 - lam_c)
        cut_h = jnp.floor(h * ratio)
        cut_w = jnp.floor(w * ratio)
        cy = jnp.floor(jax.random.uniform(r_cy, ()) * h)
        cx = jnp.floor(jax.random.uniform(r_cx, ()) * w)
        yl = jnp.clip(cy - jnp.floor(cut_h / 2), 0, h)
        yh = jnp.clip(cy + jnp.floor(cut_h / 2), 0, h)
        xl = jnp.clip(cx - jnp.floor(cut_w / 2), 0, w)
        xh = jnp.clip(cx + jnp.floor(cut_w / 2), 0, w)
        # correct_lam: realized box area
        lam_c_eff = 1.0 - (yh - yl) * (xh - xl) / float(h * w)
        ys = jnp.arange(h, dtype=jnp.float32)[None, :, None, None]
        xs = jnp.arange(w, dtype=jnp.float32)[None, None, :, None]
        box = (ys >= yl) & (ys < yh) & (xs >= xl) & (xs < xh)
        img_cut = jnp.where(box, img[::-1], img)
        img_mix = img * lam_m + img[::-1] * (1.0 - lam_m)
        lam = jnp.where(use_cutmix, lam_c_eff, lam_m)
        lam = jnp.where(enabled, lam, 1.0)
        out_img = jnp.where(enabled,
                            jnp.where(use_cutmix, img_cut, img_mix), img)
        out_y = y1 * lam + y2 * (1.0 - lam)
        return out_img, out_y


class DeviceAugmentPipeline:
    """Composes the device transforms into the engine's ``augment_fn``
    hook: ``batch -> batch`` inside the jitted train step.

    Stage order mirrors the host config pipeline (train_config transforms +
    mixup collater): augment (uint8 lattice) -> normalize -> erasing ->
    mixup/cutmix (labels become soft one-hot)."""

    def __init__(self, augment=None, normalize=True, erasing=None,
                 mixupcutmix=None):
        self.augment = augment
        self.normalize = DeviceNormalize() if normalize else None
        self.erasing = erasing
        self.mixupcutmix = mixupcutmix

    def __call__(self, batch, rng):
        img = batch["image"].astype(jnp.float32)
        r_aug, r_er, r_mix = jax.random.split(rng, 3)
        if self.augment is not None:
            img = self.augment(img, r_aug)
        if self.normalize is not None:
            img = self.normalize(img)
        if self.erasing is not None:
            img = self.erasing(img, r_er)
        out = dict(batch)
        if self.mixupcutmix is not None:
            img, y = self.mixupcutmix(img, batch["label"], r_mix)
            out["label"] = y
        out["image"] = img
        return out
