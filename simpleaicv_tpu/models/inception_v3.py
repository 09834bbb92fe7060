"""InceptionV3 in flax.linen — the FID/IS feature extractor (parity:
reference simpleAICV/diffusion_model/metrics/inception.py:8-325, itself a
torchvision InceptionV3 port). NHWC; weights load from a torchvision
state_dict through core/weight_convert.py.

Returns (pool_features [N,2048], logits [N,1000])."""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax.numpy as jnp

__all__ = ["InceptionV3"]


class BasicConv2d(nn.Module):
    planes: int
    kernel: Sequence[int]
    stride: int = 1
    padding: Sequence[Sequence[int]] = ((0, 0), (0, 0))

    @nn.compact
    def __call__(self, x, train=False):
        x = nn.Conv(self.planes, tuple(self.kernel),
                    strides=(self.stride, self.stride),
                    padding=[tuple(p) for p in self.padding], use_bias=False,
                    dtype=jnp.float32, name="conv")(x)
        x = nn.BatchNorm(use_running_average=True, epsilon=1e-3,
                         dtype=jnp.float32, name="bn")(x)
        return nn.relu(x)


def _pad(k):
    return ((k // 2, k // 2), (k // 2, k // 2))


def _avgpool3(x, count_include_pad=True):
    import jax
    s = jax.lax.reduce_window(x, 0.0, jax.lax.add, (1, 3, 3, 1),
                              (1, 1, 1, 1),
                              [(0, 0), (1, 1), (1, 1), (0, 0)])
    if count_include_pad:
        return s / 9.0
    # FID-inception pool semantics (TF avg pool): divide by the number of
    # REAL elements under the window (reference metrics/inception.py:199-216
    # "Tensorflow's average pool does not use the padded zero's")
    ones = jnp.ones((1, x.shape[1], x.shape[2], 1), x.dtype)
    n = jax.lax.reduce_window(ones, 0.0, jax.lax.add, (1, 3, 3, 1),
                              (1, 1, 1, 1),
                              [(0, 0), (1, 1), (1, 1), (0, 0)])
    return s / n


def _maxpool(x, k=3, s=2):
    return nn.max_pool(x, (k, k), strides=(s, s))


class InceptionA(nn.Module):
    pool_planes: int
    fid: bool = False

    @nn.compact
    def __call__(self, x):
        b1 = BasicConv2d(64, (1, 1), name="branch1x1")(x)
        b5 = BasicConv2d(48, (1, 1), name="branch5x5_1")(x)
        b5 = BasicConv2d(64, (5, 5), padding=_pad(5), name="branch5x5_2")(b5)
        b3 = BasicConv2d(64, (1, 1), name="branch3x3dbl_1")(x)
        b3 = BasicConv2d(96, (3, 3), padding=_pad(3),
                         name="branch3x3dbl_2")(b3)
        b3 = BasicConv2d(96, (3, 3), padding=_pad(3),
                         name="branch3x3dbl_3")(b3)
        bp = BasicConv2d(self.pool_planes, (1, 1), name="branch_pool")(
            _avgpool3(x, count_include_pad=not self.fid))
        return jnp.concatenate([b1, b5, b3, bp], -1)


class InceptionB(nn.Module):

    @nn.compact
    def __call__(self, x):
        b3 = BasicConv2d(384, (3, 3), 2, name="branch3x3")(x)
        bd = BasicConv2d(64, (1, 1), name="branch3x3dbl_1")(x)
        bd = BasicConv2d(96, (3, 3), padding=_pad(3),
                         name="branch3x3dbl_2")(bd)
        bd = BasicConv2d(96, (3, 3), 2, name="branch3x3dbl_3")(bd)
        return jnp.concatenate([b3, bd, _maxpool(x)], -1)


class InceptionC(nn.Module):
    c7: int
    fid: bool = False

    @nn.compact
    def __call__(self, x):
        c7 = self.c7
        b1 = BasicConv2d(192, (1, 1), name="branch1x1")(x)
        b7 = BasicConv2d(c7, (1, 1), name="branch7x7_1")(x)
        b7 = BasicConv2d(c7, (1, 7), padding=((0, 0), (3, 3)),
                         name="branch7x7_2")(b7)
        b7 = BasicConv2d(192, (7, 1), padding=((3, 3), (0, 0)),
                         name="branch7x7_3")(b7)
        bd = BasicConv2d(c7, (1, 1), name="branch7x7dbl_1")(x)
        bd = BasicConv2d(c7, (7, 1), padding=((3, 3), (0, 0)),
                         name="branch7x7dbl_2")(bd)
        bd = BasicConv2d(c7, (1, 7), padding=((0, 0), (3, 3)),
                         name="branch7x7dbl_3")(bd)
        bd = BasicConv2d(c7, (7, 1), padding=((3, 3), (0, 0)),
                         name="branch7x7dbl_4")(bd)
        bd = BasicConv2d(192, (1, 7), padding=((0, 0), (3, 3)),
                         name="branch7x7dbl_5")(bd)
        bp = BasicConv2d(192, (1, 1), name="branch_pool")(
            _avgpool3(x, count_include_pad=not self.fid))
        return jnp.concatenate([b1, b7, bd, bp], -1)


class InceptionD(nn.Module):

    @nn.compact
    def __call__(self, x):
        b3 = BasicConv2d(192, (1, 1), name="branch3x3_1")(x)
        b3 = BasicConv2d(320, (3, 3), 2, name="branch3x3_2")(b3)
        b7 = BasicConv2d(192, (1, 1), name="branch7x7x3_1")(x)
        b7 = BasicConv2d(192, (1, 7), padding=((0, 0), (3, 3)),
                         name="branch7x7x3_2")(b7)
        b7 = BasicConv2d(192, (7, 1), padding=((3, 3), (0, 0)),
                         name="branch7x7x3_3")(b7)
        b7 = BasicConv2d(192, (3, 3), 2, name="branch7x7x3_4")(b7)
        return jnp.concatenate([b3, b7, _maxpool(x)], -1)


class InceptionE(nn.Module):
    pool: str = "avg"  # avg | avg_nopad (FID 7b) | max (FID 7c)

    @nn.compact
    def __call__(self, x):
        b1 = BasicConv2d(320, (1, 1), name="branch1x1")(x)
        b3 = BasicConv2d(384, (1, 1), name="branch3x3_1")(x)
        b3a = BasicConv2d(384, (1, 3), padding=((0, 0), (1, 1)),
                          name="branch3x3_2a")(b3)
        b3b = BasicConv2d(384, (3, 1), padding=((1, 1), (0, 0)),
                          name="branch3x3_2b")(b3)
        b3 = jnp.concatenate([b3a, b3b], -1)
        bd = BasicConv2d(448, (1, 1), name="branch3x3dbl_1")(x)
        bd = BasicConv2d(384, (3, 3), padding=_pad(3),
                         name="branch3x3dbl_2")(bd)
        bda = BasicConv2d(384, (1, 3), padding=((0, 0), (1, 1)),
                          name="branch3x3dbl_3a")(bd)
        bdb = BasicConv2d(384, (3, 1), padding=((1, 1), (0, 0)),
                          name="branch3x3dbl_3b")(bd)
        bd = jnp.concatenate([bda, bdb], -1)
        if self.pool == "max":
            p = nn.max_pool(x, (3, 3), strides=(1, 1),
                            padding=[(1, 1), (1, 1)])
        else:
            p = _avgpool3(x, count_include_pad=self.pool == "avg")
        bp = BasicConv2d(192, (1, 1), name="branch_pool")(p)
        return jnp.concatenate([b1, b3, bd, bp], -1)


class InceptionV3(nn.Module):
    """torchvision InceptionV3 (fid=False) or the FID-metric variant
    (fid=True: TF-style no-pad average pools in A/C/7b, max pool in 7c,
    1008-way bias-less classifier — reference
    simpleAICV/diffusion_model/metrics/inception.py:162-325
    fid_inception_v3 + FIDInception{A,C,E_1,E_2})."""
    num_classes: int = 1000
    fid: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        """x [N,299,299,3] in [-1,1] -> (pool [N,2048], logits [N,classes])."""
        fid = self.fid
        x = BasicConv2d(32, (3, 3), 2, name="Conv2d_1a_3x3")(x)
        x = BasicConv2d(32, (3, 3), name="Conv2d_2a_3x3")(x)
        x = BasicConv2d(64, (3, 3), padding=_pad(3), name="Conv2d_2b_3x3")(x)
        x = _maxpool(x)
        x = BasicConv2d(80, (1, 1), name="Conv2d_3b_1x1")(x)
        x = BasicConv2d(192, (3, 3), name="Conv2d_4a_3x3")(x)
        x = _maxpool(x)
        x = InceptionA(32, fid=fid, name="Mixed_5b")(x)
        x = InceptionA(64, fid=fid, name="Mixed_5c")(x)
        x = InceptionA(64, fid=fid, name="Mixed_5d")(x)
        x = InceptionB(name="Mixed_6a")(x)
        x = InceptionC(128, fid=fid, name="Mixed_6b")(x)
        x = InceptionC(160, fid=fid, name="Mixed_6c")(x)
        x = InceptionC(160, fid=fid, name="Mixed_6d")(x)
        x = InceptionC(192, fid=fid, name="Mixed_6e")(x)
        x = InceptionD(name="Mixed_7a")(x)
        x = InceptionE(pool="avg_nopad" if fid else "avg",
                       name="Mixed_7b")(x)
        x = InceptionE(pool="max" if fid else "avg", name="Mixed_7c")(x)
        pool = jnp.mean(x, axis=(1, 2))
        n_cls = 1008 if self.fid and self.num_classes == 1000 \
            else self.num_classes
        logits = nn.Dense(n_cls, use_bias=not self.fid, name="fc")(pool)
        return pool, logits
