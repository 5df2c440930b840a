"""ASPP modules — TPU-native equivalents of aspp_train.py / operations.py ASPP.

NHWC; the global-pool branch upsamples with align_corners=True
(aspp_train.py:54-55 / operations.py:150).
"""
from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
from flax import linen as nn

from .norm import BatchNorm
from .primitives import conv2d
from .resize import resize_bilinear


class ASPPTrain(nn.Module):
    """5-branch ASPP used by decoded models (aspp_train.py:8-61).

    Branches: 1x1; three 3x3 atrous convs at dilation {6,12,18}*mult; global
    average pool → 1x1 → upsample. Concat → 1x1 to ``out`` → BN. No trailing
    ReLU (the decoder head applies ReLU first).
    """

    out: int = 256
    depth: int = 256
    mult: float = 1.0
    axis_name: Optional[str] = None
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool) -> jnp.ndarray:
        kw = dict(axis_name=self.axis_name, dtype=self.dtype)
        x = nn.relu(x)

        def branch(name, kernel, dilation):
            pad = dilation if kernel == 3 else 0
            y = conv2d(
                self.depth, kernel, padding=pad, dilation=dilation,
                dtype=self.dtype, name=f"{name}_conv",
            )(x)
            y = BatchNorm(name=f"{name}_bn", **kw)(y, train)
            return nn.relu(y)

        x1 = branch("aspp1", 1, 1)
        x2 = branch("aspp2", 3, int(6 * self.mult))
        x3 = branch("aspp3", 3, int(12 * self.mult))
        x4 = branch("aspp4", 3, int(18 * self.mult))

        x5 = jnp.mean(x, axis=(1, 2), keepdims=True)
        x5 = conv2d(self.depth, 1, dtype=self.dtype, name="aspp5_conv")(x5)
        x5 = BatchNorm(name="aspp5_bn", **kw)(x5, train)
        x5 = nn.relu(x5)
        x5 = resize_bilinear(x5, x.shape[1:3], align_corners=True)

        y = jnp.concatenate([x1, x2, x3, x4, x5], axis=-1)
        y = conv2d(self.out, 1, dtype=self.dtype, name="conv1")(y)
        return BatchNorm(name="bn1", **kw)(y, train)


class ASPPSearch(nn.Module):
    """3-branch search-time ASPP head (operations.py:122-158): 1x1, one 3x3
    atrous conv, global pool; concat → 1x1 fuse → 1x1 to classes (no BN)."""

    out: int
    dilation: int
    axis_name: Optional[str] = None
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool) -> jnp.ndarray:
        c = x.shape[-1]
        kw = dict(axis_name=self.axis_name, dtype=self.dtype)
        x = nn.relu(x)

        y1 = conv2d(c, 1, dtype=self.dtype, name="conv11")(x)
        y1 = nn.relu(BatchNorm(name="bn11", **kw)(y1, train))

        y2 = conv2d(
            c, 3, padding=self.dilation, dilation=self.dilation,
            dtype=self.dtype, name="conv33",
        )(x)
        y2 = nn.relu(BatchNorm(name="bn33", **kw)(y2, train))

        yp = jnp.mean(x, axis=(1, 2), keepdims=True)
        yp = conv2d(c, 1, dtype=self.dtype, name="conv_p")(yp)
        yp = nn.relu(BatchNorm(name="bn_p", **kw)(yp, train))
        yp = resize_bilinear(yp, x.shape[1:3], align_corners=True)

        y = jnp.concatenate([y1, y2, yp], axis=-1)
        y = conv2d(c, 1, dtype=self.dtype, name="concate_conv")(y)
        y = nn.relu(BatchNorm(name="concate_bn", **kw)(y, train))
        return conv2d(self.out, 1, dtype=self.dtype, name="final_conv")(y)
