"""ASPP modules — TPU-native equivalents of aspp_train.py / operations.py ASPP.

NHWC; the global-pool branch upsamples with align_corners=True
(aspp_train.py:54-55 / operations.py:150).
"""
from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
from flax import linen as nn

import jax

from .norm import BatchNorm
from .primitives import conv2d, kaiming_normal
from .resize import resize_bilinear


class _BranchSum1x1(nn.Module):
    """1x1 conv over a *virtual* channel-concat of branches, computed as a
    sum of per-branch matmuls with fp32 accumulation.

    Mathematically identical to concat -> nn.Conv 1x1 (the kernel param has
    the same name/shape/init, so checkpoints are interchangeable), but the
    wide concat tensor is never materialized: on v5e the 65x129x1280 ASPP
    concat fusions cost ~1.1 ms/head; this form halves the tail
    (profiled 2.97 -> 1.46 ms standalone).
    """

    features: int
    in_features: int
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, branches) -> jnp.ndarray:
        kernel = self.param(
            "kernel",
            kaiming_normal,
            (1, 1, self.in_features, self.features),
            jnp.float32,
        )
        n, h, w, _ = branches[0].shape
        acc = None
        off = 0
        for br in branches:
            c = br.shape[-1]
            wk = kernel[0, 0, off : off + c, :]
            if self.dtype is not None:
                br = br.astype(self.dtype)
                wk = wk.astype(self.dtype)
            y = jax.lax.dot_general(
                br.reshape(-1, c),
                wk,
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            acc = y if acc is None else acc + y
            off += c
        assert off == self.in_features, (off, self.in_features)
        out_dtype = self.dtype or branches[0].dtype
        return acc.astype(out_dtype).reshape(n, h, w, self.features)


def _shift2d(x: jnp.ndarray, dh: int, dw: int) -> jnp.ndarray:
    """y[h, w] = x[h+dh, w+dw], zero-filled outside (static shifts).

    Shifts with |shift| >= the axis size yield all-zeros (the dilated window
    can reach fully outside the map on tiny feature maps)."""
    if abs(dh) >= x.shape[1] or abs(dw) >= x.shape[2]:
        return jnp.zeros_like(x)
    if dh > 0:
        x = jnp.pad(x[:, dh:, :, :], ((0, 0), (0, dh), (0, 0), (0, 0)))
    elif dh < 0:
        x = jnp.pad(x[:, :dh, :, :], ((0, 0), (-dh, 0), (0, 0), (0, 0)))
    if dw > 0:
        x = jnp.pad(x[:, :, dw:, :], ((0, 0), (0, 0), (0, dw), (0, 0)))
    elif dw < 0:
        x = jnp.pad(x[:, :, :dw, :], ((0, 0), (0, 0), (-dw, 0), (0, 0)))
    return x


class _ShiftedDilatedConv3x3(nn.Module):
    """3x3 dilated conv computed as ONE matmul + 9 shifted adds.

    Exact rewrite of conv2d(k=3, padding=d, dilation=d): a dilated 3x3 conv
    is 9 pointwise taps, so y = sum_ij shift(x @ K[i,j], (i-1)d, (j-1)d).
    XLA's conv falls to ~18 TF/s when the dilated window spans a large
    fraction of the feature map (profiled: d=12/18 ASPP branches at 65x129
    cost ~0.7 ms each on v5e vs 0.11 ms for d=6); the matmul form stays on
    the MXU's fast path at any dilation. Param name/shape/init match
    nn.Conv, so checkpoints are interchangeable.
    """

    features: int
    dilation: int
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        n, h, w, cin = x.shape
        kernel = self.param(
            "kernel", kaiming_normal, (3, 3, cin, self.features), jnp.float32
        )
        k = kernel.transpose(2, 0, 1, 3).reshape(cin, 9 * self.features)
        if self.dtype is not None:
            x = x.astype(self.dtype)
            k = k.astype(self.dtype)
        prec = (
            jax.lax.Precision.HIGHEST
            if x.dtype == jnp.float32
            else jax.lax.Precision.DEFAULT
        )
        y = jax.lax.dot_general(
            x.reshape(-1, cin), k, (((1,), (0,)), ((), ())),
            precision=prec, preferred_element_type=jnp.float32,
        )
        # Keep the taps tensor fp32 (the dot_general accumulator dtype). A
        # bf16 cast here looks like it should halve the dominant HBM
        # traffic, but measured on v5e it is a 1.1 ms/exit REGRESSION at
        # 1025x2049: the convert breaks XLA's dot→shift fusion and
        # materializes standalone reshape/copy kernels (8.56 → 7.45 ms
        # whole-program trace A/B).
        y = y.reshape(n, h, w, 9, self.features)
        d = self.dilation
        acc = None
        for i in range(3):
            for j in range(3):
                t = _shift2d(y[:, :, :, 3 * i + j, :], (i - 1) * d, (j - 1) * d)
                acc = t if acc is None else acc + t
        return acc.astype(x.dtype)


class _Conv3x3Kernel(nn.Module):
    """Param holder with nn.Conv-compatible path/shape/init (no compute)."""

    features: int
    in_features: int

    @nn.compact
    def __call__(self) -> jnp.ndarray:
        return self.param(
            "kernel", kaiming_normal, (3, 3, self.in_features, self.features),
            jnp.float32,
        )


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
        n, h, w, cin = x.shape

        def branch(name, kernel, dilation):
            pad = dilation if kernel == 3 else 0
            y = conv2d(
                self.depth, kernel, padding=pad, dilation=dilation,
                dtype=self.dtype, name=f"{name}_conv",
            )(x)
            y = BatchNorm(name=f"{name}_bn", **kw)(y, train)
            return nn.relu(y)

        # Large dilations use the shifted-matmul form; XLA's conv only
        # handles small ones well (profiled on v5e at 65x129: d=6 conv
        # 112 us, d=12 conv 704 us vs 344 us shifted). All shifted branches
        # share ONE matmul over the virtual concat of their kernels.
        dils = {"aspp2": int(6 * self.mult), "aspp3": int(12 * self.mult),
                "aspp4": int(18 * self.mult)}
        shifted = {
            nm: d for nm, d in dils.items()
            if 2 * d + 1 >= min(h, w) // 4
        }
        outs = {}
        if len(shifted) >= 2:
            ks = [
                _Conv3x3Kernel(
                    features=self.depth, in_features=cin, name=f"{nm}_conv"
                )()
                for nm in shifted
            ]
            K = jnp.concatenate(
                [k.transpose(2, 0, 1, 3).reshape(cin, 9 * self.depth) for k in ks],
                axis=1,
            )
            xc = x if self.dtype is None else x.astype(self.dtype)
            Kc = K if self.dtype is None else K.astype(self.dtype)
            prec = (
                jax.lax.Precision.HIGHEST
                if xc.dtype == jnp.float32
                else jax.lax.Precision.DEFAULT
            )
            taps = jax.lax.dot_general(
                xc.reshape(-1, cin), Kc, (((1,), (0,)), ((), ())),
                precision=prec, preferred_element_type=jnp.float32,
            )
            # Taps stay fp32 (see _ShiftedDilatedConv3x3: a bf16 cast here
            # measured as a 1.1 ms/exit regression — it breaks the dot→shift
            # fusion and adds standalone reshape/copy kernels).
            taps = taps.reshape(n, h, w, len(shifted), 9, self.depth)
            for bi, (nm, d) in enumerate(shifted.items()):
                acc = None
                for i in range(3):
                    for j in range(3):
                        t = _shift2d(
                            taps[:, :, :, bi, 3 * i + j, :],
                            (i - 1) * d, (j - 1) * d,
                        )
                        acc = t if acc is None else acc + t
                y = acc.astype(xc.dtype)
                y = BatchNorm(name=f"{nm}_bn", **kw)(y, train)
                outs[nm] = nn.relu(y)
        elif len(shifted) == 1:
            nm, d = next(iter(shifted.items()))
            y = _ShiftedDilatedConv3x3(
                features=self.depth, dilation=d,
                dtype=self.dtype, name=f"{nm}_conv",
            )(x)
            y = BatchNorm(name=f"{nm}_bn", **kw)(y, train)
            outs[nm] = nn.relu(y)
        for nm, d in dils.items():
            if nm not in outs:
                outs[nm] = branch(nm, 3, d)

        x1 = branch("aspp1", 1, 1)
        x2, x3, x4 = outs["aspp2"], outs["aspp3"], outs["aspp4"]

        x5 = jnp.mean(x, axis=(1, 2), keepdims=True)
        x5 = conv2d(self.depth, 1, dtype=self.dtype, name="aspp5_conv")(x5)
        x5 = BatchNorm(name="aspp5_bn", **kw)(x5, train)
        x5 = nn.relu(x5)
        x5 = resize_bilinear(x5, x.shape[1:3], align_corners=True)

        y = _BranchSum1x1(
            features=self.out,
            in_features=5 * self.depth,
            dtype=self.dtype,
            name="conv1",
        )([x1, x2, x3, x4, x5])
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


class ASPPLite(nn.Module):
    """ASPP_Lite (aspp_train.py:64-85) — the lightweight attention-gated
    head (unused by the reference's main path, kept for full parity): a 1x1
    ReLUConvBN trunk gated by a sigmoid attention branch (49x49 avg-pool at
    stride (16,20) → 1x1 conv → sigmoid → upsample), upsampled 2x into a
    classifier 1x1, summed with a low-level 1x1 classifier.
    """

    mid_channels: int
    num_classes: int
    axis_name: Optional[str] = None
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(
        self, x: jnp.ndarray, low_level: jnp.ndarray, train: bool
    ) -> jnp.ndarray:
        from .primitives import ReLUConvBN

        t1 = ReLUConvBN(
            features=self.mid_channels, kernel_size=1,
            axis_name=self.axis_name, dtype=self.dtype, name="tl",
        )(x, train)
        h, w = t1.shape[1:3]

        # torch AvgPool2d(49, stride=[16,20]): no padding → VALID window
        t2 = nn.avg_pool(x, (49, 49), strides=(16, 20), padding="VALID")
        t2 = conv2d(self.mid_channels, 1, use_bias=True,
                    dtype=self.dtype, name="bl_conv")(t2)
        t2 = nn.sigmoid(t2)
        t2 = resize_bilinear(t2, (h, w), align_corners=False)

        t3 = t1 * t2
        up = ((h - 1) * 2 + 1, (w - 1) * 2 + 1)  # (d-1)*2+1 odd-size chain
        t3 = resize_bilinear(t3, up, align_corners=False)
        t3 = conv2d(self.num_classes, 1, use_bias=True,
                    dtype=self.dtype, name="tr_conv")(t3)

        t4 = conv2d(self.num_classes, 1, use_bias=True,
                    dtype=self.dtype, name="br_conv")(low_level)
        return t3 + t4
