"""NAS primitive op library — TPU-native equivalents of modeling/operations.py.

Everything is NHWC with *explicit* symmetric padding so output sizes match
PyTorch's conv arithmetic on the odd 769/1025/2049 spatial chain (never use
"SAME", whose asymmetric padding differs for even inputs / stride 2).

The 8 primitives (modeling/genotypes.py:5-14) are exposed through the ``OPS``
registry: name -> factory(C, stride) -> flax module called as ``op(x, train)``.
"""
from __future__ import annotations

from functools import partial
from typing import Any, Callable, Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from .norm import BatchNorm

# PyTorch nn.init.kaiming_normal_ (fan_in, gain=sqrt(2)) — the reference
# re-initializes every conv with it (modeling/ADD.py:491-500).
kaiming_normal = nn.initializers.variance_scaling(2.0, "fan_in", "normal")


def conv2d(
    features: int,
    kernel_size: int,
    stride: int = 1,
    padding: int = 0,
    dilation: int = 1,
    groups: int = 1,
    use_bias: bool = False,
    name: Optional[str] = None,
    dtype: Optional[jnp.dtype] = None,
) -> nn.Conv:
    """PyTorch-parity Conv2d: explicit symmetric padding, NHWC."""
    return nn.Conv(
        features=features,
        kernel_size=(kernel_size, kernel_size),
        strides=(stride, stride),
        padding=[(padding, padding), (padding, padding)],
        kernel_dilation=(dilation, dilation),
        feature_group_count=groups,
        use_bias=use_bias,
        kernel_init=kaiming_normal,
        dtype=dtype,
        name=name,
    )


def max_pool_3x3(x: jnp.ndarray, stride: int) -> jnp.ndarray:
    """MaxPool2d(3, stride, padding=1)."""
    # The init value must be the PYTHON literal -inf, not jnp.array(-inf):
    # reduce_window only recognizes the differentiable (max, -inf) monoid
    # from a concrete literal. A traced-constant init falls back to generic
    # reduce_window, which has no transpose rule — jit(grad(...)) then dies
    # with "Linearization failed to produce known values for all output
    # primals" (eager grad still works, which hid this).
    neg_inf = (
        -jnp.inf if jnp.issubdtype(x.dtype, jnp.floating) else jnp.iinfo(x.dtype).min
    )
    return jax.lax.reduce_window(
        x,
        neg_inf,
        jax.lax.max,
        window_dimensions=(1, 3, 3, 1),
        window_strides=(1, stride, stride, 1),
        padding=[(0, 0), (1, 1), (1, 1), (0, 0)],
    )


def avg_pool_3x3(x: jnp.ndarray, stride: int) -> jnp.ndarray:
    """AvgPool2d(3, stride, padding=1, count_include_pad=False)."""
    dims = (1, 3, 3, 1)
    strides = (1, stride, stride, 1)
    pad = [(0, 0), (1, 1), (1, 1), (0, 0)]
    summed = jax.lax.reduce_window(
        x.astype(jnp.float32), 0.0, jax.lax.add, dims, strides, pad
    )
    # Per-window valid-element counts; XLA constant-folds this.
    ones = jnp.ones(x.shape[1:3], jnp.float32)[None, :, :, None]
    counts = jax.lax.reduce_window(ones, 0.0, jax.lax.add, dims, strides, pad)
    return (summed / counts).astype(x.dtype)


class Pool(nn.Module):
    """Pooling primitive wrapped as a module (uniform op interface)."""

    kind: str  # 'max' | 'avg'
    stride: int = 1

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool) -> jnp.ndarray:
        del train
        if self.kind == "max":
            return max_pool_3x3(x, self.stride)
        return avg_pool_3x3(x, self.stride)


class Identity(nn.Module):
    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool) -> jnp.ndarray:
        del train
        return x


class Zero(nn.Module):
    """'none' primitive: zeros (strided slice first if stride > 1)."""

    stride: int = 1

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool) -> jnp.ndarray:
        del train
        if self.stride != 1:
            x = x[:, :: self.stride, :: self.stride, :]
        return jnp.zeros_like(x)


class ReLUConvBN(nn.Module):
    """ReLU → Conv → BN (modeling/operations.py:18-29)."""

    features: int
    kernel_size: int = 1
    stride: int = 1
    padding: int = 0
    affine: bool = True
    momentum: float = 0.1
    epsilon: float = 1e-5
    axis_name: Optional[str] = None
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool) -> jnp.ndarray:
        x = nn.relu(x)
        x = conv2d(
            self.features,
            self.kernel_size,
            self.stride,
            self.padding,
            dtype=self.dtype,
            name="conv",
        )(x)
        return BatchNorm(
            momentum=self.momentum,
            epsilon=self.epsilon,
            affine=self.affine,
            axis_name=self.axis_name,
            dtype=self.dtype,
            name="bn",
        )(x, train)


class DilConv(nn.Module):
    """ReLU → dilated Conv → BN (modeling/operations.py:32-43).

    NOTE: the reference's DilConv is a *plain* (non-separable) dilated conv.
    """

    features: int
    kernel_size: int
    stride: int = 1
    padding: int = 0
    dilation: int = 2
    affine: bool = True
    axis_name: Optional[str] = None
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool) -> jnp.ndarray:
        x = nn.relu(x)
        x = conv2d(
            self.features,
            self.kernel_size,
            self.stride,
            self.padding,
            dilation=self.dilation,
            dtype=self.dtype,
            name="conv",
        )(x)
        return BatchNorm(
            affine=self.affine, axis_name=self.axis_name, dtype=self.dtype, name="bn"
        )(x, train)


def _composed_sep_stage(
    x: jnp.ndarray,
    dw_kernel: jnp.ndarray,
    pw_kernel: jnp.ndarray,
    stride: int,
    padding: int,
    dtype: Optional[jnp.dtype],
) -> jnp.ndarray:
    """Exact dense rewrite of one separable stage: depthwise(k) then
    pointwise(1x1) with NO nonlinearity between them compose into ONE dense
    kxk conv with ``K[ky,kx,ci,co] = dw[ky,kx,0,ci] * pw[0,0,ci,co]``
    (mathematically identical, not an approximation). One conv kernel and
    half the HBM round-trips of the state instead of a VPU-bound depthwise
    plus a thin-channel 1x1. The composition runs in fp32 param precision,
    then casts once to the compute dtype (the two-step form quantizes the
    intermediate activations instead — differences are within bf16 noise).
    """
    kernel = dw_kernel[:, :, 0, :, None] * pw_kernel[0, 0][None, None]
    if dtype is not None:
        x = x.astype(dtype)
        kernel = kernel.astype(dtype)
    pad = (padding, padding)
    return jax.lax.conv_general_dilated(
        x,
        kernel,
        (stride, stride),
        [pad, pad],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


class SepConv(nn.Module):
    """Double depthwise-separable conv (modeling/operations.py:46-62):
    ReLU → dw(k,stride) → pw(1x1) → BN → ReLU → dw(k,1) → pw(1x1) → BN.

    ``dense_form=True`` (eval-only) executes each dw→pw pair as one dense
    kxk conv with the composed kernel (see _composed_sep_stage) — same
    params, same math, fewer HBM passes. Init and training always run the
    factored form so the parameter tree is identical either way.
    """

    features: int
    kernel_size: int
    stride: int = 1
    padding: int = 0
    affine: bool = True
    dense_form: bool = False
    axis_name: Optional[str] = None
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool) -> jnp.ndarray:
        c_in = x.shape[-1]
        bn = partial(
            BatchNorm, affine=self.affine, axis_name=self.axis_name, dtype=self.dtype
        )
        use_dense = self.dense_form and not train and not self.is_initializing()
        params = self.variables["params"] if use_dense else None
        x = nn.relu(x)
        if use_dense:
            x = _composed_sep_stage(
                x, params["dw1"]["kernel"], params["pw1"]["kernel"],
                self.stride, self.padding, self.dtype,
            )
        else:
            x = conv2d(
                c_in, self.kernel_size, self.stride, self.padding, groups=c_in,
                dtype=self.dtype, name="dw1",
            )(x)
            x = conv2d(self.features, 1, dtype=self.dtype, name="pw1")(x)
        x = bn(name="bn1")(x, train)
        x = nn.relu(x)
        if use_dense:
            x = _composed_sep_stage(
                x, params["dw2"]["kernel"], params["pw2"]["kernel"],
                1, self.padding, self.dtype,
            )
        else:
            x = conv2d(
                self.features, self.kernel_size, 1, self.padding,
                groups=self.features, dtype=self.dtype, name="dw2",
            )(x)
            x = conv2d(self.features, 1, dtype=self.dtype, name="pw2")(x)
        return bn(name="bn2")(x, train)


def _shift_up_left(x: jnp.ndarray, shift: int) -> jnp.ndarray:
    """y[i, j] = x[i+shift, j+shift], zero-filled past the edge.

    Equivalent to the reference's pad-(0,s,0,s)-then-slice-[s:, s:] trick
    (modeling/operations.py:94-99, :112-117).
    """
    return jnp.pad(
        x[:, shift:, shift:, :],
        ((0, 0), (0, shift), (0, shift), (0, 0)),
    )


class FactorizedReduce(nn.Module):
    """Stride-2 dual 1x1-conv concat with a 1px-shifted second branch
    (modeling/operations.py:86-101)."""

    features: int
    affine: bool = True
    axis_name: Optional[str] = None
    dtype: Optional[jnp.dtype] = None
    stride: int = 2

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool) -> jnp.ndarray:
        assert self.features % 2 == 0
        x = nn.relu(x)
        shift = self.stride // 2
        y = _shift_up_left(x, shift)
        a = conv2d(self.features // 2, 1, self.stride, dtype=self.dtype, name="conv1")(x)
        b = conv2d(self.features // 2, 1, self.stride, dtype=self.dtype, name="conv2")(y)
        out = jnp.concatenate([a, b], axis=-1)
        return BatchNorm(
            affine=self.affine, axis_name=self.axis_name, dtype=self.dtype, name="bn"
        )(out, train)


class DoubleFactorizedReduce(nn.Module):
    """Stride-4 variant with a 2px-shifted second branch
    (modeling/operations.py:104-119)."""

    features: int
    affine: bool = True
    axis_name: Optional[str] = None
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool) -> jnp.ndarray:
        assert self.features % 2 == 0
        x = nn.relu(x)
        y = _shift_up_left(x, 2)
        a = conv2d(self.features // 2, 1, 4, dtype=self.dtype, name="conv1")(x)
        b = conv2d(self.features // 2, 1, 4, dtype=self.dtype, name="conv2")(y)
        out = jnp.concatenate([a, b], axis=-1)
        return BatchNorm(
            affine=self.affine, axis_name=self.axis_name, dtype=self.dtype, name="bn"
        )(out, train)


# name -> factory(C, stride, affine=..., axis_name=..., dtype=...) -> module.
# Mirrors the OPS dict at modeling/operations.py:7-16.
OPS: Dict[str, Callable[..., nn.Module]] = {
    "none": lambda C, stride, **kw: Zero(stride=stride),
    "avg_pool_3x3": lambda C, stride, **kw: Pool(kind="avg", stride=stride),
    "max_pool_3x3": lambda C, stride, **kw: Pool(kind="max", stride=stride),
    "skip_connect": lambda C, stride, **kw: Identity(),
    "sep_conv_3x3": lambda C, stride, **kw: SepConv(
        features=C, kernel_size=3, stride=stride, padding=1, **kw
    ),
    "sep_conv_5x5": lambda C, stride, **kw: SepConv(
        features=C, kernel_size=5, stride=stride, padding=2, **kw
    ),
    "dil_conv_3x3": lambda C, stride, **kw: DilConv(
        features=C, kernel_size=3, stride=stride, padding=2, dilation=2, **kw
    ),
    "dil_conv_5x5": lambda C, stride, **kw: DilConv(
        features=C, kernel_size=5, stride=stride, padding=4, dilation=2, **kw
    ),
}
