from .norm import BatchNorm
from .primitives import (
    OPS,
    DilConv,
    DoubleFactorizedReduce,
    FactorizedReduce,
    Identity,
    Pool,
    ReLUConvBN,
    SepConv,
    Zero,
    avg_pool_3x3,
    conv2d,
    kaiming_normal,
    max_pool_3x3,
)
from .resize import resize_bilinear, scale_dimension, scale_dimension_search

__all__ = [
    "BatchNorm",
    "OPS",
    "DilConv",
    "DoubleFactorizedReduce",
    "FactorizedReduce",
    "Identity",
    "Pool",
    "ReLUConvBN",
    "SepConv",
    "Zero",
    "avg_pool_3x3",
    "conv2d",
    "kaiming_normal",
    "max_pool_3x3",
    "resize_bilinear",
    "scale_dimension",
    "scale_dimension_search",
]
