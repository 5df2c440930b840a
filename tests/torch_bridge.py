"""Helpers to use torch (CPU) as a numerical oracle in parity tests.

We build small torch replicas of reference op structures *in tests only* and
copy flax-initialized weights into them; production code never touches torch.
"""
import numpy as np
import torch


def to_torch_conv(conv: torch.nn.Conv2d, flax_kernel, flax_bias=None):
    """flax kernel (kh, kw, in/g, out) -> torch weight (out, in/g, kh, kw)."""
    w = np.transpose(np.asarray(flax_kernel), (3, 2, 0, 1))
    assert conv.weight.shape == w.shape, (conv.weight.shape, w.shape)
    with torch.no_grad():
        conv.weight.copy_(torch.from_numpy(w))
        if flax_bias is not None:
            conv.bias.copy_(torch.from_numpy(np.asarray(flax_bias)))
    return conv


def to_torch_bn(bn: torch.nn.BatchNorm2d, params=None, stats=None):
    with torch.no_grad():
        if params is not None:
            bn.weight.copy_(torch.from_numpy(np.asarray(params["scale"])))
            bn.bias.copy_(torch.from_numpy(np.asarray(params["bias"])))
        if stats is not None:
            bn.running_mean.copy_(torch.from_numpy(np.asarray(stats["mean"])))
            bn.running_var.copy_(torch.from_numpy(np.asarray(stats["var"])))
    return bn


def nchw(x_nhwc: np.ndarray) -> torch.Tensor:
    return torch.from_numpy(np.transpose(np.asarray(x_nhwc), (0, 3, 1, 2)).copy())


def nhwc(x_nchw: torch.Tensor) -> np.ndarray:
    return np.transpose(x_nchw.detach().numpy(), (0, 2, 3, 1))
