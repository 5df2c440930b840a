"""Primitive-op parity vs torch replicas of modeling/operations.py structures.

We init each flax op, copy its weights into an equivalently-structured torch
module built here in the test, and require eval-mode agreement to ~1e-4
(reference parity tolerance 1e-3, sync_batchnorm/unittest.py:24).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn as nn

from auto_dynamic_deeplab_tpu.ops import (
    OPS,
    DilConv,
    DoubleFactorizedReduce,
    FactorizedReduce,
    ReLUConvBN,
    SepConv,
    avg_pool_3x3,
    max_pool_3x3,
)
from torch_bridge import nchw, nhwc, to_torch_bn, to_torch_conv


def _eval_variables(module, x):
    """Init, then rewrite batch_stats with random values to make eval-mode
    comparisons meaningful (fresh stats are 0/1 which hide scale bugs)."""
    variables = module.init(jax.random.PRNGKey(0), x, train=True)
    rng = np.random.RandomState(42)

    def randomize(path, leaf):
        name = path[-1].key if hasattr(path[-1], "key") else str(path[-1])
        arr = rng.randn(*leaf.shape).astype(np.float32)
        if name == "var":
            arr = np.abs(arr) + 0.5
        return jnp.asarray(arr)

    stats = jax.tree_util.tree_map_with_path(
        randomize, variables.get("batch_stats", {})
    )
    return {"params": variables["params"], "batch_stats": stats}


@pytest.mark.parametrize("stride", [1, 2])
def test_pools_match_torch(rng, stride):
    x = rng.randn(2, 13, 15, 4).astype(np.float32)
    np.testing.assert_allclose(
        np.asarray(max_pool_3x3(jnp.asarray(x), stride)),
        nhwc(nn.MaxPool2d(3, stride=stride, padding=1)(nchw(x))),
        rtol=1e-6,
        atol=1e-6,
    )
    np.testing.assert_allclose(
        np.asarray(avg_pool_3x3(jnp.asarray(x), stride)),
        nhwc(
            nn.AvgPool2d(3, stride=stride, padding=1, count_include_pad=False)(nchw(x))
        ),
        rtol=1e-5,
        atol=1e-6,
    )


def test_reluconvbn_matches_torch(rng):
    x = rng.randn(2, 9, 9, 6).astype(np.float32)
    op = ReLUConvBN(features=8, kernel_size=1)
    variables = _eval_variables(op, x)
    y = op.apply(variables, x, train=False)

    t = nn.Sequential(
        nn.ReLU(), nn.Conv2d(6, 8, 1, bias=False), nn.BatchNorm2d(8)
    )
    to_torch_conv(t[1], variables["params"]["conv"]["kernel"])
    to_torch_bn(t[2], variables["params"]["bn"], variables["batch_stats"]["bn"])
    t.eval()
    np.testing.assert_allclose(np.asarray(y), nhwc(t(nchw(x))), rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("k,pad,dil", [(3, 2, 2), (5, 4, 2)])
def test_dilconv_matches_torch(rng, k, pad, dil):
    x = rng.randn(1, 11, 13, 5).astype(np.float32)
    op = DilConv(features=5, kernel_size=k, padding=pad, dilation=dil)
    variables = _eval_variables(op, x)
    y = op.apply(variables, x, train=False)

    t = nn.Sequential(
        nn.ReLU(),
        nn.Conv2d(5, 5, k, padding=pad, dilation=dil, bias=False),
        nn.BatchNorm2d(5),
    )
    to_torch_conv(t[1], variables["params"]["conv"]["kernel"])
    to_torch_bn(t[2], variables["params"]["bn"], variables["batch_stats"]["bn"])
    t.eval()
    np.testing.assert_allclose(np.asarray(y), nhwc(t(nchw(x))), rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("k,pad", [(3, 1), (5, 2)])
def test_sepconv_matches_torch(rng, k, pad):
    C = 6
    x = rng.randn(1, 9, 9, C).astype(np.float32)
    op = SepConv(features=C, kernel_size=k, padding=pad)
    variables = _eval_variables(op, x)
    y = op.apply(variables, x, train=False)

    p = variables["params"]
    s = variables["batch_stats"]
    t = nn.Sequential(
        nn.ReLU(),
        nn.Conv2d(C, C, k, padding=pad, groups=C, bias=False),
        nn.Conv2d(C, C, 1, bias=False),
        nn.BatchNorm2d(C),
        nn.ReLU(),
        nn.Conv2d(C, C, k, padding=pad, groups=C, bias=False),
        nn.Conv2d(C, C, 1, bias=False),
        nn.BatchNorm2d(C),
    )
    to_torch_conv(t[1], p["dw1"]["kernel"])
    to_torch_conv(t[2], p["pw1"]["kernel"])
    to_torch_bn(t[3], p["bn1"], s["bn1"])
    to_torch_conv(t[5], p["dw2"]["kernel"])
    to_torch_conv(t[6], p["pw2"]["kernel"])
    to_torch_bn(t[7], p["bn2"], s["bn2"])
    t.eval()
    np.testing.assert_allclose(np.asarray(y), nhwc(t(nchw(x))), rtol=1e-4, atol=1e-4)


class _TorchFactorizedReduce(nn.Module):
    """Test oracle mirroring modeling/operations.py:86-119 semantics."""

    def __init__(self, c_in, c_out, stride):
        super().__init__()
        self.relu = nn.ReLU()
        self.conv_1 = nn.Conv2d(c_in, c_out // 2, 1, stride=stride, bias=False)
        self.conv_2 = nn.Conv2d(c_in, c_out // 2, 1, stride=stride, bias=False)
        self.bn = nn.BatchNorm2d(c_out)
        self.shift = stride // 2
        self.pad = nn.ConstantPad2d((0, self.shift, 0, self.shift), 0)

    def forward(self, x):
        x = self.relu(x)
        y = self.pad(x)
        out = torch.cat(
            [self.conv_1(x), self.conv_2(y[:, :, self.shift :, self.shift :])], dim=1
        )
        return self.bn(out)


@pytest.mark.parametrize("hw", [(13, 15), (14, 16)])
@pytest.mark.parametrize("double", [False, True])
def test_factorized_reduce_matches_torch(rng, hw, double):
    x = rng.randn(2, *hw, 4).astype(np.float32)
    op = (
        DoubleFactorizedReduce(features=8)
        if double
        else FactorizedReduce(features=8)
    )
    variables = _eval_variables(op, x)
    y = op.apply(variables, x, train=False)

    t = _TorchFactorizedReduce(4, 8, 4 if double else 2)
    p = variables["params"]
    to_torch_conv(t.conv_1, p["conv1"]["kernel"])
    to_torch_conv(t.conv_2, p["conv2"]["kernel"])
    to_torch_bn(t.bn, p["bn"], variables["batch_stats"]["bn"])
    t.eval()
    np.testing.assert_allclose(np.asarray(y), nhwc(t(nchw(x))), rtol=1e-4, atol=1e-4)


def test_ops_registry_shapes(rng):
    """All 8 primitives preserve (N, H, W, C) at stride 1."""
    x = rng.randn(1, 9, 9, 4).astype(np.float32)
    for name, factory in OPS.items():
        op = factory(4, 1)
        variables = op.init(jax.random.PRNGKey(0), x, train=True)
        y = op.apply(variables, x, train=False)
        assert y.shape == x.shape, name
        if name == "none":
            assert np.all(np.asarray(y) == 0)


@pytest.mark.fast
def test_pools_differentiable_under_jit():
    """jit(grad(max_pool)) regression: a jnp.array(-inf) init value hides the
    (max, -inf) monoid from reduce_window's pattern match under jit, falling
    back to generic reduce_window which has no transpose rule ("Linearization
    failed..."). Eager grad works either way, which masked this — the mixed
    supernet's jitted weight step was the first caller to hit it."""
    x = jnp.asarray(np.random.RandomState(0).randn(1, 9, 9, 4).astype(np.float32))
    for fn in (max_pool_3x3, avg_pool_3x3):
        for stride in (1, 2):
            g = jax.jit(jax.grad(lambda x, f=fn, s=stride: f(x, s).sum()))(x)
            assert np.isfinite(np.asarray(g)).all()
