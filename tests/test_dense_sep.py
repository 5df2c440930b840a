"""SepConv dense-form rewrite (ops/primitives._composed_sep_stage).

The rewrite is exact math — dw(k) then pw(1x1) with no nonlinearity between
compose into one dense kxk conv — so:
  * SepConv(dense_form=True) matches the factored module per stage/stride;
  * the full ADD with dense_sep_eval=True matches the XLA model in fp32;
  * init and train paths are untouched (identical param tree, identical
    train-mode outputs);
  * engagement: the eval jaxpr contains NO grouped convolutions.
"""
import re

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from auto_dynamic_deeplab_tpu.models import ADD
from auto_dynamic_deeplab_tpu.nas import AUTODEEPLAB_GENOTYPE
from auto_dynamic_deeplab_tpu.ops.primitives import SepConv

pytestmark = pytest.mark.fast

_PATH = (1, 2, 2, 2, 3, 2)
_C_INDEX = (1,)


def _pair(kernel_size, stride, dtype=None):
    kw = dict(
        features=8,
        kernel_size=kernel_size,
        stride=stride,
        padding=kernel_size // 2,
        dtype=dtype,
    )
    return SepConv(**kw), SepConv(dense_form=True, **kw)


@pytest.mark.parametrize("kernel_size,stride", [(3, 1), (5, 1), (3, 2)])
def test_sepconv_dense_form_matches_factored(kernel_size, stride):
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.normal(size=(2, 17, 19, 8)).astype(np.float32))
    base, dense = _pair(kernel_size, stride)
    v = base.init(jax.random.PRNGKey(0), x, True)
    # warm the BN stats so eval normalizes with non-trivial running stats
    _, updates = base.apply(v, x, True, mutable=["batch_stats"])
    v = {**v, **updates}
    want = base.apply(v, x, False)
    got = dense.apply(v, x, False)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)


def test_sepconv_dense_form_bf16_close_to_fp32_oracle():
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.normal(size=(1, 17, 19, 8)).astype(np.float32))
    base, _ = _pair(3, 1)
    v = base.init(jax.random.PRNGKey(0), x, True)
    oracle = base.apply(v, x, False)
    base16, dense16 = _pair(3, 1, dtype=jnp.bfloat16)
    u = base16.apply(v, x, False).astype(jnp.float32)
    f = dense16.apply(v, x, False).astype(jnp.float32)
    err_u = float(jnp.max(jnp.abs(u - oracle)))
    err_f = float(jnp.max(jnp.abs(f - oracle)))
    assert err_f <= 2.0 * err_u + 1e-3, (err_f, err_u)


def _tiny_add(dense_sep_eval=False):
    return ADD(
        _PATH, _C_INDEX, AUTODEEPLAB_GENOTYPE, num_classes=7, F=4, B=5,
        dense_sep_eval=dense_sep_eval,
    )


def _grouped_conv_count(fn, *args):
    jaxpr = str(jax.make_jaxpr(fn)(*args))
    return sum(
        int(m) > 1 for m in re.findall(r"feature_group_count=(\d+)", jaxpr)
    )


def test_add_dense_sep_eval_matches_and_engages():
    rng = np.random.RandomState(7)
    x = jnp.asarray(rng.normal(size=(1, 65, 97, 3)).astype(np.float32))
    base, dense = _tiny_add(False), _tiny_add(True)
    v = base.init(jax.random.PRNGKey(1), x, True)
    _, updates = base.apply(v, x, True, mutable=["batch_stats"])
    v = {**v, **updates}

    # identical param tree
    vd = dense.init(jax.random.PRNGKey(1), x, True)
    assert jax.tree.all(jax.tree.map(lambda a, b: a.shape == b.shape, v, vd))

    want = base.apply(v, x, False)
    got = dense.apply(v, x, False)
    assert len(want) == len(got)
    for w, g in zip(want, got):
        np.testing.assert_allclose(np.asarray(g), np.asarray(w), atol=5e-4)

    # train path untouched: bit-identical outputs and batch_stats updates
    wt, wu = base.apply(v, x, True, mutable=["batch_stats"])
    gt, gu = dense.apply(v, x, True, mutable=["batch_stats"])
    for w, g in zip(wt, gt):
        np.testing.assert_array_equal(np.asarray(g), np.asarray(w))
    assert jax.tree.all(
        jax.tree.map(lambda a, b: bool((a == b).all()), wu, gu)
    )

    # engagement: every grouped (depthwise) conv is gone from the eval
    # program; the factored model has them
    assert _grouped_conv_count(lambda x: base.apply(v, x, False), x) > 0
    assert _grouped_conv_count(lambda x: dense.apply(v, x, False), x) == 0
