"""resize_bilinear must match torch.nn.functional.interpolate exactly.

Reference sites covered: align_corners=False (modeling/ADD.py:77,
decoder.py:24,:28) and align_corners=True (aspp_train.py:54-55).
"""
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from auto_dynamic_deeplab_tpu.ops import (
    resize_bilinear,
    scale_dimension,
    scale_dimension_search,
)
from torch_bridge import nchw, nhwc


@pytest.mark.parametrize("align", [False, True])
@pytest.mark.parametrize(
    "in_hw,out_hw",
    [
        ((13, 17), (25, 33)),     # odd upsample (the (d-1)*2+1 chain)
        ((25, 33), (13, 17)),     # downsample
        ((7, 7), (7, 7)),         # identity
        ((9, 9), (65, 129)),      # big upsample like decoder -> full-res
        ((1, 5), (3, 9)),         # degenerate height
        ((33, 65), (17, 33)),     # mixed
    ],
)
def test_matches_torch(rng, align, in_hw, out_hw):
    x = rng.randn(2, *in_hw, 3).astype(np.float32)
    ours = np.asarray(resize_bilinear(x, out_hw, align_corners=align))
    theirs = nhwc(
        F.interpolate(nchw(x), out_hw, mode="bilinear", align_corners=align)
    )
    np.testing.assert_allclose(ours, theirs, rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("align", [False, True])
def test_matmul_upscale_path_matches_torch(rng, align):
    """Big upsamples dispatch to the MXU matmul formulation — must stay
    exactly on the torch semantics (and on the gather path's numerics)."""
    from auto_dynamic_deeplab_tpu.ops import resize as R

    x = rng.randn(1, 65, 129, 4).astype(np.float32)
    out_hw = (513, 1025)
    assert 1 * out_hw[0] * out_hw[1] * 4 >= R._MATMUL_MIN_OUT_ELEMS
    ours = np.asarray(resize_bilinear(x, out_hw, align_corners=align))
    theirs = nhwc(
        F.interpolate(nchw(x), out_hw, mode="bilinear", align_corners=align)
    )
    # matmul accumulation (fma/order) differs from torch's per-pixel lerp by
    # a few fp32 ulps through the two chained stages
    np.testing.assert_allclose(ours, theirs, rtol=1e-4, atol=5e-5)


def test_interp_matrix_rows_sum_to_one():
    from auto_dynamic_deeplab_tpu.ops.resize import _interp_matrix

    for align in (False, True):
        m = _interp_matrix(1025, 257, align)
        np.testing.assert_allclose(m.sum(axis=1), 1.0, atol=1e-6)
        assert (np.count_nonzero(m, axis=1) <= 2).all()


def test_scale_dimension():
    # (d-1)*scale+1 convention: 1025 -> 513 -> 257 -> 129 -> 65 at /2 each.
    assert scale_dimension(1025, 0.5) == 513
    assert scale_dimension(513, 0.5) == 257
    assert scale_dimension(65, 2) == 129
    assert scale_dimension(1025, 2 ** -4) == 65
    # search variant: even dims multiply directly (cell_level_search.py:82)
    assert scale_dimension_search(64, 0.5) == 32
    assert scale_dimension_search(65, 0.5) == 33
    assert scale_dimension_search(64, 2) == 128
    assert scale_dimension_search(65, 2) == 129
