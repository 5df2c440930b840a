"""Native C++ augmentation engine: build, exact parity at scale=1, and
statistical agreement of the antialiased resize path."""
import numpy as np
import pytest
from PIL import Image

from auto_dynamic_deeplab_tpu.data import native
from auto_dynamic_deeplab_tpu.data import transforms as T

pytestmark = pytest.mark.skipif(
    not native.available(), reason="no C++ toolchain for the native engine"
)


def _pair(rng, h=50, w=70):
    img = Image.fromarray(rng.randint(0, 255, (h, w, 3), dtype=np.uint8))
    mask = Image.fromarray(rng.randint(0, 34, (h, w)).astype(np.uint8))
    return img, mask


def test_eval_full_exact_parity(rng):
    img, mask = _pair(rng)
    a_img, a_mask = T.full_image_eval_preprocess(img, mask, (57, 81))
    b_img, b_mask = T.full_image_eval_preprocess_native(img, mask, (57, 81))
    np.testing.assert_allclose(a_img, b_img, rtol=1e-6, atol=1e-6)
    np.testing.assert_array_equal(a_mask, b_mask)


def test_train_exact_parity_at_unit_scale(rng):
    img, mask = _pair(rng, 80, 90)
    # same seed → same flip/crop draws in both paths
    a_img, a_mask = T.train_preprocess(
        img, mask, (65, 65), scale=1.0, rng=np.random.RandomState(5)
    )
    b_img, b_mask = T.train_preprocess_native(
        img, mask, (65, 65), scale=1.0, rng=np.random.RandomState(5)
    )
    np.testing.assert_allclose(a_img, b_img, rtol=1e-5, atol=1e-5)
    np.testing.assert_array_equal(a_mask, b_mask)


def test_train_scaled_statistical_agreement(rng):
    # smooth image: LANCZOS (PIL) vs triangle (native) differ mostly on
    # high-frequency content, so compare on a gradient field
    yy, xx = np.mgrid[0:100, 0:120].astype(np.float32)
    smooth = np.stack(
        [127 + 100 * np.sin(xx / 17), 127 + 100 * np.cos(yy / 13),
         (xx + yy) % 255], axis=-1,
    ).astype(np.uint8)
    img = Image.fromarray(smooth)
    mask = Image.fromarray(rng.randint(0, 34, (100, 120)).astype(np.uint8))
    a_img, a_mask = T.train_preprocess(
        img, mask, (65, 65), scale=0.7, rng=np.random.RandomState(9)
    )
    b_img, b_mask = T.train_preprocess_native(
        img, mask, (65, 65), scale=0.7, rng=np.random.RandomState(9)
    )
    # different resampling filters (LANCZOS vs triangle): close, not equal
    assert np.mean(np.abs(a_img - b_img)) < 0.15
    # identical pad geometry: 255 regions coincide exactly
    np.testing.assert_array_equal(a_mask == 255, b_mask == 255)
    # labels mostly agree (one-pixel nearest-rounding differences allowed)
    valid = a_mask != 255
    assert np.mean(a_mask[valid] == b_mask[valid]) > 0.8


def test_encode_labels_native(rng):
    from auto_dynamic_deeplab_tpu.data.cityscapes import _LUT, encode_segmap

    raw = rng.randint(0, 34, (40, 60)).astype(np.uint8)
    np.testing.assert_array_equal(
        native.encode_labels_native(raw, _LUT), encode_segmap(raw)
    )
