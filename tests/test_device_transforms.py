"""On-device (jitted XLA) preprocessing vs the host pipeline.

The device engine must match the host engine exactly wherever no resampling
happens (eval normalize+pad; train at scale==1 with/without flip), and match
an independent numpy bilinear reference at fractional scales (the filter —
bilinear vs host LANCZOS — is an augmentation-equivalent substitution, so
cross-engine image equality is only required at scale==1)."""
import numpy as np
import pytest
from PIL import Image

from auto_dynamic_deeplab_tpu.data.device_transforms import (
    make_eval_preprocess,
    make_train_augment,
    sample_augment_params,
)
from auto_dynamic_deeplab_tpu.data.transforms import (
    IGNORE_LABEL,
    full_image_eval_preprocess,
    train_preprocess,
)

MEAN = (0.3, 0.31, 0.29)
STD = (0.24, 0.25, 0.23)


class _FixedRng:
    """Forces flip + crop offsets so host and device draws coincide."""

    def __init__(self, flip: bool, i: int, j: int):
        self._flip, self._ij = flip, [i, j]

    def random_sample(self):
        return 0.0 if self._flip else 0.9

    def randint(self, lo, hi):
        v = self._ij.pop(0)
        assert lo <= v < hi
        return v


def _rand_img_mask(rng, h, w):
    img = rng.randint(0, 256, (h, w, 3)).astype(np.uint8)
    mask = rng.randint(0, 19, (h, w)).astype(np.uint8)
    mask[rng.rand(h, w) < 0.1] = IGNORE_LABEL
    return img, mask


def test_eval_preprocess_matches_host(rng):
    img, mask = _rand_img_mask(rng, 37, 53)
    out_hw = (41, 57)
    fn = make_eval_preprocess((37, 53), out_hw, MEAN, STD)
    di, dm = fn(img[None], mask[None])
    hi, hm = full_image_eval_preprocess(
        Image.fromarray(img), Image.fromarray(mask), out_hw, MEAN, STD
    )
    np.testing.assert_allclose(np.asarray(di)[0], hi, atol=1e-6)
    np.testing.assert_array_equal(np.asarray(dm)[0], hm)


@pytest.mark.parametrize("flip", [False, True])
def test_train_scale1_matches_host_exactly(rng, flip):
    """scale==1: no resampling on either engine → bit-comparable output."""
    img, mask = _rand_img_mask(rng, 48, 64)
    crop = (33, 41)
    i, j = 7, 11
    hi, hm = train_preprocess(
        Image.fromarray(img), Image.fromarray(mask), crop, MEAN, STD,
        scale=1.0, rng=_FixedRng(flip, i, j),
    )
    fn = make_train_augment((48, 64), crop, MEAN, STD)
    di, dm = fn(
        img[None], mask[None],
        np.float32([1.0]), np.array([flip]),
        np.int32([i]), np.int32([j]),
    )
    np.testing.assert_allclose(np.asarray(di)[0], hi, atol=1e-5)
    np.testing.assert_array_equal(np.asarray(dm)[0], hm)


def test_train_pad_region_when_scaled_down(rng):
    """scale 0.5 on a 40x40 source → 20x20 scaled image inside a 33x33 crop:
    the out-of-canvas region must be image 0 / label 255 (normalize-then-pad
    semantics), the in-canvas region must match a numpy bilinear reference."""
    img, mask = _rand_img_mask(rng, 40, 40)
    crop = (33, 33)
    s = 0.5
    fn = make_train_augment((40, 40), crop, MEAN, STD)
    di, dm = fn(
        img[None], mask[None],
        np.float32([s]), np.array([False]), np.int32([0]), np.int32([0]),
    )
    di, dm = np.asarray(di)[0], np.asarray(dm)[0]
    nh = int(round(40 * s))
    assert np.all(di[nh:, :, :] == 0.0) and np.all(di[:, nh:, :] == 0.0)
    assert np.all(dm[nh:, :] == IGNORE_LABEL)
    assert np.all(dm[:, nh:] == IGNORE_LABEL)

    # independent bilinear reference for the in-canvas region
    src = np.clip((np.arange(nh) + 0.5) / s - 0.5, 0, 39)
    i0 = np.floor(src).astype(int)
    i1 = np.minimum(i0 + 1, 39)
    f = src - i0
    rows = img[i0] * (1 - f)[:, None, None] + img[i1] * f[:, None, None]
    ref = (
        rows[:, i0] * (1 - f)[None, :, None] + rows[:, i1] * f[None, :, None]
    )
    ref = (ref / 255.0 - np.asarray(MEAN)) / np.asarray(STD)
    np.testing.assert_allclose(di[:nh, :nh], ref, atol=1e-4)

    mi = np.where(f >= 0.5, i1, i0)
    np.testing.assert_array_equal(dm[:nh, :nh], mask[mi][:, mi])


def test_sample_params_in_range(rng):
    for _ in range(50):
        s, flip, i, j = sample_augment_params((100, 140), (65, 65), rng=rng)
        assert 0.5 <= s <= 2.0 and isinstance(flip, bool)
        nh, nw = int(round(100 * s)), int(round(140 * s))
        assert 0 <= i <= max(nh, 65) - 65
        assert 0 <= j <= max(nw, 65) - 65


def test_batched_draws_differ(rng):
    """One compiled program serves every draw: two samples with different
    scalars produce different crops from the same source."""
    img, mask = _rand_img_mask(rng, 64, 64)
    fn = make_train_augment((64, 64), (33, 33), MEAN, STD)
    di, dm = fn(
        np.stack([img, img]), np.stack([mask, mask]),
        np.float32([1.0, 1.5]), np.array([False, True]),
        np.int32([0, 5]), np.int32([0, 9]),
    )
    assert not np.allclose(np.asarray(di)[0], np.asarray(di)[1])
