"""Data pipeline: transform parity vs the reference pipeline (deterministic
parts), label encoding, loader batching/sharding."""
import sys

import numpy as np
import pytest
from PIL import Image

sys.path.insert(0, "/root/reference")

from auto_dynamic_deeplab_tpu.data import (
    DataLoader,
    SyntheticSegmentation,
    calculate_class_weights,
    decode_segmap,
    full_image_eval_preprocess,
    train_preprocess,
)
from auto_dynamic_deeplab_tpu.data.cityscapes import encode_segmap


def _fake_pair(rng, h=40, w=60):
    img = Image.fromarray(rng.randint(0, 255, (h, w, 3), dtype=np.uint8))
    mask = Image.fromarray(rng.randint(0, 34, (h, w)).astype(np.uint8))
    return img, mask


def test_full_image_eval_semantics(rng):
    """Oracle inlined (reference custom_transforms.py:322-347 needs
    torchvision, absent here): ToTensor(/255) → Normalize → zero-pad image /
    255-pad mask, no crop."""
    img, mask = _fake_pair(rng)
    crop = (41, 65)
    mean = np.array((0.29866842, 0.30135223, 0.30561872), np.float32)
    std = np.array((0.23925215, 0.23859318, 0.2385942), np.float32)

    ours_img, ours_mask = full_image_eval_preprocess(img, mask, crop, mean, std)

    base = (np.asarray(img, np.float32) / 255.0 - mean) / std
    ref_img = np.zeros((41, 65, 3), np.float32)
    ref_img[:40, :60] = base
    ref_mask = np.full((41, 65), 255, np.int32)
    ref_mask[:40, :60] = np.asarray(mask, np.int32)

    np.testing.assert_allclose(ours_img, ref_img, rtol=1e-5, atol=1e-6)
    np.testing.assert_array_equal(ours_mask, ref_mask)


def test_encode_segmap_matches_reference_mapping(rng):
    raw = rng.randint(0, 34, (30, 30)).astype(np.uint8)
    ours = encode_segmap(raw.copy())

    # reference loop (cityscapes.py:86-91) as oracle
    void = [0, 1, 2, 3, 4, 5, 6, 9, 10, 14, 15, 16, 18, 29, 30]
    valid = [7, 8, 11, 12, 13, 17, 19, 20, 21, 22, 23, 24, 25, 26, 27, 28, 31, 32, 33]
    ref = raw.astype(np.int32).copy()
    for v in void:
        ref[ref == v] = 255
    for tid, v in enumerate(valid):
        ref[ref == v] = tid
    np.testing.assert_array_equal(ours, ref)


def test_train_preprocess_properties(rng):
    img, mask = _fake_pair(rng, 80, 120)
    r = np.random.RandomState(3)
    image, label = train_preprocess(img, mask, (65, 65), rng=r)
    assert image.shape == (65, 65, 3) and image.dtype == np.float32
    assert label.shape == (65, 65) and label.dtype == np.int32
    # pad regions of the mask (if any) must be 255
    assert set(np.unique(label)).issubset(set(range(34)) | {255})


def test_loader_batches_and_shards():
    ds = SyntheticSegmentation(length=32, crop_size=(17, 17))
    loader = DataLoader(ds, batch_size=4, shuffle=True, num_workers=2, seed=0)
    batches = list(loader)
    assert len(batches) == 8
    assert batches[0]["image"].shape == (4, 17, 17, 3)
    assert batches[0]["label"].dtype == np.int32

    # epoch reshuffle changes order
    loader.set_epoch(1)
    batches2 = list(loader)
    assert not np.allclose(batches[0]["image"], batches2[0]["image"])

    # 2-way sharding partitions the index space
    l0 = DataLoader(ds, 4, shuffle=False, shard=(0, 2))
    l1 = DataLoader(ds, 4, shuffle=False, shard=(1, 2))
    assert len(l0) == len(l1) == 4


def test_class_weights_and_colorize():
    ds = SyntheticSegmentation(length=4, crop_size=(33, 33))
    w = calculate_class_weights(ds, 19)
    assert w.shape == (19,) and np.all(w > 0)
    rgb = decode_segmap(ds[0]["label"])
    assert rgb.shape == (33, 33, 3) and rgb.dtype == np.uint8
    # ignore pixels map to black
    lab = ds[0]["label"]
    if (lab == 255).any():
        assert np.all(rgb[lab == 255] == 0)
