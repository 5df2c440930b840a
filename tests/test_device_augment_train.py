"""End-to-end: raw uint8 loader → on-device augmentation → train step.

The device-augment input pipeline (data/device_transforms.py + Trainer
device_augment=True) must train from a decode-only Cityscapes loader exactly
like the host pipeline does: finite losses, correct cropped shapes, and
deterministic augmentation draws per (seed, epoch, batch)."""
import numpy as np
import pytest
from PIL import Image

from auto_dynamic_deeplab_tpu.data import DataLoader, make_data_loader
from auto_dynamic_deeplab_tpu.data.cityscapes import CityscapesSegmentation


@pytest.fixture()
def cityscapes_tree(tmp_path, rng):
    """Tiny on-disk Cityscapes-shaped tree: 4 train images, 2 val."""
    for split, cities, n in (("train", ["aaa"], 4), ("val", ["bbb"], 2)):
        for city in cities:
            img_dir = tmp_path / "leftImg8bit" / split / city
            lab_dir = tmp_path / "gtFine" / split / city
            img_dir.mkdir(parents=True)
            lab_dir.mkdir(parents=True)
            for k in range(n):
                img = rng.randint(0, 256, (96, 128, 3)).astype(np.uint8)
                raw = rng.choice(
                    [7, 8, 11, 26, 0], size=(96, 128), p=[0.3, 0.2, 0.2, 0.2, 0.1]
                ).astype(np.uint8)
                Image.fromarray(img).save(
                    img_dir / f"{city}_{k:06d}_leftImg8bit.png"
                )
                Image.fromarray(raw).save(
                    lab_dir / f"{city}_{k:06d}_gtFine_labelIds.png"
                )
    return tmp_path


def test_raw_mode_items(cityscapes_tree):
    ds = CityscapesSegmentation(str(cityscapes_tree), "train", raw=True)
    item = ds[0]
    assert item["image_u8"].dtype == np.uint8
    assert item["image_u8"].shape == (96, 128, 3)
    assert item["label_u8"].dtype == np.uint8
    assert item["label_u8"].shape == (96, 128)
    # LUT applied: only train ids 0..18 and 255 remain
    vals = set(np.unique(item["label_u8"]).tolist())
    assert vals <= set(range(19)) | {255}


def test_trainer_device_augment_end_to_end(cityscapes_tree):
    import jax.numpy as jnp

    from auto_dynamic_deeplab_tpu.models import ADD
    from auto_dynamic_deeplab_tpu.nas import AUTODEEPLAB_GENOTYPE
    from auto_dynamic_deeplab_tpu.train.trainer import TrainConfig, Trainer

    train_loader, val_loader, nclass = make_data_loader(
        "cityscapes", 2, root=str(cityscapes_tree), num_workers=2,
        crop_size=(65, 65), raw_train=True,
    )
    batch = next(iter(train_loader))
    assert batch["image_u8"].shape == (2, 96, 128, 3)

    model = ADD(
        [0, 0, 1], [1], AUTODEEPLAB_GENOTYPE, nclass, F=2, B=5,
        low_level_layer=0,
    )
    cfg = TrainConfig(
        epochs=1, eval_interval=0, data_parallel=False,
        device_augment=True, crop_size=(65, 65), run_dir="run_t",
    )
    import tempfile

    with tempfile.TemporaryDirectory() as td:
        cfg.run_dir = td
        trainer = Trainer(model, train_loader, val_loader, cfg, seed=3)
        loss = trainer.training(0)
    assert np.isfinite(loss)


def test_rawcache_roundtrip(cityscapes_tree, tmp_path):
    """Decode-once memmap cache serves byte-identical items to the raw
    dataset, rebuild is skipped when complete, and it drops into DataLoader."""
    from auto_dynamic_deeplab_tpu.data.rawcache import RawArrayCache

    ds = CityscapesSegmentation(str(cityscapes_tree), "train", raw=True)
    cache_dir = str(tmp_path / "cache")
    cache = RawArrayCache.build(ds, cache_dir)
    assert len(cache) == len(ds)
    for i in (0, len(ds) - 1):
        a, b = ds[i], cache[i]
        np.testing.assert_array_equal(a["image_u8"], b["image_u8"])
        np.testing.assert_array_equal(a["label_u8"], b["label_u8"])
    # second build: served from the existing cache (no rewrite)
    mtime = (tmp_path / "cache" / "images.npy").stat().st_mtime_ns
    RawArrayCache.build(ds, cache_dir)
    assert (tmp_path / "cache" / "images.npy").stat().st_mtime_ns == mtime

    loader = DataLoader(cache, 2, num_workers=2)
    batch = next(iter(loader))
    assert batch["image_u8"].shape == (2, 96, 128, 3)
    assert batch["image_u8"].dtype == np.uint8


def test_device_augment_missing_crop_raises(cityscapes_tree):
    from auto_dynamic_deeplab_tpu.models import ADD
    from auto_dynamic_deeplab_tpu.nas import AUTODEEPLAB_GENOTYPE
    from auto_dynamic_deeplab_tpu.train.trainer import TrainConfig, Trainer

    ds = CityscapesSegmentation(str(cityscapes_tree), "train", raw=True)
    loader = DataLoader(ds, 2, num_workers=1)
    model = ADD([0, 0, 1], [1], AUTODEEPLAB_GENOTYPE, 19, F=2, B=5,
                low_level_layer=0)
    with pytest.raises(ValueError, match="crop_size"):
        Trainer(
            model, loader, loader,
            TrainConfig(device_augment=True, data_parallel=False),
            seed=0,
        )
