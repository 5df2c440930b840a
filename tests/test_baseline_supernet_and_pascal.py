"""Coverage for the lighter-tested inventory rows: the baseline path supernet
(SURVEY.md §2.1 #6/#28, reference modeling/model_baseline_path_search.py and
search_layer.py), the Pascal VOC dataset (#15, dataloaders/datasets/pascal.py)
via a synthetic on-disk VOC tree, and the multi-host bootstrap helpers."""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from PIL import Image

from auto_dynamic_deeplab_tpu.data import DataLoader, make_data_loader
from auto_dynamic_deeplab_tpu.data.pascal import VOCSegmentation
from auto_dynamic_deeplab_tpu.models import ModelBaselinePathSearch
from auto_dynamic_deeplab_tpu.nas import AUTODEEPLAB_GENOTYPE
from auto_dynamic_deeplab_tpu.parallel import data_shard, initialize

X = jnp.asarray(np.random.RandomState(11).randn(2, 65, 65, 3), jnp.float32)


# --------------------------------------------------- baseline path supernet


def test_baseline_path_search_two_exits_betas_only():
    """Reference Model_layer_search_baseline: fixed cells, single fixed exit
    station + the final exit, betas are the only arch params
    (model_baseline_path_search.py:135-150,:434,:475)."""
    m = ModelBaselinePathSearch(
        19, AUTODEEPLAB_GENOTYPE, num_layers=6, F=2, B=5, exit_layer=3, remat=False
    )
    v = m.init(jax.random.PRNGKey(0), X, train=True)
    assert "alphas" not in v["arch"]
    assert v["arch"]["betas"].shape == (6, 4, 3)
    outs = m.apply(v, X, train=False)
    assert [tuple(o.shape) for o in outs] == [(2, 65, 65, 19)] * 2


def test_baseline_path_search_is_non_dense():
    """The baseline trellis has NO dense connections
    (model_baseline_path_search.py:135-150): no dense_preprocess modules in
    the param pytree, unlike the dense ModelNetSearch."""
    from auto_dynamic_deeplab_tpu.models import ModelNetSearch

    mb = ModelBaselinePathSearch(
        19, AUTODEEPLAB_GENOTYPE, num_layers=6, F=2, B=5, exit_layer=3, remat=False
    )
    vb = mb.init(jax.random.PRNGKey(0), X, train=True)
    assert not any("dense_preprocess" in k for k in vb["params"])

    md = ModelNetSearch(
        19, AUTODEEPLAB_GENOTYPE, num_layers=6, F=2, B=5, C_index=(3,), remat=False
    )
    vd = md.init(jax.random.PRNGKey(0), X, train=True)
    assert any("dense_preprocess" in k for k in vd["params"])
    # fewer params without the dense taps
    count = lambda v: sum(int(np.prod(a.shape)) for a in jax.tree.leaves(v["params"]))
    assert count(vb) < count(vd)


def test_baseline_path_search_beta_gradients():
    m = ModelBaselinePathSearch(
        19, AUTODEEPLAB_GENOTYPE, num_layers=6, F=2, B=5, exit_layer=3, remat=False
    )
    v = m.init(jax.random.PRNGKey(0), X, train=True)
    y = jnp.asarray(np.random.RandomState(1).randint(0, 19, (2, 65, 65)))

    def loss_fn(arch):
        from auto_dynamic_deeplab_tpu.train.loss import multi_exit_cross_entropy

        outs, _ = m.apply(
            {"params": v["params"], "batch_stats": v["batch_stats"], "arch": arch},
            X, train=True, mutable=["batch_stats"],
        )
        # search_layer.py:187-196: loss_1 + loss_2 over both exit stations
        return multi_exit_cross_entropy(outs, y)

    g = jax.grad(loss_fn)(v["arch"])
    assert float(jnp.abs(g["betas"]).max()) > 0
    # masked transitions (no level above 0 at layer 0) carry no gradient
    assert float(jnp.abs(g["betas"][0, 0, 0])) == 0


# --------------------------------------------------------------- Pascal VOC


@pytest.fixture(scope="module")
def voc_root(tmp_path_factory):
    """Tiny synthetic VOC2012 tree: 3 train + 2 val images."""
    root = tmp_path_factory.mktemp("VOCdevkit")
    base = root / "VOC2012"
    (base / "JPEGImages").mkdir(parents=True)
    (base / "SegmentationClass").mkdir()
    (base / "ImageSets" / "Segmentation").mkdir(parents=True)
    rng = np.random.RandomState(0)
    names = {"train": ["a1", "a2", "a3"], "val": ["b1", "b2"]}
    for split, ids in names.items():
        for n in ids:
            h, w = int(rng.randint(40, 80)), int(rng.randint(40, 80))
            Image.fromarray(
                rng.randint(0, 255, (h, w, 3), dtype=np.uint8)
            ).save(base / "JPEGImages" / f"{n}.jpg")
            mask = rng.randint(0, 21, (h, w)).astype(np.uint8)
            mask[0, 0] = 255  # VOC boundary/ignore pixel
            Image.fromarray(mask).save(base / "SegmentationClass" / f"{n}.png")
        (base / "ImageSets" / "Segmentation" / f"{split}.txt").write_text(
            "\n".join(ids) + "\n"
        )
    return str(root)


def test_voc_train_item_shapes_and_labels(voc_root):
    ds = VOCSegmentation(voc_root, "train", crop_size=(65, 65))
    assert len(ds) == 3
    item = ds.__getitem__(0, rng=np.random.RandomState(0))
    assert item["image"].shape == (65, 65, 3)
    assert item["label"].shape == (65, 65)
    lab = item["label"]
    assert lab.dtype == np.int32
    # labels are valid VOC classes or the 255 ignore/pad value
    assert set(np.unique(lab)) <= set(range(21)) | {255}


def test_voc_val_full_image_pad(voc_root):
    ds = VOCSegmentation(voc_root, "val", crop_size=(81, 81))
    item = ds[1]
    assert item["image"].shape == (81, 81, 3)
    # padded region of the mask is ignore-255
    assert item["label"][-1, -1] == 255


def test_make_data_loader_pascal(voc_root):
    train, val, nclass = make_data_loader(
        "pascal", batch_size=2, root=voc_root, num_workers=0, crop_size=(65, 65)
    )
    assert nclass == 21
    batch = next(iter(train))
    assert batch["image"].shape[0] == 2
    vb = next(iter(val))
    assert vb["label"].dtype.kind == "i"


def test_voc_missing_split_raises(voc_root):
    with pytest.raises(FileNotFoundError):
        VOCSegmentation(voc_root, "trainval")


# ------------------------------------------------------- multi-host helpers


def test_initialize_single_process_noop(monkeypatch):
    monkeypatch.delenv("COORDINATOR_ADDRESS", raising=False)
    assert initialize() == (0, 1)


def test_data_shard_matches_process_topology():
    rank, world = data_shard()
    assert (rank, world) == (jax.process_index(), jax.process_count())
    # loader-level sharding partitions the dataset disjointly
    from auto_dynamic_deeplab_tpu.data import SyntheticSegmentation

    ds = SyntheticSegmentation(length=8, crop_size=(33, 33))
    seen = []
    for r in range(2):
        loader = DataLoader(
            ds, batch_size=2, shuffle=False, drop_last=False,
            num_workers=0, shard=(r, 2),
        )
        for batch in loader:
            seen.append(np.asarray(batch["image"]))
    total = sum(a.shape[0] for a in seen)
    assert total == 8
