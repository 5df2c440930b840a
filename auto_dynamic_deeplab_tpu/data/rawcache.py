"""Decode-once raw uint8 cache: the storage layer of the on-device input
pipeline (SURVEY §7 step 4).

PNG decode costs ~100-200 ms/image of host CPU for Cityscapes-sized frames —
far above the ~16 ms/sample an 8-image/133 ms train step demands — and burns
that cost again every epoch. The reference eats it with a pool of decoder
processes (torch DataLoader workers, dataloaders/__init__.py:30-36); the
TPU-native answer is to stop re-decoding: decode each frame ONCE into a
memory-mapped uint8 array file, then serve zero-copy views forever after.
Combined with data/device_transforms.py (augmentation as one jitted XLA
program) the host's per-sample work drops to a memmap slice + H2D enqueue.

Files under ``cache_dir``: images.npy (N,H,W,3) u8, labels.npy (N,H,W) u8
(train-id encoded), meta.json. Build once with ``RawArrayCache.build``; the
class is a map-style dataset yielding the same ``{"image_u8", "label_u8"}``
items as a ``raw=True`` dataset, so it drops into DataLoader unchanged.
"""
from __future__ import annotations

import json
import os

import numpy as np


class RawArrayCache:
    """Map-style dataset over a decode-once raw uint8 cache."""

    def __init__(self, cache_dir: str):
        with open(os.path.join(cache_dir, "meta.json")) as f:
            self.meta = json.load(f)
        n, h, w = self.meta["n"], self.meta["h"], self.meta["w"]
        self.images = np.lib.format.open_memmap(
            os.path.join(cache_dir, "images.npy"), mode="r"
        )
        self.labels = np.lib.format.open_memmap(
            os.path.join(cache_dir, "labels.npy"), mode="r"
        )
        assert self.images.shape == (n, h, w, 3), self.images.shape
        assert self.labels.shape == (n, h, w), self.labels.shape
        self.NUM_CLASSES = self.meta.get("num_classes", 19)

    def __len__(self):
        return self.meta["n"]

    def __getitem__(self, index: int, rng=None):
        # np.asarray of a memmap slice: pages fault in lazily; after the
        # first epoch the OS page cache serves them at memory speed
        return {
            "image_u8": np.asarray(self.images[index]),
            "label_u8": np.asarray(self.labels[index]),
        }

    @staticmethod
    def build(dataset, cache_dir: str, num_classes: int = 19) -> "RawArrayCache":
        """Decode every item of a ``raw=True``-style dataset once into the
        cache (skipped if a complete cache already exists)."""
        meta_path = os.path.join(cache_dir, "meta.json")
        if os.path.isfile(meta_path):
            try:
                return RawArrayCache(cache_dir)
            except Exception:  # noqa: BLE001 — incomplete cache: rebuild
                pass
        os.makedirs(cache_dir, exist_ok=True)
        first = dataset[0]
        h, w = first["image_u8"].shape[:2]
        n = len(dataset)
        images = np.lib.format.open_memmap(
            os.path.join(cache_dir, "images.npy"), mode="w+",
            dtype=np.uint8, shape=(n, h, w, 3),
        )
        labels = np.lib.format.open_memmap(
            os.path.join(cache_dir, "labels.npy"), mode="w+",
            dtype=np.uint8, shape=(n, h, w),
        )
        for i in range(n):
            item = first if i == 0 else dataset[i]
            images[i] = item["image_u8"]
            labels[i] = item["label_u8"]
        images.flush()
        labels.flush()
        with open(meta_path, "w") as f:
            json.dump({"n": n, "h": h, "w": w, "num_classes": num_classes}, f)
        return RawArrayCache(cache_dir)
