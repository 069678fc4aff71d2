"""Disk-persisted decode cache (--decode_cache_dir).

The RAM cache (--cache_decoded) pays a full decode pass per ImageFolder
per process; chunked flagship runs restart a fresh process per chunk and
the registry builds several folders over the same directory. The disk
variant persists one fingerprinted memory-mapped .npy per folder so the
decode pass happens once per dataset. These tests pin:

* second construction serves images WITHOUT touching PIL decode,
* pixel equality with the direct decode path,
* fingerprint invalidation when a file's content changes,
* graceful fallback to the RAM cache for non-uniform image sizes.
"""

import os
import time

import numpy as np
import pytest
from PIL import Image

from count_pipnet_tpu.data import datasets as D


@pytest.fixture()
def image_tree(tmp_path):
    root = tmp_path / "imgs"
    rng = np.random.default_rng(0)
    for cls in ("a", "b"):
        (root / cls).mkdir(parents=True)
        for i in range(3):
            arr = rng.integers(0, 255, (16, 16, 3), dtype=np.uint8)
            Image.fromarray(arr).save(root / cls / f"{i}.png")
    return root


def test_builds_and_reuses_mmap(image_tree, tmp_path, monkeypatch):
    cache_dir = tmp_path / "cache"
    ds1 = D.ImageFolder(image_tree, cache_decoded=True,
                        decode_cache_dir=str(cache_dir))
    assert ds1._mm is not None and ds1._cache is None
    npys = [f for f in os.listdir(cache_dir) if f.endswith(".npy")]
    assert len(npys) == 1

    # reference pixels via a plain (uncached) folder
    plain = D.ImageFolder(image_tree)
    want = [np.asarray(plain.load_image(i)) for i in range(len(plain))]

    # second construction must not decode: poison PIL's open
    def boom(*a, **k):
        raise AssertionError("decode path hit despite a warm disk cache")

    monkeypatch.setattr(D.Image, "open", boom)
    ds2 = D.ImageFolder(image_tree, cache_decoded=True,
                        decode_cache_dir=str(cache_dir))
    assert ds2._mm is not None
    for i in range(len(ds2)):
        got = np.asarray(ds2.load_image(i))
        np.testing.assert_array_equal(got, want[i])
    # no second cache file appeared
    assert [f for f in os.listdir(cache_dir)
            if f.endswith(".npy")] == npys


def test_fingerprint_invalidation(image_tree, tmp_path):
    cache_dir = tmp_path / "cache"
    D.ImageFolder(image_tree, cache_decoded=True,
                  decode_cache_dir=str(cache_dir))
    # rewrite one image with different content (and size, and mtime)
    target = image_tree / "a" / "0.png"
    big = np.zeros((16, 16, 3), np.uint8)
    big[:8] = 255
    time.sleep(1.1)  # integer-mtime granularity
    Image.fromarray(big).save(target)

    ds = D.ImageFolder(image_tree, cache_decoded=True,
                       decode_cache_dir=str(cache_dir))
    assert ds._mm is not None
    np.testing.assert_array_equal(np.asarray(ds.load_image(0)), big)
    # a new fingerprint file was created alongside the stale one
    npys = [f for f in os.listdir(cache_dir) if f.endswith(".npy")]
    assert len(npys) == 2


def test_nonuniform_sizes_fall_back_to_ram_cache(tmp_path):
    root = tmp_path / "imgs"
    (root / "a").mkdir(parents=True)
    Image.fromarray(np.zeros((16, 16, 3), np.uint8)).save(root / "a/0.png")
    Image.fromarray(np.zeros((20, 16, 3), np.uint8)).save(root / "a/1.png")

    ds = D.ImageFolder(root, cache_decoded=True,
                       decode_cache_dir=str(tmp_path / "cache"))
    assert ds._mm is None and ds._cache is not None  # RAM fallback
    assert np.asarray(ds.load_image(1)).shape == (20, 16, 3)
    # no half-written cache file left behind
    leftovers = [f for f in os.listdir(tmp_path / "cache")
                 if f.endswith(".npy") or f.endswith(".tmp")]
    assert leftovers == []


def test_no_cache_dir_keeps_ram_semantics(image_tree):
    ds = D.ImageFolder(image_tree, cache_decoded=True)
    assert ds._mm is None and ds._cache == {}
    ds.load_image(0)
    assert 0 in ds._cache
