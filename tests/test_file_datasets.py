"""KTH / BAIR file-based loaders on synthetic PNG trees (CPU)."""

import os

import numpy as np
import pytest

from recurrent_flows_tpu.data import KTH, PushDataset


def _write_png(path, arr):
    import matplotlib

    matplotlib.use("Agg")
    from matplotlib import image as mpimg

    mpimg.imsave(path, arr.squeeze(), cmap="gray", vmin=0, vmax=1)


@pytest.fixture(scope="module")
def kth_tree(tmp_path_factory):
    root = tmp_path_factory.mktemp("kth")
    rng = np.random.RandomState(0)
    for cls in ("boxing", "walking"):
        for person, tag in ((1, "train"), (21, "test")):
            d = root / "processed" / cls / f"person{person:02d}_{cls}_d1"
            os.makedirs(d)
            for i in range(12):
                _write_png(str(d / f"image-{i:03d}.png"), rng.rand(16, 16))
    return str(root)


@pytest.fixture(scope="module")
def bair_tree(tmp_path_factory):
    root = tmp_path_factory.mktemp("bair")
    rng = np.random.RandomState(0)
    for split in ("train", "test"):
        for t in range(2):
            d = root / split / f"traj_{t}_to_{t+1}" / "0"
            os.makedirs(d)
            for i in range(10):
                _write_png(str(d / f"{i}.png"), rng.rand(16, 16, 3))
    return str(root)


def test_kth_loader(kth_tree):
    ds = KTH(train=True, data_root=kth_tree, seq_len=6, batch_size=3,
             batches_per_epoch=2)
    assert len(ds.videos) == 2  # person01 in both classes
    x = ds.sample_numpy()
    assert x.shape == (3, 6, 16, 16, 1)
    assert x.dtype == np.float32 and 0 <= x.min() and x.max() <= 1
    # iteration protocol
    batches = list(iter(ds))
    assert len(batches) == 2
    # test split excludes person01
    ds_test = KTH(train=False, data_root=kth_tree, seq_len=6, batch_size=2)
    assert len(ds_test.videos) == 2  # person21 dirs
    # missing data raises a clear error
    with pytest.raises(FileNotFoundError):
        KTH(train=True, data_root="/nonexistent", seq_len=6)


def test_bair_loader(bair_tree):
    ds = PushDataset(split="train", dataset_dir=bair_tree, seq_len=5,
                     batch_size=2, batches_per_epoch=2)
    x = ds.sample_numpy()
    assert x.shape == (2, 5, 16, 16, 3)
    assert x.dtype == np.float32
    # test split uses prefix crops (deterministic start)
    ds_t = PushDataset(split="test", dataset_dir=bair_tree, seq_len=5,
                       batch_size=2)
    a = ds_t._sample_seq()
    assert a.shape == (5, 16, 16, 3)


def test_framecache_blob_from_loader(kth_tree, tmp_path):
    from recurrent_flows_tpu.data import framecache as fc

    if not fc.is_available():
        pytest.skip("g++ unavailable")
    loader = KTH(train=True, data_root=kth_tree, seq_len=4)
    blob = fc.blob_from_loader(loader, str(tmp_path / "kth.blob"))
    cache = fc.FrameCache(blob, seq_len=4, batch_size=2)
    assert cache.n_videos == 2
    x = cache.sample_numpy(seed=1)
    assert x.shape == (2, 4, 16, 16, 1)
    cache.close()
