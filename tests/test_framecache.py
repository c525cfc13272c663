"""Native C++ frame cache: build, blob roundtrip, sync + prefetch sampling."""

import numpy as np
import pytest

from recurrent_flows_tpu.data import framecache as fc


@pytest.fixture(scope="module")
def blob(tmp_path_factory):
    if not fc.is_available():
        pytest.skip("g++ toolchain unavailable")
    rng = np.random.RandomState(0)
    videos = [
        (rng.rand(n, 8, 8, 1) * 255).astype(np.uint8)
        for n in (12, 20, 16)
    ]
    path = str(tmp_path_factory.mktemp("fc") / "frames.blob")
    fc.build_blob(videos, path)
    return path, videos


def test_sync_sampling(blob):
    path, videos = blob
    cache = fc.FrameCache(path, seq_len=6, batch_size=4)
    assert cache.n_videos == 3
    x = cache.sample_numpy(seed=7)
    assert x.shape == (4, 6, 8, 8, 1)
    assert x.dtype == np.float32
    assert 0.0 <= x.min() and x.max() <= 1.0
    # every sampled window must be a contiguous slice of some source video
    xb = (x * 255).astype(np.uint8)
    for item in xb:
        found = False
        for v in videos:
            for s in range(v.shape[0] - 6 + 1):
                if np.array_equal(v[s : s + 6], item):
                    found = True
        assert found, "sampled window not found in any source video"
    cache.close()


def test_prefetch_iteration(blob):
    path, _ = blob
    cache = fc.FrameCache(path, seq_len=4, batch_size=2, n_buffers=3,
                          batches_per_epoch=5)
    batches = list(iter(cache))
    assert len(batches) == 5
    for b in batches:
        assert b.shape == (2, 4, 8, 8, 1)
        assert np.all(np.isfinite(b))
    # prefetched batches differ (different seeds per fill)
    assert not np.array_equal(batches[0], batches[1])
    cache.close()
