"""I3D / AlexNet-LPIPS weight-loading paths (VERDICT r1 item #5).

Real pretrained weights cannot be fetched on this zero-egress host, so
these tests pin the *plumbing*: the architectures run, the npz loader
validates keys/shapes, `fvd(embedder='i3d')`/`lpips(backend='alex')` work
given a weights file (random weights in the exact checkpoint layout), and
the embedding is deterministic against a committed fingerprint. Dropping a
real exported npz (scripts/export_{i3d,lpips}_weights.py) is then a pure
file-drop. Reference protocols: evaluation_metrics/FVD.py:74-132,
error_metrics.py:72,173-187.
"""

import numpy as np
import pytest

from recurrent_flows_tpu.evaluation import alexnet_lpips, i3d
from recurrent_flows_tpu.evaluation.fvd import fvd
from recurrent_flows_tpu.evaluation.lpips import lpips_distance


def _video(n=2, t=16, s=32):
    return np.linspace(0, 1, n * t * s * s, dtype=np.float32).reshape(
        n, t, s, s, 1)


@pytest.mark.slow
def test_i3d_embed_shape_and_fingerprint():
    params = i3d.random_params(0)
    emb = i3d.i3d_embed(_video(), params)
    assert emb.shape == (2, 400)
    assert np.isfinite(emb).all()
    # committed fingerprint: pins architecture + loader layout across
    # refactors (computed once on CPU f32, highest matmul precision)
    np.testing.assert_allclose(
        emb[0, :3], [-1.686097, -1.061059, 0.946077], rtol=2e-3)


@pytest.mark.fast
def test_i3d_loader_validates(tmp_path):
    params = i3d.random_params(1)
    path = str(tmp_path / "w.npz")
    np.savez(path, **params)
    loaded = i3d.load_params(path)
    assert set(loaded) == set(i3d.expected_keys())
    # missing key -> hard error
    bad = dict(params)
    bad.pop("RGB/inception_i3d/Conv3d_1a_7x7/conv_3d/w")
    np.savez(str(tmp_path / "bad.npz"), **bad)
    with pytest.raises(ValueError, match="missing"):
        i3d.load_params(str(tmp_path / "bad.npz"))
    # wrong shape -> hard error
    bad2 = dict(params)
    bad2["RGB/inception_i3d/Conv3d_2b_1x1/conv_3d/w"] = np.zeros(
        (3, 3, 3, 64, 64), np.float32)
    np.savez(str(tmp_path / "bad2.npz"), **bad2)
    with pytest.raises(ValueError, match="shape"):
        i3d.load_params(str(tmp_path / "bad2.npz"))


@pytest.mark.slow
def test_fvd_with_jax_i3d_weights_file(tmp_path):
    path = str(tmp_path / "i3d.npz")
    np.savez(path, **i3d.random_params(0))
    rng = np.random.RandomState(0)
    real = rng.uniform(0, 1, (6, 12, 24, 24, 1)).astype(np.float32)
    fake = rng.uniform(0, 1, (6, 12, 24, 24, 1)).astype(np.float32)
    same = fvd(real, real.copy(), embedder="i3d", i3d_weights=path, batch=3)
    diff = fvd(real, fake, embedder="i3d", i3d_weights=path, batch=3)
    assert same["embedder"] == "i3d-jax"
    assert same["fvd"] < 1e-4
    assert diff["fvd"] > same["fvd"]


@pytest.mark.fast
def test_lpips_alex_properties(tmp_path):
    path = str(tmp_path / "alex.npz")
    np.savez(path, **alexnet_lpips.random_params(0))
    rng = np.random.RandomState(1)
    a = rng.uniform(-1, 1, (3, 64, 64, 1)).astype(np.float32)
    b = rng.uniform(-1, 1, (3, 64, 64, 1)).astype(np.float32)
    d_same = np.asarray(lpips_distance(a, a, backend="alex", weights=path))
    d_diff = np.asarray(lpips_distance(a, b, backend="alex", weights=path))
    assert d_same.shape == (3,)
    np.testing.assert_allclose(d_same, 0.0, atol=1e-6)
    assert (d_diff > 1e-3).all()
    # a small perturbation scores below a full resample
    d_near = np.asarray(
        lpips_distance(a, a + 0.05 * b, backend="alex", weights=path))
    assert (d_near < d_diff).all()


@pytest.mark.fast
def test_lpips_alex_missing_weights_errors():
    a = np.zeros((1, 32, 32, 1), np.float32)
    with pytest.raises(FileNotFoundError):
        lpips_distance(a, a, backend="alex", weights=None)


@pytest.mark.fast
def test_alexnet_loader_validates(tmp_path):
    params = alexnet_lpips.random_params(2)
    path = str(tmp_path / "ok.npz")
    np.savez(path, **params)
    alexnet_lpips.load_params(path)
    bad = dict(params)
    bad.pop("lin3/w")
    np.savez(str(tmp_path / "bad.npz"), **bad)
    with pytest.raises(ValueError, match="missing"):
        alexnet_lpips.load_params(str(tmp_path / "bad.npz"))
