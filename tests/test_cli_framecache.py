"""Integration: the KTH CLI path served by the native frame cache."""

import os

import numpy as np
import pytest

from recurrent_flows_tpu.data import framecache as fc


def test_main_rfn_on_kth_blob(tmp_path):
    if not fc.is_available():
        pytest.skip("g++ toolchain unavailable")
    # synthesize a KTH-like blob (8 videos, 16x16 gray)
    rng = np.random.RandomState(0)
    videos = [(rng.rand(24, 16, 16, 1) * 255).astype(np.uint8) for _ in range(8)]
    data_root = tmp_path / "kth_data"
    os.makedirs(data_root)
    for split in ("train", "test"):
        fc.build_blob(videos, str(data_root / f"kth_{split}.blob"))

    from recurrent_flows_tpu.cli import main_rfn

    tr = main_rfn.main([
        "--choose_data", "kth",
        "--data_root", str(data_root),
        "--image_size", "16",
        "--batch_size", "2",
        "--n_frames", "3",
        "--n_epochs", "1",
        "--steps_per_epoch", "2",
        "--n_conditions", "2",
        "--n_predictions", "2",
        "--h_dim", "8", "--z_dim", "2", "--a_dim", "4", "--L", "2", "--K", "2",
        "--extractor_structure", "4-pool-8", "8-pool-8",
        "--upscaler_structure", "8", "upsample-4",
        "--prior_structure", "4", "--encoder_structure", "4",
        "--n_units_affine", "8", "--n_units_prior", "8",
        "--norm_type_features", "none",
        "--path", str(tmp_path / "run"),
    ])
    assert np.isfinite(tr.losses[-1])
    # the dataset actually was the native cache
    from recurrent_flows_tpu.data.framecache import FrameCache

    assert isinstance(tr.data, FrameCache)
