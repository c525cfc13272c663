"""CelebA from-scratch path (VERDICT r1 item #10): raw image dir ->
prepare_celeba -> pickle -> boxed conditional pairs -> cGlow training smoke.

Reference only documents a pickle download (data_generators/celeba.py:9-26);
here the whole workload is runnable without a pre-baked pickle.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from recurrent_flows_tpu.data import (
    get_celeba,
    get_joint_conditioned_data,
    prepare_celeba,
)


def _make_image_dir(tmp_path, n=6):
    from PIL import Image

    d = tmp_path / "raw_images"
    d.mkdir()
    rng = np.random.RandomState(0)
    for i in range(n):
        # non-square, like img_align_celeba (178x218)
        arr = rng.randint(0, 256, (54, 44, 3), np.uint8)
        Image.fromarray(arr).save(d / f"{i:06d}.jpg")
    return str(d)


@pytest.mark.fast
def test_prepare_celeba_roundtrip(tmp_path):
    img_dir = _make_image_dir(tmp_path)
    out = str(tmp_path / "data" / "celeba_32.pkl")
    n = prepare_celeba(img_dir, out, size=32)
    assert n == 6 and os.path.exists(out)
    arr = get_celeba(str(tmp_path / "data"))
    assert arr.shape == (6, 32, 32, 3)
    assert arr.dtype == np.float32
    assert 0.0 <= arr.min() and arr.max() <= 1.0
    x, y = get_joint_conditioned_data(arr, box=8)
    assert x.shape == arr.shape and y.shape == (6, 8, 8, 3)
    # inner box of x zeroed, y is that box
    assert np.abs(x[:, 12:20, 12:20]).max() == 0.0
    np.testing.assert_allclose(y, arr[:, 12:20, 12:20])


@pytest.mark.slow
def test_cglow_trains_from_prepared_pickle(tmp_path):
    """End-to-end: prepared pickle -> ConditionalGlowImage learns p(inner|outer)."""
    import optax

    from recurrent_flows_tpu.config import GlowConfig
    from recurrent_flows_tpu.models.glow_image import ConditionalGlowImage

    img_dir = _make_image_dir(tmp_path, n=8)
    out = str(tmp_path / "data" / "celeba_32.pkl")
    prepare_celeba(img_dir, out, size=16)
    images = get_celeba(str(tmp_path / "data"))
    boxed, _inner = get_joint_conditioned_data(images, box=8)
    # model p(full image | box-zeroed context) — context and target share
    # spatial size (the cGlow conditioning contract)
    ctx = jnp.asarray(boxed) - 0.5
    target = jnp.asarray(images) - 0.5

    cfg = GlowConfig(L=2, K=2, n_units_affine=16, n_units_prior=16)
    m = ConditionalGlowImage(3, 16, cfg, cond_channels=8)
    v = m.init(jax.random.key(0), target, ctx, jax.random.key(1))
    tx = optax.adam(1e-3)
    opt = tx.init(v["params"])

    @jax.jit
    def step(params, opt, key):
        def nll(p):
            out = m.apply({"params": p, "consts": v["consts"]},
                          target, ctx, key, method="log_prob")
            return jnp.mean(out)

        val, g = jax.value_and_grad(nll)(params)
        upd, opt = tx.update(g, opt)
        return optax.apply_updates(params, upd), opt, val

    params = v["params"]
    losses = []
    for i in range(12):
        params, opt, val = step(params, opt, jax.random.key(2 + i))
        losses.append(float(val))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0], losses
    # sampling with the trained params produces the target shape
    s = m.apply({"params": params, "consts": v["consts"]}, ctx,
                jax.random.key(99), method="sample")
    assert s.shape == target.shape
