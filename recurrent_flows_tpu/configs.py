"""Preset configurations mirroring the reference's production setups.

``rfn_mnist_production`` encodes the hyperparameters documented in the
reference's LSF job script (RFN/default_rfn_job.sh: K=10, L=5, h=200,
z=56, extractor 16-16-pool-32 / ... / 256-pool-512, upscaler 256 /
upsample-128-128 / ..., beta warmup to 1.0 over 10k steps, lr 1e-4,
skip_connection_flow=without_skip). A user of the reference can reproduce
their training run with:

    from recurrent_flows_tpu.configs import rfn_mnist_production
    model_cfg, train_cfg = rfn_mnist_production()
"""

from __future__ import annotations

from .config import GlowConfig, RFNConfig, SRNNConfig, SVGConfig, TrainConfig, VRNNConfig


def rfn_mnist_production():
    """The thesis' production SM-MNIST RFN (reference default_rfn_job.sh)."""
    model = RFNConfig(
        x_channels=1,
        image_size=64,
        h_dim=200,
        z_dim=56,
        a_dim=200,
        L=5,
        K=10,
        extractor_structure=(
            (16, 16, "pool", 32),
            (32, "pool", 64),
            (64, "pool", 128),
            (128, "pool", 256),
            (256, "pool", 512),
        ),
        upscaler_structure=(
            (256,),
            ("upsample", 128, 128),
            ("upsample", 64, 64),
            ("upsample", 32, 32),
            ("upsample", 16, 16),
        ),
        prior_structure=(256, 256),
        encoder_structure=(256, 256),
        norm_type="none",
        norm_type_features="batchnorm",
        skip_connection_flow="without_skip",
        skip_connection_features=True,
        downscaler_tanh=False,
        upscaler_tanh=False,
        temperature=0.7,
        glow=GlowConfig(L=5, K=10, n_units_affine=256, n_units_prior=512,
                        flow_norm="actnorm", clamp_type="realnvp"),
    )
    train = TrainConfig(
        batch_size=30,
        n_frames=10,
        choose_data="mnist",
        digit_size=28,
        num_digits=2,
        step_length=4,
        n_bits=8,
        learning_rate=1e-4,
        patience_lr=50,
        beta_max=1.0,
        beta_min=1e-4,
        beta_steps=10_000,
    )
    return model, train


def rfn_kth():
    """64x64 grayscale KTH RFN at thesis scale (job-script geometry, L=4)."""
    model = RFNConfig(
        x_channels=1,
        image_size=64,
        h_dim=256,
        z_dim=32,
        a_dim=200,
        L=4,
        K=10,
        extractor_structure=(
            (32, "pool", 64),
            (64, "pool", 128),
            (128, "pool", 256),
            (256, "pool", 256),
        ),
        upscaler_structure=(
            (256, 128),
            ("upsample", 128, 128),
            ("upsample", 64, 64),
            ("upsample", 32, 32),
        ),
        prior_structure=(256, 64),
        encoder_structure=(256, 64),
        norm_type="none",
        norm_type_features="batchnorm",
        glow=GlowConfig(L=4, K=10, n_units_affine=256, n_units_prior=512),
    )
    train = TrainConfig(batch_size=32, n_frames=10, choose_data="kth",
                        learning_rate=1e-4, beta_steps=12_000)
    return model, train


def rfn_bair():
    """64x64 RGB BAIR RFN (3-channel variant of the KTH config)."""
    model, train = rfn_kth()
    import dataclasses

    model = dataclasses.replace(model, x_channels=3)
    train = dataclasses.replace(train, choose_data="bair", n_frames=12)
    return model, train


def srnn_mnist():
    model = SRNNConfig(x_channels=1, image_size=64, h_dim=256, z_dim=32,
                       a_dim=256, loss_type="bernoulli",
                       preprocess_range="1.0", enable_smoothing=True)
    train = TrainConfig(batch_size=32, n_frames=10, preprocess_range="1.0",
                        learning_rate=1e-4)
    return model, train


def vrnn_mnist():
    model = VRNNConfig(x_channels=1, image_size=64, h_dim=256, z_dim=32,
                       loss_type="bernoulli", preprocess_range="1.0")
    train = TrainConfig(batch_size=32, n_frames=10, preprocess_range="1.0",
                        learning_rate=1e-4)
    return model, train


def svg_mnist():
    model = SVGConfig(x_channels=1, image_size=64, z_dim=10, c_features=128,
                      h_dim=256, loss_type="mse")
    train = TrainConfig(batch_size=32, n_frames=10, preprocess_range="none",
                        learning_rate=1e-3, beta_max=1e-4, beta_min=1e-4)
    return model, train


PRESETS = {
    "rfn_mnist_production": rfn_mnist_production,
    "rfn_kth": rfn_kth,
    "rfn_bair": rfn_bair,
    "srnn_mnist": srnn_mnist,
    "vrnn_mnist": vrnn_mnist,
    "svg_mnist": svg_mnist,
}
