"""Dataclass configs + the reference's architecture DSL.

The reference configures everything through argparse namespaces frozen into
checkpoints (main_rfn.py:50-197). Here the source of truth is frozen
dataclasses (hashable -> usable as jit static args), with parsers for the
reference's hyphen-separated structure DSL ("32-32-pool") so the CLI surface
stays compatible (reference main_rfn.py:38-47,131-142).
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass
from typing import Any, Tuple

# --------------------------------------------------------------------------
# Structure DSL
# --------------------------------------------------------------------------

Block = Tuple[Any, ...]  # ints and keyword strings ('pool','conv','squeeze',...)


def parse_block(spec: str) -> Block:
    """"32-32-pool" -> (32, 32, 'pool'). Reference main_rfn.py:38-47."""
    out = []
    for tok in spec.split("-"):
        out.append(int(tok) if tok.isdigit() else tok)
    return tuple(out)


def parse_structure(specs) -> Tuple[Block, ...]:
    """List of per-block DSL strings -> tuple of blocks."""
    if isinstance(specs, str):
        specs = specs.split()
    blocks = []
    for s in specs:
        blocks.append(parse_block(s) if isinstance(s, str) else tuple(s))
    return tuple(blocks)


def _tuplify(v):
    if isinstance(v, list):
        return tuple(_tuplify(x) for x in v)
    return v


def config_from_dict(cls, d: dict):
    """Rebuild a (possibly nested) frozen config from its asdict() JSON form."""
    kwargs = {}
    for f in dataclasses.fields(cls):
        if f.name not in d:
            continue
        v = d[f.name]
        if f.name == "glow" and isinstance(v, dict):
            v = config_from_dict(GlowConfig, v)
        else:
            v = _tuplify(v)
        kwargs[f.name] = v
    return cls(**kwargs)


# --------------------------------------------------------------------------
# Flow (Glow) config — reference main_rfn.py:162-181
# --------------------------------------------------------------------------


@dataclass(frozen=True)
class GlowConfig:
    L: int = 3
    K: int = 10
    n_bits: int = 8
    learn_prior: bool = True
    lu_decomposed: bool = True
    n_units_affine: int = 256
    n_units_prior: int = 512
    non_lin: str = "relu"  # {relu, leakyrelu}
    make_conditional: bool = True
    flow_norm: str = "actnorm"  # {actnorm, batchnorm}
    base_norm: str = "actnorm"
    batchnorm_momentum: float = 0.0
    clamp_type: str = "realnvp"  # {glow, realnvp, softclamp, none}
    split2d_act: str = "softplus"  # {softplus, exp}
    # coupling-net conv implementation: 'auto' (== conv, the measured
    # best), 'conv' (XLA convolution), 'fused' (Pallas whole-GlowStep
    # kernel — wins ~2x on deep scales at large batched rows, loses
    # end-to-end in the scanned train/sample paths; see
    # flows/glow.py:_fused_eligible for the measurements). 'im2col' was
    # REMOVED as a selectable path in round 3 — it lost to XLA conv at
    # every scale (docs/PERF.md); flows.modules.conv2d_im2col remains as
    # an internal utility for microbenches and kernel validation.
    coupling_impl: str = "auto"
    # compute dtype for the coupling NN convs only ({None, 'bfloat16'}):
    # halves the HBM bytes of the flow's widest tensors (the 256-unit
    # hidden activations) while all logdet/affine math stays f32 — the
    # bijection remains exactly invertible (the bf16 net is deterministic).
    # Measured on v5e: scripts/bench_prodstep.py / docs/PERF.md.
    coupling_dtype: str | None = None
    # norm inside the coupling NN's convs (reference Conv2dNorm default);
    # 'actnorm' matches the reference. Used by perf experiments to bound
    # the elementwise-epilogue cost of the coupling norm.
    coupling_norm: str = "actnorm"
    # weight-fold family (exact algebraic reparametrizations at apply
    # time, identical param trees — equivalence tests in tests/test_flows):
    # coupling actnorm -> conv kernels, Conv2dZeros gain -> kernel, and
    # the step actnorm -> the 1x1 matmul (both directions). Default ON;
    # the switch exists for in-process A/B measurement and debugging.
    fold_weights: bool = True
    # packed x-stream layout through each scale's K GlowSteps. The flow's
    # x tensors have few channels (C=4..64 at 64x64/L=5); in NHWC the TPU
    # tiles the last two dims to (8, 128), so C=4 pads the lane dim 32x
    # and every x round-trip moves ~32x its logical bytes. Two packings
    # remove that padding for every op between the coupling convs (the
    # 1x1 matmul, the affine transform, channel splits/concats); the
    # coupling convs themselves still run NHWC (one fused transpose at
    # each conv boundary). Exact same math — equivalence tests in
    # tests/test_flows.py; measured A/B in docs/PERF.md.
    #   False / ""  : NHWC throughout (default)
    #   "lanes"     : [B, H, C*W] channel-major lane packing; the 1x1
    #                 invertible conv becomes ONE block-diagonal
    #                 [C*W, C*W] MXU matmul (kron(W, I)); channel
    #                 split/concat are contiguous lane slices
    #   "sublane"   : [B, C, H*W] channel-sublane packing (True means
    #                 this); the 1x1 contracts over sublanes
    # Requires flow_norm='actnorm' + fold_weights; DDI and the fused
    # Pallas kernel always run unpacked.
    packed_layout: object = False
    # whole-scale chain kernel (ops/pallas/glowchain.py): run an entire
    # K-step GlowStep chain of a small-spatial scale (H*W <= 256) in ONE
    # pallas_call, x carried in VMEM across the K grid steps. Targets the
    # measured per-kernel launch floor (~2.4 us/op) that dominates the
    # deep scales' time (docs/PERF.md round 3e).
    #   'off'    : never (default until measured)
    #   'sample' : the sampling/eval g-pass only (reverse, no grad)
    #   'all'    : f and g (f's backward is a jnp-remat VJP)
    chain_impl: str = "off"
    # dual-stream scale executor for the f (density) direction: carry
    # (z1, z2) as separate arrays through a scale's K GlowSteps instead of
    # one concatenated x. Removes, per step: the [*, C] output concat, the
    # big [z1 | condition] coupling-net input concat (the conv is split
    # into conv(z1, W_z) + conv(cond, W_c) — the condition is K-invariant
    # but its concat copy was paid every step), and the strided 'cross'
    # output gathers (the net2 kernel is pre-permuted so shift/scale are
    # contiguous slices, same trick as the fused kernel). The K per-step
    # coupling logdet reductions merge into ONE per-scale reduction.
    # Exact same math up to float reassociation — equivalence + gradient
    # tests in tests/test_flows.py::test_dual_stream_*; measured A/B in
    # docs/PERF.md round 5 ("dual-stream scale executor"): 2.8% SLOWER
    # than the module path on the prod train step (XLA already fuses the
    # deleted concats; two half-width einsums lose to one [C,C] matmul),
    # so the default stays False.
    # Requires actnorm flow/coupling norms + fold_weights, NHWC (no packed
    # layout), f32 coupling; DDI/init always run the module path.
    # Precedence: in the f direction dual_stream takes priority over
    # chain_impl='all' (the chain kernel still serves g) — don't combine
    # them in an A/B expecting to measure the f-direction chain kernel.
    dual_stream: bool = False


def packed_mode(glow_cfg) -> str:
    """Normalize GlowConfig.packed_layout to '' | 'lanes' | 'sublane'."""
    v = getattr(glow_cfg, "packed_layout", False)
    if not v:
        return ""
    if v is True:
        return "sublane"
    if v not in ("lanes", "sublane"):
        raise ValueError(f"packed_layout must be False/'lanes'/'sublane', got {v!r}")
    return v


# --------------------------------------------------------------------------
# RFN — reference main_rfn.py:115-193
# --------------------------------------------------------------------------

_DEFAULT_EXTRACTOR = (
    (8, 8, "pool", 16),
    (16, 16, "pool", 32),
    (32, 32, "pool", 64),
    (64, "pool", 128),
    (128, "pool", 256),
)
_DEFAULT_UPSCALER = (
    (256, 128),
    ("upsample", 128, 128),
    ("upsample", 64, 64),
    ("upsample", 32, 32),
    ("upsample", 16, 16),
)


@dataclass(frozen=True)
class RFNConfig:
    x_channels: int = 1
    image_size: int = 64
    h_dim: int = 256
    z_dim: int = 5
    a_dim: int = 200
    L: int = 5
    K: int = 15
    extractor_structure: Tuple[Block, ...] = _DEFAULT_EXTRACTOR
    upscaler_structure: Tuple[Block, ...] = _DEFAULT_UPSCALER
    prior_structure: Block = (256, 64)
    encoder_structure: Block = (256, 64)
    structure_scaler: int = 2
    norm_type: str = "none"  # prior/encoder nets
    norm_type_features: str = "batchnorm"  # extractor/upscaler
    # torch-style batchnorm running averages (reference model.eval()):
    # stats live in the 'batch_stats' collection, EMA-updated by
    # Trainer.refresh_stats (out-of-scan), used when the model is built
    # with eval_norm=True. Off by default: batch-stat normalization
    # everywhere (documented TPU deviation).
    track_running_stats: bool = False
    skip_connection_flow: str = "with_skip"  # {without_skip, with_skip, only_skip}
    skip_connection_features: bool = True
    downscaler_tanh: bool = False
    upscaler_tanh: bool = False
    free_bits: float = -1.0
    enable_smoothing: bool = False
    res_q: bool = False
    D: int = 0  # number of latent overshoots (0 = off)
    overshot_w: float = 1.0
    temperature: float = 0.7
    glow: GlowConfig = GlowConfig(L=5, K=15)

    def __post_init__(self):
        # Keep flow depth consistent with the model's L/K knobs.
        if self.glow.L != self.L or self.glow.K != self.K:
            object.__setattr__(
                self, "glow", dataclasses.replace(self.glow, L=self.L, K=self.K)
            )
        assert len(self.extractor_structure) == self.L
        assert len(self.upscaler_structure) == self.L


# --------------------------------------------------------------------------
# SRNN / VRNN — reference main_srnn.py / main_vrnn.py
# --------------------------------------------------------------------------


@dataclass(frozen=True)
class SRNNConfig:
    x_channels: int = 1
    image_size: int = 64
    h_dim: int = 256
    z_dim: int = 32
    a_dim: int = 256
    loss_type: str = "bernoulli"  # {bernoulli, gaussian, mse, mol}
    dequantize: bool = True
    n_logistics: int = 5
    n_bits: int = 8
    preprocess_range: str = "1.0"
    enable_smoothing: bool = True
    res_q: bool = False
    D: int = 0  # num_shots
    overshot_w: float = 1.0
    norm_type: str = "batchnorm"
    # torch-style running averages (see RFNConfig.track_running_stats)
    track_running_stats: bool = False


@dataclass(frozen=True)
class VRNNConfig:
    x_channels: int = 1
    image_size: int = 64
    h_dim: int = 256
    z_dim: int = 32
    loss_type: str = "bernoulli"
    dequantize: bool = True
    n_logistics: int = 5
    n_bits: int = 8
    preprocess_range: str = "1.0"
    norm_type: str = "batchnorm"
    # torch-style running averages (see RFNConfig.track_running_stats)
    track_running_stats: bool = False


@dataclass(frozen=True)
class SVGConfig:
    x_channels: int = 1
    image_size: int = 64
    z_dim: int = 10
    c_features: int = 128  # g_dim in edenton/svg
    h_dim: int = 256  # rnn_size
    posterior_rnn_layers: int = 1
    predictor_rnn_layers: int = 2
    prior_rnn_layers: int = 1
    loss_type: str = "mse"
    variance: float = 1.0
    norm_type: str = "batchnorm"
    # torch-style running averages (see RFNConfig.track_running_stats)
    track_running_stats: bool = False


# --------------------------------------------------------------------------
# Training — reference main_rfn.py:75-112 + trainer.py
# --------------------------------------------------------------------------


@dataclass(frozen=True)
class TrainConfig:
    batch_size: int = 32
    n_frames: int = 10
    choose_data: str = "mnist"  # {mnist, kth, bair, shapes}
    digit_size: int = 32
    step_length: int = 4
    num_digits: int = 2
    n_bits: int = 8
    preprocess_range: str = "0.5"  # {0.5, 1.0, none, minmax}
    preprocess_scale: int = 255
    learning_rate: float = 1e-4
    scheduler_type: str = "plateau"  # {plateau, linear}
    patience_lr: int = 10_000_000
    factor_lr: float = 0.9999
    min_lr: float = 5e-5
    patience_es: int = 50_000_000
    beta_max: float = 1.0
    beta_min: float = 1e-7
    beta_steps: int = 12_000
    n_epochs: int = 100
    steps_per_epoch: int = 1875  # "epoch" for on-the-fly generated data
    n_predictions: int = 7
    n_conditions: int = 3
    # save a full checkpoint every N epochs (always on the final/stop
    # epoch). A 36M-param orbax save costs ~17s through the remote link.
    checkpoint_every: int = 1
    n_predictions_plot: int = 6
    seed: int = 0
    grad_clip: float = 0.0  # optax clip_by_global_norm; 0 = off (reference
    # uses plain Adam, but Glow scale params can spike on sparse video data)
    remat: bool = True  # rematerialize the per-timestep scan body
    # linear scheduler constants (reference RFN/trainer.py:190-204)
    linear_start_step: int = 100_000
    linear_num_steps: int = 150_000
