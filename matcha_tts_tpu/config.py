"""Typed configuration for the whole framework.

The reference scatters hyperparameters across three duplicated blocks
(`/root/reference/main.py:63-79`, `/root/reference/train_standalone.py:772-805`,
`/root/reference/hifigan/config.py:1-28`).  Here there is exactly one typed
config tree, with the Matcha-TTS LJSpeech v1 preset as the default; it is
hashable so it can be a static argument to `jax.jit`.
"""

from __future__ import annotations

import dataclasses
import json
from typing import Any, Optional, Tuple


@dataclasses.dataclass(frozen=True)
class AudioConfig:
    """Log-mel feature extraction (reference: train_standalone.py:164-201)."""

    sample_rate: int = 22050
    n_fft: int = 1024
    win_length: int = 1024
    hop_length: int = 256
    n_mels: int = 80
    f_min: float = 0.0
    f_max: float = 8000.0
    # Global dataset statistics used for mel normalization
    # (reference: train_standalone.py:802-805 — LJSpeech).
    mel_mean: float = -5.536622
    mel_std: float = 2.116101


@dataclasses.dataclass(frozen=True)
class EncoderConfig:
    """Text encoder (reference: main.py:63-66, model.py:452-535)."""

    encoder_type: str = "RoPE Encoder"
    n_feats: int = 80
    n_channels: int = 192
    filter_channels: int = 768
    n_heads: int = 2
    n_layers: int = 6
    kernel_size: int = 3
    p_dropout: float = 0.1
    prenet: bool = True


@dataclasses.dataclass(frozen=True)
class DurationPredictorConfig:
    """Duration predictor (reference: main.py:77-79, model.py:210-235)."""

    filter_channels_dp: int = 256
    kernel_size: int = 3
    p_dropout: float = 0.1


@dataclasses.dataclass(frozen=True)
class DecoderConfig:
    """CFM U-Net estimator (reference: main.py:67-75, model.py:834-962)."""

    channels: Tuple[int, ...] = (256, 256)
    dropout: float = 0.05
    attention_head_dim: int = 64
    n_blocks: int = 1
    num_mid_blocks: int = 2
    num_heads: int = 2
    act_fn: str = "snakebeta"
    # Legacy switch: force the fused Pallas conv+GroupNorm+Mish Block1D
    # kernel everywhere shapes allow (ops/pallas/block1d.py).  Superseded
    # by block1d_impl="auto"; use_pallas=True still forces the kernel.
    use_pallas: bool = False
    # Block1D implementation: "xla", "pallas" (force the fused kernels:
    # whole-resnet where ops/pallas/resnet1d.py's gate passes, else the
    # fused Block1D pair), or "auto".  "auto" resolves to XLA at every
    # batch — measured 2026-08-17 (benchmarks/estimator_bench.py, v5e
    # bf16, batch 32): XLA 8.48-8.77 ms/estimator pass vs fused resnet
    # 9.40 and fused Block1D pair 9.71; batch 8 is a tie.  The forced
    # mode remains for fp32-exact GroupNorm stats and training remat.
    block1d_impl: str = "auto"
    # Transformer-block attention: "xla" (einsum + materialized scores),
    # "flash" (Pallas online-softmax kernel, ops/pallas/attention.py),
    # "vmem" (whole-row-softmax Pallas kernel, ops/pallas/attn_vmem.py), or
    # "auto" (currently == "xla" at every shape).  Measured
    # (benchmarks/attn_bench.py / estimator_bench.py, v5e bf16):
    # flash wins standalone (0.70 -> 0.48 ms per T=768 block) but LOSES in
    # context (estimator pass +0.5 ms) — online-softmax overhead plus a
    # fusion boundary.  vmem keeps scores in VMEM with a plain softmax and
    # matches the XLA path bit-for-bit at padded rows too, but measures a
    # TIE within run noise at batch 32 (8.50-8.83 vs 8.48-8.77 ms
    # estimator pass, 2026-08-17) — so the simpler XLA path stays default.
    attention_impl: str = "xla"
    # SnakeBeta implementation: "xla" (autodiff through sin^2) or
    # "fused_vjp" (identity rewrite sin^2(ax) = (1-cos 2ax)/2 with a
    # custom VJP that keeps every transcendental in the forward pass —
    # the backward is pure multiply-adds over a saved sin(2ax)).  Same
    # math to fp rounding; a training-throughput experiment, see
    # docs/RESULTS.md.
    snake_impl: str = "xla"

    def __post_init__(self):
        for field, valid in (("block1d_impl", ("xla", "pallas", "auto")),
                             ("snake_impl", ("xla", "fused_vjp")),
                             ("attention_impl",
                              ("xla", "flash", "vmem", "auto"))):
            v = getattr(self, field)
            if v not in valid:
                raise ValueError(f"{field}={v!r} is not one of {valid}")


@dataclasses.dataclass(frozen=True)
class CFMConfig:
    """Conditional flow matching (reference: main.py:76, model.py:1063-1109)."""

    solver: str = "euler"  # "euler" | "midpoint"
    sigma_min: float = 1e-4


@dataclasses.dataclass(frozen=True)
class HiFiGANConfig:
    """HiFi-GAN v1 generator (reference: hifigan/config.py:1-28)."""

    resblock: str = "1"
    upsample_rates: Tuple[int, ...] = (8, 8, 2, 2)
    upsample_kernel_sizes: Tuple[int, ...] = (16, 16, 4, 4)
    upsample_initial_channel: int = 512
    resblock_kernel_sizes: Tuple[int, ...] = (3, 7, 11)
    resblock_dilation_sizes: Tuple[Tuple[int, ...], ...] = (
        (1, 3, 5),
        (1, 3, 5),
        (1, 3, 5),
    )
    num_mels: int = 80
    sampling_rate: int = 22050
    # Fuse each level's 3-branch MRF resblock stack into one Pallas kernel
    # where shapes allow (ops/pallas/mrf.py); XLA path otherwise.
    use_pallas: bool = False
    # MRF implementation: "xla" (lax.conv emitter), "tap" (tap-unrolled
    # Pallas kernel, ops/pallas/mrf.py), "packed" (time-in-lanes
    # block-Toeplitz Pallas kernel, ops/pallas/mrf_packed.py), "int8"
    # (packed kernel with int8 MXU dots for the 18-conv chains: per-
    # output-channel weight scales, dynamic per-(conv, tile) activation
    # scales — OPT-IN quantized inference, ~1.5x MXU headroom measured
    # by benchmarks/int8_probe.py; never selected by "auto"), or "auto"
    # (packed where its shape gate passes, XLA otherwise).  use_pallas=True
    # with mrf_kernel="xla" keeps its legacy meaning of "tap".
    # Default "auto": measured on v5e, packed halves the deep-level time
    # (C=32: 10.3 -> 5.1 ms, C=64: 7.4 -> 4.8 ms per 768-frame pass).
    # NB: legacy configs that set only use_pallas=True (pre-"auto" default)
    # now resolve to "auto", which selects the strictly faster packed
    # kernels; set mrf_kernel="tap" explicitly to pin the old behavior.
    mrf_kernel: str = "auto"
    # mrf_kernel="int8" only: restrict quantization to these upsample-level
    # indices (None = every level the int8 kernels cover — levels 1 [C=128]
    # and 2 [C=64 fused-up] at the v1 config; level 3 keeps the exact bf16
    # kernel by measurement, level 0 [C=256] is XLA in every mode).  A
    # de-listed level runs the exact packed kernel instead.  This is the
    # attribution surface for the measured int8 WER gap (VERDICT r4 #5):
    # sweep {()}, {(1,)}, {(2,)}, None through the quality judge.
    int8_levels: Optional[Tuple[int, ...]] = None

    def __post_init__(self):
        valid = ("xla", "tap", "packed", "int8", "auto")
        if self.mrf_kernel not in valid:
            raise ValueError(
                f"mrf_kernel={self.mrf_kernel!r} is not one of {valid}")
        if self.int8_levels is not None:
            if self.mrf_kernel != "int8":
                raise ValueError("int8_levels requires mrf_kernel='int8'")
            bad = [i for i in self.int8_levels
                   if not 0 <= i < len(self.upsample_rates)]
            if bad:
                raise ValueError(f"int8_levels out of range: {bad}")

    @property
    def total_upsample(self) -> int:
        out = 1
        for u in self.upsample_rates:
            out *= u
        return out


@dataclasses.dataclass(frozen=True)
class VocosConfig:
    """Frame-rate iSTFT vocoder (beyond-parity vocoder family).

    A ConvNeXt backbone over mel frames followed by an iSTFT head that
    predicts STFT magnitude + phase — the Vocos architecture (Siuzdak,
    2023, arXiv:2306.00814), chosen here because it is the TPU-shaped
    answer to HiFi-GAN: every op is a wide (dim/intermediate_dim) matmul
    at FRAME rate (~86 Hz) instead of dilated convs at WAV rate (22 kHz),
    cutting vocoder FLOPs ~23x (20.7 vs 472.8 GF per 768-frame batch-1
    pass) while keeping the MXU dense.  Drop-in for HiFiGANConfig across
    the Synthesizer / GAN trainer / denoiser (same `num_mels`,
    `total_upsample`, `sampling_rate` surface).
    """

    num_mels: int = 80
    dim: int = 512
    intermediate_dim: int = 1536
    num_layers: int = 8
    kernel_size: int = 7  # depthwise conv width (ConvNeXt)
    n_fft: int = 1024
    hop_length: int = 256
    sampling_rate: int = 22050
    # exp(magnitude) is clipped to this ceiling (numerical guard on the
    # untrained / early-training head; trained magnitudes sit far below)
    mag_clip: float = 1e2

    @property
    def total_upsample(self) -> int:
        # frames -> samples ratio, the surface the inference layer uses
        return self.hop_length


@dataclasses.dataclass(frozen=True)
class MatchaConfig:
    """Top-level acoustic model config (reference: model.py:1173-1232)."""

    n_vocab: int = 178
    n_spks: int = 1
    spk_emb_dim: int = 64
    encoder: EncoderConfig = dataclasses.field(default_factory=EncoderConfig)
    duration_predictor: DurationPredictorConfig = dataclasses.field(
        default_factory=DurationPredictorConfig
    )
    decoder: DecoderConfig = dataclasses.field(default_factory=DecoderConfig)
    cfm: CFMConfig = dataclasses.field(default_factory=CFMConfig)
    audio: AudioConfig = dataclasses.field(default_factory=AudioConfig)

    @property
    def decoder_in_channels(self) -> int:
        # noisy mel + conditioning mel (+ speaker embedding when multi-speaker)
        # reference: model.py:1207-1211
        base = 2 * self.encoder.n_feats
        if self.n_spks > 1:
            base += self.spk_emb_dim
        return base

    @property
    def num_downsamples(self) -> int:
        # frames must be padded to a multiple of 2**num_downsamples
        # (reference fix_len_compatibility, model.py:49-55)
        return len(self.decoder.channels)


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    """Training orchestration (reference: train_standalone.py:757-886)."""

    batch_size: int = 64  # per-chip, like the reference's per-GPU batch
    learning_rate: float = 1e-4
    max_epochs: int = 3000
    grad_clip_norm: float = 5.0
    prior_loss: bool = True
    seed: int = 42
    # bf16 compute on TPU stands in for the reference's "16-mixed" AMP
    mixed_precision: bool = True
    # static-shape bucketing replaces the reference's dynamic max-length pad
    text_buckets: Tuple[int, ...] = (64, 128, 192, 256, 384, 512)
    frame_buckets: Tuple[int, ...] = (128, 256, 384, 512, 768, 1024, 1536, 2048)
    log_every_n_steps: int = 10
    ckpt_every_n_steps: int = 2000
    ckpt_keep: int = 3


def config_to_dict(cfg: Any) -> Any:
    if dataclasses.is_dataclass(cfg):
        return {f.name: config_to_dict(getattr(cfg, f.name)) for f in dataclasses.fields(cfg)}
    if isinstance(cfg, tuple):
        return [config_to_dict(v) for v in cfg]
    return cfg


def config_to_json(cfg: Any) -> str:
    return json.dumps(config_to_dict(cfg), indent=2, sort_keys=True)


def _tuplify(v: Any) -> Any:
    if isinstance(v, list):
        return tuple(_tuplify(x) for x in v)
    return v


def config_from_dict(cls, d: dict):
    """Inverse of `config_to_dict`.  Nested configs are detected through
    their default factories (annotations are strings under
    `from __future__ import annotations`, so `f.type` is not a class)."""
    kwargs = {}
    for f in dataclasses.fields(cls):
        if f.name not in d:
            continue
        v = d[f.name]
        if isinstance(v, dict) and f.default_factory is not dataclasses.MISSING:
            sub_default = f.default_factory()
            if dataclasses.is_dataclass(sub_default):
                kwargs[f.name] = config_from_dict(type(sub_default), v)
                continue
        kwargs[f.name] = _tuplify(v)
    return cls(**kwargs)
