"""Vocos: frame-rate ConvNeXt vocoder with an iSTFT head.

Beyond-parity vocoder family (the reference ships only HiFi-GAN V1,
/root/reference/hifigan/models.py:14-206).  Architecture follows Vocos
(Siuzdak 2023, arXiv:2306.00814): an embedding conv, N ConvNeXt blocks
(depthwise conv -> LayerNorm -> pointwise MLP with GELU -> layer scale ->
residual), a final LayerNorm, and a linear head predicting per-frame STFT
magnitude and phase which an inverse STFT turns into audio.

Why it's the TPU-shaped vocoder: HiFi-GAN spends 473 GFLOPs per 768-frame
utterance in narrow (C=32..512) convs at WAV rate; this backbone spends
~21 GFLOPs in 512/1536-wide matmuls at FRAME rate — ideal MXU tiles, no
upsampling pyramid, and the iSTFT is the already-fast reshape overlap-add
(ops/stft.py::istft, 24x faster than scatter-add OLA on TPU).

Interface contract (shared with models/hifigan.py::generator):
  generate(params, mel, cfg): (B, T, num_mels) -> (B, T * hop) float audio.
Trains under the same MPD/MSD GAN recipe (train/vocoder.py) — Vocos'
paper pairing is MPD+MRD; MSD substitutes for MRD here, documented
deviation.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from matcha_tts_tpu.config import VocosConfig
from matcha_tts_tpu.models import nn
from matcha_tts_tpu.ops.stft import istft


def _trunc_normal(key, shape, std: float = 0.02, dtype=jnp.float32):
    """torch.nn.init.trunc_normal_(std=0.02) (Vocos' _init_weights)."""
    return jax.random.truncated_normal(key, -2.0, 2.0, shape, dtype) * std


def init_vocos(key, cfg: VocosConfig):
    """Parameter tree:

    embed:      conv k=kernel_size, num_mels -> dim   (trunc-normal 0.02)
    norm_pre:   LayerNorm(dim)
    blocks[i]:  dwconv (k, 1, dim), norm, pw1 (dim, inter), pw2 (inter, dim),
                gamma (dim,) layer scale, init 1/num_layers
    norm_post:  LayerNorm(dim)
    head:       linear dim -> n_fft + 2  (magnitude | phase halves)
    """
    k_embed, k_head, *k_blocks = jax.random.split(key, 2 + cfg.num_layers)
    d, inter, kw = cfg.dim, cfg.intermediate_dim, cfg.kernel_size
    params = {
        "embed": {
            "weight": _trunc_normal(k_embed, (kw, cfg.num_mels, d)),
            "bias": jnp.zeros((d,), jnp.float32),
        },
        "norm_pre": nn.init_norm(d),
        "norm_post": nn.init_norm(d),
        "head": {
            "weight": _trunc_normal(k_head, (d, cfg.n_fft + 2)),
            "bias": jnp.zeros((cfg.n_fft + 2,), jnp.float32),
        },
        "blocks": [],
    }
    for kb in k_blocks:
        k1, k2, k3 = jax.random.split(kb, 3)
        params["blocks"].append({
            "dwconv": {
                "weight": _trunc_normal(k1, (kw, 1, d)),
                "bias": jnp.zeros((d,), jnp.float32),
            },
            "norm": nn.init_norm(d),
            "pw1": {
                "weight": _trunc_normal(k2, (d, inter)),
                "bias": jnp.zeros((inter,), jnp.float32),
            },
            "pw2": {
                "weight": _trunc_normal(k3, (inter, d)),
                "bias": jnp.zeros((d,), jnp.float32),
            },
            "gamma": jnp.full((d,), 1.0 / cfg.num_layers, jnp.float32),
        })
    return params


def backbone(params, mel: jnp.ndarray, cfg: VocosConfig) -> jnp.ndarray:
    """(B, T, num_mels) -> (B, T, dim) ConvNeXt features."""
    pad = cfg.kernel_size // 2
    x = nn.conv1d(params["embed"], mel, padding=pad)
    x = nn.layer_norm(params["norm_pre"], x, eps=1e-6)
    for blk in params["blocks"]:
        r = x
        x = nn.conv1d(blk["dwconv"], x, padding=pad, groups=cfg.dim)
        x = nn.layer_norm(blk["norm"], x, eps=1e-6)
        x = nn.linear(blk["pw1"], x)
        x = jax.nn.gelu(x, approximate=False)  # torch GELU default (erf)
        x = nn.linear(blk["pw2"], x)
        x = r + blk["gamma"].astype(x.dtype) * x
    return nn.layer_norm(params["norm_post"], x, eps=1e-6)


def spectral_head(params, features: jnp.ndarray, cfg: VocosConfig):
    """(B, T, dim) -> magnitude, phase each (B, n_freqs, T) in fp32.

    Magnitude is exp-parameterized and clipped at cfg.mag_clip; phase is
    the raw head output (consumed via cos/sin, so unbounded is fine).
    Always fp32: the head feeds complex FFT math and costs <0.5% of the
    backbone.
    """
    h = nn.linear(params["head"], features).astype(jnp.float32)
    n_freqs = cfg.n_fft // 2 + 1
    mag = jnp.exp(jnp.clip(h[..., :n_freqs], None, jnp.log(cfg.mag_clip)))
    phase = h[..., n_freqs:]
    # istft wants (..., n_freqs, n_frames)
    return jnp.moveaxis(mag, -1, -2), jnp.moveaxis(phase, -1, -2)


def generate(params, mel: jnp.ndarray, cfg: VocosConfig) -> jnp.ndarray:
    """(B, T, num_mels) -> (B, T * hop_length) audio.

    torch.istft over T frames (center=True) yields hop*(T-1) samples; to
    keep the framework-wide contract `samples = frames * total_upsample`
    (what the Synthesizer's packed transfer and y_length arithmetic
    assume) the last spectral frame is edge-replicated before the iSTFT,
    giving exactly hop*T samples.
    """
    feats = backbone(params, mel, cfg)
    mag, phase = spectral_head(params, feats, cfg)
    mag = jnp.concatenate([mag, mag[..., -1:]], axis=-1)
    phase = jnp.concatenate([phase, phase[..., -1:]], axis=-1)
    return istft(mag, phase, cfg.n_fft, cfg.hop_length, cfg.n_fft)
