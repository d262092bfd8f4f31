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
Trains under the MPD/MSD GAN recipe (train/vocoder.py) or — the paper's
actual pairing — MPD + the multi-resolution spectrogram discriminator
implemented at the bottom of this module
(create_gan_state(discriminators=("mpd", "mrd"))).
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


# ---------------------------------------------------------------------------
# Multi-resolution spectrogram discriminator (MRD)
#
# The GAN pairing from UnivNet (Jang et al. 2021, arXiv:2106.07889) that the
# Vocos recipe trains against (MPD + MRD).  Each sub-discriminator runs a
# small 2D conv stack over the linear magnitude spectrogram of one STFT
# resolution; three resolutions cover short/medium/long analysis windows.
# Returns the same (real_logits, fake_logits, real_fmaps, fake_fmaps) quad
# as models/hifigan.py::mpd/msd so the trainer's losses apply unchanged.
# ---------------------------------------------------------------------------

# (n_fft, hop_length, win_length) per sub-discriminator (UnivNet table 2)
MRD_RESOLUTIONS = ((1024, 120, 600), (2048, 240, 1200), (512, 50, 240))

# (kh, kw, in, out, stride_w): time-kernel 3, freq-kernel 9, stride on the
# frequency axis (F = n_fft/2+1 is the long axis at speech segment sizes)
_MRD_SPEC = (
    (3, 9, 1, 32, 1),
    (3, 9, 32, 32, 2),
    (3, 9, 32, 32, 2),
    (3, 9, 32, 32, 2),
    (3, 3, 32, 32, 1),
)


def init_discriminator_r(key):
    keys = jax.random.split(key, len(_MRD_SPEC) + 1)
    convs = []
    for k, (kh, kw, ic, oc, _) in zip(keys, _MRD_SPEC):
        convs.append({
            "weight": nn.kaiming_uniform(k, (kh, kw, ic, oc), ic * kh * kw),
            "bias": jnp.zeros((oc,)),
        })
    conv_post = {
        "weight": nn.kaiming_uniform(keys[-1], (3, 3, 32, 1), 32 * 9),
        "bias": jnp.zeros((1,)),
    }
    return {"convs": convs, "conv_post": conv_post}


def init_mrd(key):
    keys = jax.random.split(key, len(MRD_RESOLUTIONS))
    return {"discriminators": [init_discriminator_r(k) for k in keys]}


def _conv2d(p, x, stride=(1, 1), padding=((0, 0), (0, 0))):
    out = jax.lax.conv_general_dilated(
        x, p["weight"], window_strides=stride, padding=padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return out + p["bias"]


def discriminator_r(params, audio: jnp.ndarray, resolution):
    """(B, T) audio -> (logits, fmaps) on one STFT resolution's magnitude."""
    from matcha_tts_tpu.ops.stft import stft_magnitude_and_phase

    n_fft, hop, win = resolution
    # magnitude_eps bounds d|z|/dz ~ 1/|z| on near-silent bins: without
    # it, GAN training on silence-heavy audio amplifies gradients ~1e8
    # through the sqrt and diverges to NaN (measured round 4: Vocos+MRD
    # died at step ~1100-1500 with and without global-norm clipping;
    # the UnivNet/Vocos reference MRD uses the same 1e-9 stabilizer)
    mag, _ = stft_magnitude_and_phase(audio.astype(jnp.float32), n_fft, hop,
                                      win, center=True, magnitude_eps=1e-9)
    x = jnp.moveaxis(mag, -2, -1)[..., None]  # (B, n_frames, n_freqs, 1)
    fmap = []
    for conv, (kh, kw, _, _, sw) in zip(params["convs"], _MRD_SPEC):
        x = _conv2d(conv, x, stride=(1, sw),
                    padding=((kh // 2, kh // 2), (kw // 2, kw // 2)))
        x = jax.nn.leaky_relu(x, 0.1)
        fmap.append(x)
    x = _conv2d(params["conv_post"], x, padding=((1, 1), (1, 1)))
    fmap.append(x)
    return x.reshape(x.shape[0], -1), fmap


def mrd(params, y: jnp.ndarray, y_hat: jnp.ndarray):
    """Same output quad as hifigan.mpd/msd (real/fake logits + fmaps)."""
    outs_r, outs_g, fmaps_r, fmaps_g = [], [], [], []
    for d, res in zip(params["discriminators"], MRD_RESOLUTIONS):
        lr, fr = discriminator_r(d, y, res)
        lg, fg = discriminator_r(d, y_hat, res)
        outs_r.append(lr)
        outs_g.append(lg)
        fmaps_r.append(fr)
        fmaps_g.append(fg)
    return outs_r, outs_g, fmaps_r, fmaps_g
