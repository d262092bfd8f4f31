"""HiFi-GAN v1: generator, discriminators, GAN losses, TPU-native.

Rebuilt from the vendored reference (/root/reference/hifigan/models.py):
* Generator (models.py:148-197): conv_pre -> 4x [LeakyReLU -> transposed
  conv upsample -> 3-kernel MRF resblock average] -> LeakyReLU ->
  conv_post -> tanh, total x256 upsampling (= hop length).
* ResBlock1 (models.py:14-103): 3 x [LReLU -> dilated conv -> LReLU ->
  conv] residual chains; ResBlock2 (models.py:106-141): 2 dilated convs.
* MPD / MSD discriminators + feature/LS-GAN losses (models.py:209-368) —
  defined (and trainable) for fine-tuning parity; the reference defines
  but never trains them.

Weight-norm is *folded* at init/conversion time (g * v / ||v||), matching
the reference's `remove_weight_norm()` inference path (models.py:199-206,
main.py:149).  Activations are (B, T, C); audio is (B, T).
"""

from __future__ import annotations

from typing import List

import jax
import jax.numpy as jnp
import numpy as np

from matcha_tts_tpu.config import HiFiGANConfig
from matcha_tts_tpu.models import nn

LRELU_SLOPE = 0.1


def _lrelu(x, slope=LRELU_SLOPE):
    return jax.nn.leaky_relu(x, slope)


def _get_padding(kernel_size: int, dilation: int = 1) -> int:
    return (kernel_size * dilation - dilation) // 2


def _init_normal_conv(key, in_ch, out_ch, width, std=0.01):
    """HiFi-GAN's init_weights: weights ~ N(0, 0.01), zero bias
    (hifigan/xutils.py:25-28 + Conv default zero-mean bias folded)."""
    kw, kb = jax.random.split(key)
    return {
        "weight": jax.random.normal(kw, (width, in_ch, out_ch)) * std,
        "bias": jnp.zeros((out_ch,)),
    }


# ---------------------------------------------------------------------------
# MRF resblocks
# ---------------------------------------------------------------------------


def init_resblock1(key, channels: int, kernel_size: int, dilations=(1, 3, 5)):
    keys = jax.random.split(key, 2 * len(dilations))
    return {
        "convs1": [
            _init_normal_conv(keys[i], channels, channels, kernel_size)
            for i in range(len(dilations))
        ],
        "convs2": [
            _init_normal_conv(keys[len(dilations) + i], channels, channels, kernel_size)
            for i in range(len(dilations))
        ],
    }


def resblock1(params, x, kernel_size: int, dilations=(1, 3, 5)):
    for c1, c2, d in zip(params["convs1"], params["convs2"], dilations):
        xt = _lrelu(x)
        xt = nn.conv1d(c1, xt, padding=_get_padding(kernel_size, d), dilation=d)
        xt = _lrelu(xt)
        xt = nn.conv1d(c2, xt, padding=_get_padding(kernel_size, 1))
        x = xt + x
    return x


def init_resblock2(key, channels: int, kernel_size: int, dilations=(1, 3)):
    keys = jax.random.split(key, len(dilations))
    return {
        "convs": [
            _init_normal_conv(keys[i], channels, channels, kernel_size)
            for i in range(len(dilations))
        ]
    }


def resblock2(params, x, kernel_size: int, dilations=(1, 3)):
    for c, d in zip(params["convs"], dilations):
        xt = _lrelu(x)
        xt = nn.conv1d(c, xt, padding=_get_padding(kernel_size, d), dilation=d)
        x = xt + x
    return x


# ---------------------------------------------------------------------------
# Generator
# ---------------------------------------------------------------------------


def _mrf_mode(cfg: HiFiGANConfig) -> str:
    mode = getattr(cfg, "mrf_kernel", "xla")
    if mode == "xla" and cfg.use_pallas:
        return "tap"  # legacy flag spelling
    return mode


def _mrf_fusable(cfg: HiFiGANConfig, t: int, c: int, dtype) -> str:
    """Pick the MRF implementation for this level: "packed", "tap", "xla"."""
    mode = _mrf_mode(cfg)
    if mode == "xla" or cfg.resblock != "1":
        return "xla"
    if any(tuple(d) != (1, 3, 5) for d in cfg.resblock_dilation_sizes):
        return "xla"
    if mode == "auto" and jax.default_backend() == "cpu":
        # Mosaic kernels need a TPU; tests/dryrun run on CPU.  Forced
        # "packed"/"tap" still dispatch here — the kernels themselves
        # switch to interpret mode on CPU (slow but correct) instead of
        # dying in Mosaic lowering.
        return "xla"
    if mode == "auto" and dtype != jnp.bfloat16:
        # fp32 kernels run HIGHEST-precision dots (a parity/precision
        # mode, ~3-6x the MXU passes): measured 3.4x SLOWER than XLA's
        # default-precision fp32 convs at batch 32.  auto picks them only
        # for the bf16 inference dtype; mrf_kernel="packed" still forces
        # the fp32 kernels for parity work.
        return "xla"
    if mode in ("packed", "int8", "auto"):
        from matcha_tts_tpu.ops.pallas.mrf_packed import mrf_packed_ok

        # the int8 chain uses the bf16 VMEM budget (int8 acts are smaller).
        # The wide C=256 int8 kernel exists (mrf_packed_ok(quant=True))
        # but measured a TIE vs XLA at batch 32 (20.97 vs 20.16 ms,
        # mrf_bench 2026-08-18): its 8.25 MB of resident weights force
        # tile=256 against a 64-row halo — 50% recomputed rows — which
        # consumes int8's MXU headroom.  C=256 therefore stays on XLA
        # (already ~98% of bf16 peak there) in every mode.
        if mrf_packed_ok(t, c, mode != "int8" and dtype == jnp.float32):
            return "int8" if mode == "int8" else "packed"
        if mode in ("packed", "int8"):
            return "xla"
    if mode in ("tap", "auto"):
        from matcha_tts_tpu.ops.pallas.mrf import mrf_pallas_ok

        if mode == "tap" and mrf_pallas_ok(t, c):
            return "tap"
    return "xla"




def init_generator(key, cfg: HiFiGANConfig):
    n_ups = len(cfg.upsample_rates)
    n_kernels = len(cfg.resblock_kernel_sizes)
    keys = iter(jax.random.split(key, 2 + n_ups + n_ups * n_kernels))

    params = {
        "conv_pre": nn.init_conv1d(next(keys), cfg.num_mels,
                                   cfg.upsample_initial_channel, 7),
        "ups": [],
        "resblocks": [],
    }
    for i, (u, k) in enumerate(zip(cfg.upsample_rates, cfg.upsample_kernel_sizes)):
        in_ch = cfg.upsample_initial_channel // (2**i)
        out_ch = cfg.upsample_initial_channel // (2 ** (i + 1))
        up = _init_normal_conv(next(keys), in_ch, out_ch, k)
        params["ups"].append(up)
        for kk, dd in zip(cfg.resblock_kernel_sizes, cfg.resblock_dilation_sizes):
            if cfg.resblock == "1":
                params["resblocks"].append(init_resblock1(next(keys), out_ch, kk, dd))
            else:
                params["resblocks"].append(init_resblock2(next(keys), out_ch, kk, dd))
    ch = cfg.upsample_initial_channel // (2 ** len(cfg.upsample_rates))
    params["conv_post"] = _init_normal_conv(next(keys), ch, 1, 7)
    return params


def _gate_int8_level(impl: str, cfg: HiFiGANConfig, level: int) -> str:
    """int8_levels attribution gate: a de-listed level drops from the
    quantized to the exact packed kernel (same shapes, same grid)."""
    if (impl == "int8" and cfg.int8_levels is not None
            and level not in cfg.int8_levels):
        return "packed"
    return impl


def generator(params, mel: jnp.ndarray, cfg: HiFiGANConfig) -> jnp.ndarray:
    """mel: (B, T, num_mels) -> audio (B, T * prod(upsample_rates)).

    Matches Generator.forward (hifigan/models.py:181-197) with weight norm
    folded.
    """
    x = nn.conv1d(params["conv_pre"], mel, padding=3)
    n_kernels = len(cfg.resblock_kernel_sizes)
    for i, (u, k) in enumerate(zip(cfg.upsample_rates, cfg.upsample_kernel_sizes)):
        level_blocks = [params["resblocks"][i * n_kernels + j]
                        for j in range(n_kernels)]
        out_ch = cfg.upsample_initial_channel // (2 ** (i + 1))
        t_out = x.shape[1] * u
        impl = _gate_int8_level(_mrf_fusable(cfg, t_out, out_ch, x.dtype),
                                cfg, i)
        if (impl in ("packed", "int8") and u == 2 and k == 4
                and out_ch * 2 == x.shape[2]):
            # Deepest two V1 levels: fuse LeakyReLU -> ConvTranspose -> MRF
            # into one kernel (hifigan/models.py:181-192), skipping the
            # wav-rate HBM round trip of the upsampled tensor.
            from matcha_tts_tpu.ops.pallas.mrf_packed import (
                mrf_packed_up, mrf_packed_up_ok, pack_packed_weights,
                pack_packed_weights_int8, pack_upsample_weights)

            if mrf_packed_up_ok(t_out, out_ch,
                                impl != "int8" and x.dtype == jnp.float32):
                dils = tuple(tuple(d) for d in cfg.resblock_dilation_sizes)
                wup, bup = pack_upsample_weights(params["ups"][i],
                                                 dtype=x.dtype)
                # measured per level at batch 32 (mrf_bench, v5e bf16):
                # int8 wins the C=64 fused level (43.5 -> 36.5 ms) but not
                # the C=32 one (37.6 -> 38.5) — its inflated block-Toeplitz
                # dots are VPU/quantize-bound, not MXU-bound.  int8 mode
                # keeps the exact bf16 kernel there: faster AND lossless.
                # (bf16 inputs only: at fp32 the exact fallback would be
                # the ~3.4x-slower HIGHEST-precision parity kernel, so
                # fp32 int8 configs quantize this level too.)
                if impl == "int8" and (out_ch >= 64
                                       or x.dtype != jnp.bfloat16):
                    w, b, ws = pack_packed_weights_int8(
                        level_blocks, tuple(cfg.resblock_kernel_sizes), dils)
                else:
                    w, b = pack_packed_weights(
                        level_blocks, tuple(cfg.resblock_kernel_sizes), dils,
                        dtype=x.dtype)
                    ws = None
                kpost = params["conv_post"]["weight"].shape[0]
                if (i == len(cfg.upsample_rates) - 1 and kpost == 7
                        and params["conv_post"]["weight"].shape[2] == 1):
                    # last level: also fold the generator tail
                    # LReLU(0.01) -> conv_post -> tanh into the kernel
                    # (hifigan/models.py:193-196) and return the wav
                    # directly from the packed second output.
                    from matcha_tts_tpu.ops.pallas.mrf_packed import (
                        pack_convpost_weights)

                    wpost, bpost, _ = pack_convpost_weights(
                        params["conv_post"], out_ch, dtype=x.dtype)
                    _, wavp = mrf_packed_up(
                        x, wup, bup, w, b,
                        kernel_sizes=tuple(cfg.resblock_kernel_sizes),
                        dilations=dils, wpost=wpost, bpost=bpost,
                        post_k=kpost, ws=ws)
                    bsz = wavp.shape[0]
                    return wavp.reshape(bsz, -1, out_ch)[..., 0]
                x = mrf_packed_up(x, wup, bup, w, b,
                                  kernel_sizes=tuple(cfg.resblock_kernel_sizes),
                                  dilations=dils, ws=ws)
                continue
        x = _lrelu(x)
        x = nn.conv_transpose1d(params["ups"][i], x, stride=u, padding=(k - u) // 2)
        impl = _gate_int8_level(
            _mrf_fusable(cfg, x.shape[1], x.shape[2], x.dtype), cfg, i)
        if impl in ("packed", "int8"):
            from matcha_tts_tpu.ops.pallas.mrf_packed import (
                mrf_packed, pack_packed_weights, pack_packed_weights_int8)

            dils = tuple(tuple(d) for d in cfg.resblock_dilation_sizes)
            if impl == "int8":
                w, b, ws = pack_packed_weights_int8(
                    level_blocks, tuple(cfg.resblock_kernel_sizes), dils)
            else:
                w, b = pack_packed_weights(level_blocks,
                                           tuple(cfg.resblock_kernel_sizes),
                                           dils, dtype=x.dtype)
                ws = None
            x = mrf_packed(x, w, b, ws,
                           kernel_sizes=tuple(cfg.resblock_kernel_sizes),
                           dilations=dils)
        elif impl == "tap":
            from matcha_tts_tpu.ops.pallas.mrf import mrf_fused, pack_mrf_weights

            w1, b1, w2, b2 = pack_mrf_weights(level_blocks,
                                              cfg.resblock_kernel_sizes)
            x = mrf_fused(x.astype(jnp.float32), w1, b1, w2, b2,
                          kernel_sizes=cfg.resblock_kernel_sizes).astype(x.dtype)
        else:
            xs = None
            for j in range(n_kernels):
                rb = level_blocks[j]
                kk = cfg.resblock_kernel_sizes[j]
                dd = cfg.resblock_dilation_sizes[j]
                y = (resblock1(rb, x, kk, dd) if cfg.resblock == "1"
                     else resblock2(rb, x, kk, dd))
                xs = y if xs is None else xs + y
            x = xs / n_kernels
    x = _lrelu(x, 0.01)  # final LReLU uses torch's default slope (models.py:193)
    x = nn.conv1d(params["conv_post"], x, padding=3)
    return jnp.tanh(x)[..., 0]


def quantization_report(params, mels: jnp.ndarray, cfg: HiFiGANConfig,
                        exact_kernel: str = "auto") -> dict:
    """Quality report for the opt-in int8 vocoder mode on THIS checkpoint.

    Runs the given mel batch (B, T, num_mels) through both the exact
    generator and the int8-quantized one and returns comparable metrics —
    run this before enabling `mrf_kernel="int8"` in production:

      {"snr_db":            wav-domain SNR of int8 vs exact,
       "max_abs_err":       worst-case sample error,
       "mel_l1":            L1 between log-mels of the two wavs (the
                            quantity HiFi-GAN's own training loss uses),
       "exact_kernel", "quantized_kernel": the configs compared}

    Rule of thumb: snr_db > 30 and mel_l1 < 0.02 are inaudible for
    typical checkpoints; quantization error is weight-dependent, so the
    report must be re-run per checkpoint.
    """
    import dataclasses

    from matcha_tts_tpu.ops.stft import log_mel_spectrogram

    exact_cfg = dataclasses.replace(cfg, mrf_kernel=exact_kernel,
                                    int8_levels=None)
    int8_cfg = dataclasses.replace(cfg, mrf_kernel="int8",
                                   int8_levels=cfg.int8_levels)
    ref = np.asarray(generator(params, mels, exact_cfg), np.float64)
    got = np.asarray(generator(params, mels, int8_cfg), np.float64)
    err = got - ref
    snr = 10.0 * np.log10(np.mean(ref ** 2) / max(np.mean(err ** 2), 1e-30))
    mel_ref = np.asarray(log_mel_spectrogram(jnp.asarray(ref, jnp.float32)))
    mel_got = np.asarray(log_mel_spectrogram(jnp.asarray(got, jnp.float32)))
    return {
        "snr_db": float(snr),
        "max_abs_err": float(np.max(np.abs(err))),
        "mel_l1": float(np.mean(np.abs(mel_got - mel_ref))),
        "exact_kernel": exact_kernel,
        "quantized_kernel": "int8",
    }


# ---------------------------------------------------------------------------
# Discriminators (defined for completeness / fine-tuning; reference never
# trains them — hifigan/models.py:209-334)
# ---------------------------------------------------------------------------


def init_discriminator_p(key, period: int, kernel_size=5, stride=3):
    chs = [(1, 32), (32, 128), (128, 512), (512, 1024), (1024, 1024)]
    keys = jax.random.split(key, len(chs) + 1)
    convs = []
    for i, (ic, oc) in enumerate(chs):
        fan_in = ic * kernel_size
        convs.append({
            "weight": nn.kaiming_uniform(keys[i], (kernel_size, 1, ic, oc), fan_in),
            "bias": jnp.zeros((oc,)),
        })
    conv_post = {
        "weight": nn.kaiming_uniform(keys[-1], (3, 1, 1024, 1), 1024 * 3),
        "bias": jnp.zeros((1,)),
    }
    del period  # periods are static structure, not parameters (see MPD_PERIODS)
    return {"convs": convs, "conv_post": conv_post}


def _conv2d(p, x, stride=(1, 1), padding=((0, 0), (0, 0))):
    out = jax.lax.conv_general_dilated(
        x, p["weight"], window_strides=stride, padding=padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    return out + p["bias"]


def discriminator_p(params, audio: jnp.ndarray, period: int, kernel_size=5, stride=3):
    """audio: (B, T) -> (logits, feature maps); 1D->2D period folding
    (models.py:225-244)."""
    b, t = audio.shape
    if t % period != 0:
        n_pad = period - (t % period)
        audio = jnp.pad(audio, ((0, 0), (0, n_pad)), mode="reflect")
        t = t + n_pad
    x = audio.reshape(b, t // period, period, 1)
    fmap = []
    for i, conv in enumerate(params["convs"]):
        s = (stride, 1) if i < 4 else (1, 1)
        pad = ((_get_padding(5, 1), _get_padding(5, 1)), (0, 0)) if i < 4 else ((2, 2), (0, 0))
        x = _conv2d(conv, x, stride=s, padding=pad)
        x = _lrelu(x)
        fmap.append(x)
    x = _conv2d(params["conv_post"], x, padding=((1, 1), (0, 0)))
    fmap.append(x)
    return x.reshape(b, -1), fmap


MPD_PERIODS = (2, 3, 5, 7, 11)  # models.py:250-258


def init_mpd(key):
    keys = jax.random.split(key, len(MPD_PERIODS))
    return {"discriminators": [init_discriminator_p(k, p) for k, p in zip(keys, MPD_PERIODS)]}


def init_discriminator_s(key):
    spec = [  # (in, out, kernel, stride, groups, padding)
        (1, 128, 15, 1, 1, 7),
        (128, 128, 41, 2, 4, 20),
        (128, 256, 41, 2, 16, 20),
        (256, 512, 41, 4, 16, 20),
        (512, 1024, 41, 4, 16, 20),
        (1024, 1024, 41, 1, 16, 20),
        (1024, 1024, 5, 1, 1, 2),
    ]
    keys = jax.random.split(key, len(spec) + 1)
    convs = []
    for i, (ic, oc, k, s, g, p) in enumerate(spec):
        fan_in = (ic // g) * k
        convs.append({
            "weight": nn.kaiming_uniform(keys[i], (k, ic // g, oc), fan_in),
            "bias": jnp.zeros((oc,)),
        })
    conv_post = nn.init_conv1d(keys[-1], 1024, 1, 3)
    return {"convs": convs, "conv_post": conv_post}


_DS_SPEC = [
    (15, 1, 1, 7),
    (41, 2, 4, 20),
    (41, 2, 16, 20),
    (41, 4, 16, 20),
    (41, 4, 16, 20),
    (41, 1, 16, 20),
    (5, 1, 1, 2),
]


def discriminator_s(params, audio: jnp.ndarray):
    """(B, T) -> (logits, fmaps) (models.py:276-303)."""
    x = audio[..., None]
    fmap = []
    for conv, (k, s, g, p) in zip(params["convs"], _DS_SPEC):
        x = jax.lax.conv_general_dilated(
            x, conv["weight"], window_strides=(s,), padding=[(p, p)],
            dimension_numbers=("NWC", "WIO", "NWC"), feature_group_count=g,
        ) + conv["bias"]
        x = _lrelu(x)
        fmap.append(x)
    x = nn.conv1d(params["conv_post"], x, padding=1)
    fmap.append(x)
    return x.reshape(x.shape[0], -1), fmap


def init_msd(key):
    keys = jax.random.split(key, 3)
    return {"discriminators": [init_discriminator_s(k) for k in keys]}


def _avg_pool(x, kernel=4, stride=2, padding=2):
    return jax.lax.reduce_window(
        x, 0.0, jax.lax.add, (1, kernel), (1, stride), [(0, 0), (padding, padding)]
    ) / kernel


def msd(params, y: jnp.ndarray, y_hat: jnp.ndarray):
    outs_r, outs_g, fmaps_r, fmaps_g = [], [], [], []
    for i, d in enumerate(params["discriminators"]):
        if i != 0:
            y = _avg_pool(y)
            y_hat = _avg_pool(y_hat)
        lr, fr = discriminator_s(d, y)
        lg, fg = discriminator_s(d, y_hat)
        outs_r.append(lr)
        outs_g.append(lg)
        fmaps_r.append(fr)
        fmaps_g.append(fg)
    return outs_r, outs_g, fmaps_r, fmaps_g


def mpd(params, y: jnp.ndarray, y_hat: jnp.ndarray):
    outs_r, outs_g, fmaps_r, fmaps_g = [], [], [], []
    for d, period in zip(params["discriminators"], MPD_PERIODS):
        lr, fr = discriminator_p(d, y, period)
        lg, fg = discriminator_p(d, y_hat, period)
        outs_r.append(lr)
        outs_g.append(lg)
        fmaps_r.append(fr)
        fmaps_g.append(fg)
    return outs_r, outs_g, fmaps_r, fmaps_g


# ---------------------------------------------------------------------------
# GAN losses (models.py:337-368)
# ---------------------------------------------------------------------------


def feature_loss(fmap_r: List, fmap_g: List):
    loss = 0.0
    for dr, dg in zip(fmap_r, fmap_g):
        for rl, gl in zip(dr, dg):
            loss += jnp.mean(jnp.abs(rl - gl))
    return loss * 2.0


def discriminator_loss(real_outs: List, gen_outs: List):
    loss = 0.0
    r_losses, g_losses = [], []
    for dr, dg in zip(real_outs, gen_outs):
        r = jnp.mean(jnp.square(1.0 - dr))
        g = jnp.mean(jnp.square(dg))
        loss += r + g
        r_losses.append(r)
        g_losses.append(g)
    return loss, r_losses, g_losses


def generator_loss(disc_outs: List):
    loss = 0.0
    gen_losses = []
    for dg in disc_outs:
        l = jnp.mean(jnp.square(1.0 - dg))
        gen_losses.append(l)
        loss += l
    return loss, gen_losses
