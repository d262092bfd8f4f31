"""Streaming HiFi-GAN vocoder: incremental wav emission from a mel.

The reference vocodes whole utterances in one pass (hifigan/models.py:181-197,
main.py:198) — audio arrives only after the full wav exists on host.  This
module emits audio chunk-by-chunk while remaining *exactly* equivalent to the
full-utterance pass.

Design (TPU-native, deliberately NOT conv-tail state carrying):
  HiFi-GAN is a finite-receptive-field feedforward stack, so the wav samples
  for mel frames [a, b) depend only on mel frames [a - r, b + r) where r is
  the receptive-field radius (13 frames for the v1 config — computed, not
  hard-coded, by `receptive_radius_frames`).  Each chunk therefore runs the
  stock generator on a fixed-size window of `chunk + 2r` frames and keeps
  only the interior samples.  Windows at the sequence boundary are aligned
  so the true edge coincides with the window edge, making the generator's
  own zero padding identical to the full pass — the output is exact
  everywhere, not just in the interior.

  Threading per-conv tail state across 13+ convs at 4 different sample
  rates (plus transposed convs, whose state is an output overlap, not an
  input tail) would force dynamic state pytrees through jit for no compute
  saving: the window overhead is 2r/chunk (~40% at chunk=64, ~10% at 256),
  while the design stays one static-shape jitted graph reused by every
  chunk of every utterance.
"""

from __future__ import annotations

import functools
from typing import Iterator, Optional

import jax
import jax.numpy as jnp
import numpy as np

from matcha_tts_tpu.config import HiFiGANConfig, VocosConfig
from matcha_tts_tpu.models import vocoder as vocoder_mod


def receptive_radius_frames(cfg) -> int:
    """One-sided receptive-field radius of the generator, in mel frames.

    HiFi-GAN: walks the stack output -> input (conv_post, per-level MRF +
    transposed upsample, conv_pre), mirroring Generator.forward
    (reference hifigan/models.py:181-197).  Conservative (ceil) at each
    rate change; v1 config evaluates to 13.

    Vocos: the ConvNeXt backbone's radius is (k//2) per depthwise conv
    plus the embed conv; the iSTFT head adds an overlap-add boundary band
    of ceil(n_fft / hop) frames (each output sample draws OLA
    contributions and window-square normalization from frames within
    n_fft/2 samples, and the chunk-local last-frame edge replication +
    center trim must stay outside the extracted region).  Default config
    evaluates to 31.
    """
    if isinstance(cfg, VocosConfig):
        half = cfg.kernel_size // 2
        backbone = half * (1 + cfg.num_layers)
        ola = -(-cfg.n_fft // cfg.hop_length)
        return backbone + ola
    r = 3  # conv_post k=7, pad 3
    levels = list(zip(cfg.upsample_rates, cfg.upsample_kernel_sizes))
    for i, (u, k) in reversed(list(enumerate(levels))):
        # MRF branches run in parallel and are averaged -> max branch radius.
        mrf = 0
        for kk, dd in zip(cfg.resblock_kernel_sizes, cfg.resblock_dilation_sizes):
            half = (kk - 1) // 2
            if cfg.resblock == "1":
                # ResBlock1: per dilation, conv(kk, d) then conv(kk, 1)
                branch = sum(half * d + half for d in dd)
            else:
                branch = sum(half * d for d in dd)
            mrf = max(mrf, branch)
        r += mrf
        # ConvTranspose1d(k, stride u, pad (k-u)//2): out[j] sums x[i] with
        # j = i*u + m - pad, m in [0, k) -> i in [(j+pad-k+1)/u, (j+pad)/u].
        pad = (k - u) // 2
        r = (r + pad) // u + 1
    return r + 3  # conv_pre k=7, pad 3


@functools.partial(jax.jit, static_argnames=("cfg", "compute_dtype"))
def _vocode_window(params, mel_win: jnp.ndarray, cfg,
                   compute_dtype: str = "float32") -> jnp.ndarray:
    """(B, W, n_mels) window -> (B, W * hop) wav, clipped to [-1, 1]."""
    wav = vocoder_mod.generate(params,
                               mel_win.astype(jnp.dtype(compute_dtype)), cfg)
    return jnp.clip(wav.astype(jnp.float32), -1.0, 1.0)


class StreamingVocoder:
    """Chunked vocoding (either family) with exact full-pass equivalence.

    Yields wav chunks of `chunk_frames * hop` samples (last chunk partial)
    from a mel of any length, using ONE compiled graph for all interior
    chunks (plus one exact-size compile per short-tail utterance shorter
    than a window).
    """

    def __init__(self, vocoder_params, cfg: Optional[HiFiGANConfig] = None,
                 chunk_frames: int = 64,
                 context_frames: Optional[int] = None,
                 compute_dtype: str = "float32"):
        self.params = vocoder_params
        self.cfg = cfg or HiFiGANConfig()
        self.chunk = int(chunk_frames)
        self.radius = (int(context_frames) if context_frames is not None
                       else receptive_radius_frames(self.cfg))
        self.window = self.chunk + 2 * self.radius
        self.compute_dtype = compute_dtype

    @property
    def hop(self) -> int:
        return self.cfg.total_upsample

    def stream(self, mel: np.ndarray) -> Iterator[np.ndarray]:
        """mel: (T, n_mels) channels-last -> yields float32 wav chunks.

        Chunk i covers mel frames [i*chunk, (i+1)*chunk); concatenating all
        chunks equals `generator(params, mel[None])[0]` exactly (same conv
        zero padding at the true sequence edges, full context elsewhere).
        """
        mel = np.asarray(mel, np.float32)
        if mel.ndim != 2 or mel.shape[1] != self.cfg.num_mels:
            raise ValueError(
                f"mel must be (T, {self.cfg.num_mels}) channels-last, "
                f"got {mel.shape}")
        t = mel.shape[0]
        hop = self.hop
        if t == 0:
            return
        if t <= self.window:
            wav = _vocode_window(self.params, jnp.asarray(mel[None]),
                                 self.cfg, self.compute_dtype)[0]
            wav = np.asarray(wav)
            for a in range(0, t, self.chunk):
                yield wav[a * hop : min(a + self.chunk, t) * hop]
            return
        a = 0
        while a < t:
            lo = max(0, a - self.radius)
            if lo + self.window > t:
                lo = t - self.window
            win = jnp.asarray(mel[lo : lo + self.window][None])
            wav_win = _vocode_window(self.params, win, self.cfg,
                                     self.compute_dtype)[0]
            s = (a - lo) * hop
            e = (min(a + self.chunk, t) - lo) * hop
            yield np.asarray(wav_win[s:e])
            a += self.chunk

    def vocode(self, mel: np.ndarray) -> np.ndarray:
        """Convenience: stream and concatenate (memory-bounded full pass)."""
        chunks = list(self.stream(mel))
        if not chunks:
            return np.zeros((0,), np.float32)
        return np.concatenate(chunks)
