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

    Yields wav chunks from a mel of any length.  Two latency/throughput
    levers (both exactness-preserving, both measured on the tunneled TPU
    where every device->host fetch costs ~29 ms regardless of size —
    round 4's book-scale soak spent 76 of 126 s in 2634 sequential chunk
    fetches, docs/RESULTS.md):

    * `max_chunk_frames` > `chunk_frames` grows the chunk size
      geometrically (x2 per chunk) from `chunk_frames` up to
      `max_chunk_frames`: time-to-first-audio stays one small window,
      while the steady-state fetch count drops ~chunk_max/chunk_min-fold.
      Each distinct chunk size uses its own compiled window graph
      (log2(max/min)+1 graphs, cached persistently).
    * `pipeline_depth` windows are dispatched ahead of the fetch cursor,
      so window k+1's device compute (and H2D transfer) overlaps window
      k's device->host fetch.  Dispatch is async on TPU; depth 0 restores
      strictly serial dispatch->fetch.

    Fetches transfer the WHOLE window and slice host-side: the interior
    slice used to be its own eagerly-dispatched device program per chunk
    (~30 ms on the tunnel — as expensive as the fetch it fed); the extra
    2*radius frames of wav cost ~0.1 ms/MB-scale transfer instead.
    """

    def __init__(self, vocoder_params, cfg: Optional[HiFiGANConfig] = None,
                 chunk_frames: int = 64,
                 context_frames: Optional[int] = None,
                 compute_dtype: str = "float32",
                 max_chunk_frames: Optional[int] = None,
                 pipeline_depth: int = 2):
        self.params = vocoder_params
        self.cfg = cfg or HiFiGANConfig()
        self.chunk = int(chunk_frames)
        self.max_chunk = (int(max_chunk_frames) if max_chunk_frames
                          else self.chunk)
        if self.max_chunk < self.chunk:
            raise ValueError(f"max_chunk_frames {self.max_chunk} < "
                             f"chunk_frames {self.chunk}")
        # snap to chunk * 2^k so halving a too-large scheduled chunk always
        # lands on an already-compiled window size
        k = 0
        while self.chunk << (k + 1) <= self.max_chunk:
            k += 1
        self.max_chunk = self.chunk << k
        self.pipeline_depth = max(0, int(pipeline_depth))
        self.radius = (int(context_frames) if context_frames is not None
                       else receptive_radius_frames(self.cfg))
        self.window = self.chunk + 2 * self.radius
        self.compute_dtype = compute_dtype

    @property
    def hop(self) -> int:
        return self.cfg.total_upsample

    def _chunk_schedule(self) -> Iterator[int]:
        c = self.chunk
        while True:
            yield c
            c = min(c * 2, self.max_chunk)

    def stream(self, mel: np.ndarray) -> Iterator[np.ndarray]:
        """mel: (T, n_mels) channels-last -> yields float32 wav chunks.

        Concatenating all chunks equals `generator(params, mel[None])[0]`
        exactly (same conv zero padding at the true sequence edges, full
        context elsewhere) for ANY chunk schedule / pipeline depth: each
        window covers [a - r, a + chunk + r) so the kept interior has full
        receptive-field context regardless of chunk size.
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
            a, sched = 0, self._chunk_schedule()
            while a < t:
                c = next(sched)
                yield wav[a * hop : min(a + c, t) * hop]
                a += c
            return
        # dispatch-ahead pipeline: (device_window, s, e) FIFO
        pending = []

        def _drain_one():
            dev, s, e = pending.pop(0)
            host = np.asarray(dev)[0]
            return host[s:e]

        a, sched = 0, self._chunk_schedule()
        while a < t:
            c = next(sched)
            # a larger scheduled chunk may not fit the utterance: halve
            # back down the schedule (windows stay within compiled sizes)
            while c > self.chunk and c + 2 * self.radius > t:
                c //= 2
            c = max(c, self.chunk)
            window = c + 2 * self.radius
            lo = max(0, a - self.radius)
            if lo + window > t:
                lo = t - window
            win = jnp.asarray(mel[lo : lo + window][None])
            dev = _vocode_window(self.params, win, self.cfg,
                                 self.compute_dtype)
            s = (a - lo) * hop
            e = (min(a + c, t) - lo) * hop
            pending.append((dev, s, e))
            a += c
            if len(pending) > self.pipeline_depth:
                yield _drain_one()
        while pending:
            yield _drain_one()

    def vocode(self, mel: np.ndarray) -> np.ndarray:
        """Convenience: stream and concatenate (memory-bounded full pass)."""
        chunks = list(self.stream(mel))
        if not chunks:
            return np.zeros((0,), np.float32)
        return np.concatenate(chunks)
