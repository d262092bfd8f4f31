"""End-to-end inference driver: text -> tokens -> mel -> wav.

Replaces the reference's `main.py` flow (main.py:155-217) with a bucketed,
compile-cached pipeline:

* token and frame lengths are padded to static buckets, so each
  (T_x, T_y, NFE) triple compiles exactly once and is cached;
* the acoustic model + vocoder (+ optional denoiser bias subtraction) run
  as ONE jitted graph per bucket — no host synchronization between the
  Euler loop and HiFi-GAN (the reference has 3+ host syncs, SURVEY.md §3.1);
* long-form text is split on sentences/`|` and batched across buckets
  (the reference handles long text manually with `|`, main.py:158).
"""

from __future__ import annotations

import functools
import re
from dataclasses import dataclass
from typing import List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from matcha_tts_tpu.config import HiFiGANConfig, MatchaConfig
from matcha_tts_tpu.models import vocoder as vocoder_mod
from matcha_tts_tpu.models.matcha import encode_only, synthesize
from matcha_tts_tpu.text.tokenizer import encode_text

DEFAULT_TEXT_BUCKETS = (64, 128, 192, 256, 384, 512)
# batched synthesis pads the batch dim to these sizes so each (B, T_x, T_y)
# triple compiles once — essential under serving load, where arrival-driven
# batch sizes would otherwise each trigger a full-graph compile
DEFAULT_BATCH_BUCKETS = (1, 2, 4, 8, 16, 32)
# batch mode also coarsens the frame buckets: arrival-dependent batch
# composition changes the max predicted duration, and a fine grid would
# turn every composition into a fresh compile.  Throughput mode trades
# padded frames for a tiny, warmable shape space.
DEFAULT_BATCH_FRAME_BUCKETS = (256, 512, 1024, 2048)
# Fine-grained in the common speech range (1.5-12 s) so padded compute and
# device->host transfer track the true length; coarser above.
DEFAULT_FRAME_BUCKETS = (128, 192, 256, 320, 384, 448, 512, 576, 640, 704,
                         768, 832, 896, 1024, 1152, 1280, 1536, 2048)


@functools.partial(jax.jit, static_argnames=("matcha_cfg", "hifi_cfg",
                                             "n_timesteps", "t_y_max",
                                             "temperature", "length_scale",
                                             "compute_dtype"))
def _synthesize_to_wav(
    matcha_params,
    vocoder_params,
    key,
    x,
    x_lengths,
    matcha_cfg: MatchaConfig,
    hifi_cfg: HiFiGANConfig,
    n_timesteps: int,
    t_y_max: int,
    temperature: float,
    length_scale: float,
    spks=None,
    compute_dtype: str = "float32",
    noise_ids=None,
):
    """One fused graph: encoder -> duration -> Euler CFM -> vocoder
    (HiFi-GAN or Vocos, dispatched on the static config type)."""
    out = synthesize(matcha_params, key, x, x_lengths, matcha_cfg,
                     n_timesteps=n_timesteps, t_y_max=t_y_max,
                     temperature=temperature, length_scale=length_scale,
                     spks=spks, compute_dtype=compute_dtype,
                     noise_ids=noise_ids)
    mel_btc = out.mel.transpose(0, 2, 1)  # (B, T, n_mels)
    wav = vocoder_mod.generate(vocoder_params,
                               mel_btc.astype(jnp.dtype(compute_dtype)),
                               hifi_cfg)
    wav = jnp.clip(wav.astype(jnp.float32), -1.0, 1.0)
    return out, wav


@functools.partial(jax.jit, static_argnames=("matcha_cfg", "hifi_cfg",
                                             "n_timesteps", "t_y_max",
                                             "temperature", "length_scale",
                                             "compute_dtype",
                                             "denoise_strength"))
def _synthesize_packed(
    matcha_params,
    vocoder_params,
    key,
    x,
    x_lengths,
    matcha_cfg: MatchaConfig,
    hifi_cfg: HiFiGANConfig,
    n_timesteps: int,
    t_y_max: int,
    temperature: float,
    length_scale: float,
    spks=None,
    compute_dtype: str = "float32",
    bias_spec=None,
    denoise_strength: float = 0.0,
    noise_ids=None,
):
    """Fused graph whose primary output is ONE flat int16 buffer:
    [pcm16 (B*T_wav) | y_lengths (B)].

    Rationale: on remote-tunnel device transports every host fetch costs
    tens of ms of latency regardless of size, so the audio (already
    destined for 16-bit PCM) and the valid lengths ship in a single
    transfer; mel/attention stay on device for lazy diagnostic access.

    With `denoise_strength > 0` the WaveGlow-style spectral denoiser runs
    in the same graph (the reference notebooks use strength 0.00025).
    """
    out, wav = _synthesize_to_wav.__wrapped__(
        matcha_params, vocoder_params, key, x, x_lengths, matcha_cfg,
        hifi_cfg, n_timesteps, t_y_max, temperature, length_scale, spks,
        compute_dtype, noise_ids,
    )
    if denoise_strength > 0.0 and bias_spec is not None:
        from matcha_tts_tpu.models.denoiser import DenoiserState
        from matcha_tts_tpu.models.denoiser import denoise as _denoise

        n = wav.shape[-1]
        state = DenoiserState(bias_spec)
        den = _denoise(state, wav, strength=denoise_strength)
        cur = den.shape[-1]
        if cur < n:
            den = jnp.pad(den, ((0, 0), (0, n - cur)))
        wav = jnp.clip(den[..., :n], -1.0, 1.0)
    pcm = jnp.round(wav * 32767.0).astype(jnp.int16)
    packed = jnp.concatenate(
        [pcm.reshape(-1), out.y_lengths.astype(jnp.int16)]
    )
    return packed, out


@dataclass
class SynthesisResult:
    wav: np.ndarray          # (n_samples,) float32
    mel: np.ndarray          # (n_mels, T_valid)
    attn: np.ndarray         # (T_x, T_y_valid)
    rtf_breakdown: dict

    @property
    def pcm16(self) -> np.ndarray:
        """int16 PCM (same rounding as the device's packed path)."""
        return np.round(np.clip(self.wav, -1.0, 1.0)
                        * 32767.0).astype(np.int16)


class LazySynthesisResult:
    """Deferred-transfer result: `.wav` costs exactly one device->host
    transfer (packed int16); `.mel`/`.attn` are fetched only on access."""

    def __init__(self, packed_dev, out_dev, row: int, batch: int,
                 t_wav: int, hop: int, shared_cache: Optional[list] = None):
        self._packed = packed_dev
        self._out = out_dev
        self._row = row
        self._b = batch
        self._t_wav = t_wav
        self._hop = hop
        # Rows of one batch share a single-element cache list so the packed
        # buffer crosses device->host exactly once per batch, not per row.
        self._host = shared_cache if shared_cache is not None else [None]
        self.rtf_breakdown: dict = {}

    def _fetch(self):
        if self._host[0] is None:
            self._host[0] = np.asarray(self._packed)
        return self._host[0]

    @property
    def y_length(self) -> int:
        return int(self._fetch()[self._b * self._t_wav + self._row])

    @property
    def wav(self) -> np.ndarray:
        p = self._fetch()
        n = self.y_length * self._hop
        start = self._row * self._t_wav
        return p[start : start + n].astype(np.float32) / 32767.0

    @property
    def pcm16(self) -> np.ndarray:
        """int16 PCM, zero-copy slice of the packed transfer (serving
        ships this straight into WAV/stream bytes — no float round trip)."""
        p = self._fetch()
        n = self.y_length * self._hop
        start = self._row * self._t_wav
        return p[start : start + n]

    @property
    def mel(self) -> np.ndarray:
        return np.asarray(self._out.mel)[self._row, :, : self.y_length]

    @property
    def attn(self) -> np.ndarray:
        return np.asarray(self._out.attn)[self._row, :, : self.y_length]


class Synthesizer:
    """Host-facing TTS engine with a per-bucket compile cache."""

    def __init__(
        self,
        matcha_params,
        matcha_cfg: MatchaConfig,
        vocoder_params=None,
        hifi_cfg: Optional[HiFiGANConfig] = None,
        text_buckets: Sequence[int] = DEFAULT_TEXT_BUCKETS,
        frame_buckets: Sequence[int] = DEFAULT_FRAME_BUCKETS,
        batch_buckets: Sequence[int] = DEFAULT_BATCH_BUCKETS,
        batch_frame_buckets: Sequence[int] = DEFAULT_BATCH_FRAME_BUCKETS,
        compute_dtype: str = "float32",
        denoise_strength: float = 0.0,
    ):
        self.matcha_params = matcha_params
        self.matcha_cfg = matcha_cfg
        self.vocoder_params = vocoder_params
        self.hifi_cfg = hifi_cfg or HiFiGANConfig()
        self.text_buckets = tuple(text_buckets)
        self.frame_buckets = tuple(frame_buckets)
        self.batch_buckets = tuple(batch_buckets)
        self.batch_frame_buckets = tuple(batch_frame_buckets)
        self.compute_dtype = compute_dtype
        self.denoise_strength = float(denoise_strength)
        # Observability: fused-graph call count and heuristic frame-bucket
        # undershoot retries (each retry is one wasted device call; see
        # benchmarks/duration_buckets.py for validation against a trained
        # duration model).
        self.stats = {"calls": 0, "bucket_retries": 0}
        self._bias_spec = None
        if self.denoise_strength > 0.0 and vocoder_params is not None:
            from matcha_tts_tpu.models.denoiser import make_denoiser

            self._bias_spec = make_denoiser(vocoder_params,
                                            self.hifi_cfg).bias_spec

    # -- bucketing ---------------------------------------------------------

    def _bucket(self, n: int, buckets: Sequence[int]) -> int:
        for b in buckets:
            if n <= b:
                return b
        return buckets[-1]

    def tokenize(self, text: str) -> np.ndarray:
        return encode_text(text, add_blank=True)

    @staticmethod
    def _noise_id(ids: np.ndarray) -> int:
        """Stable per-utterance noise identity (content hash): the same
        (tokens, seed) draws the same CFM noise whether synthesized alone,
        in any batch row, or alongside any other requests.  (The frame
        bucket can still shift outputs slightly — the reference's
        GroupNorm includes padded frames in its statistics.)"""
        import zlib

        return zlib.crc32(np.asarray(ids, np.int32).tobytes()) & 0x7FFFFFFF

    # Conservative usable-HBM budget for the fp32 batch guard (v5e has
    # 16 GB; leave headroom for weights, the U-Net, and XLA scratch).
    HBM_BUDGET_BYTES = 12e9
    # Estimated concurrently-live wav-rate activation buffers on the XLA
    # vocoder path (3 MRF branches x residual chains at the two deepest
    # levels).  Calibrated against the measured fp32 batch-32 overflow
    # (docs/RESULTS.md).
    _VOCODER_LIVE_BUFFERS = 16

    def _check_vocoder_memory(self, batch: int, t_y: int) -> None:
        """Fail fast on the measured fp32 large-batch HBM trap instead of
        letting the runtime OOM mid-graph.  bf16 is the supported batch-
        throughput mode; fp32 batched synthesis overflows v5e HBM around
        batch 32 x 768 frames (docs/RESULTS.md)."""
        if self.compute_dtype != "float32":
            return
        if not isinstance(self.hifi_cfg, HiFiGANConfig):
            # Vocos activations live at frame rate (~hop x smaller than
            # HiFi-GAN's wav-rate pyramid); no batch regime in reach of
            # the buckets approaches the HBM budget.
            return
        hop = self.hifi_cfg.total_upsample
        deepest_ch = self.hifi_cfg.upsample_initial_channel // (
            2 ** len(self.hifi_cfg.upsample_rates))
        est = batch * t_y * hop * deepest_ch * 4 * self._VOCODER_LIVE_BUFFERS
        if est > self.HBM_BUDGET_BYTES:
            raise ValueError(
                f"compute_dtype='float32' with batch={batch} x "
                f"t_y={t_y} frames needs ~{est / 1e9:.1f} GB of vocoder "
                f"activations — beyond the ~{self.HBM_BUDGET_BYTES / 1e9:.0f}"
                f" GB HBM budget (measured OOM on v5e, docs/RESULTS.md). "
                f"Use compute_dtype='bfloat16' for batched synthesis, or "
                f"reduce the batch/frame buckets.")

    # -- single utterance ---------------------------------------------------

    def synthesize(
        self,
        text: str,
        n_timesteps: int = 10,
        temperature: float = 0.667,
        length_scale: float = 1.0,
        seed: int = 0,
        spk: Optional[int] = None,
    ) -> SynthesisResult:
        ids = self.tokenize(text)
        return self.synthesize_tokens(ids, n_timesteps, temperature,
                                      length_scale, seed, spk)

    def predict_frame_bucket(self, x, x_lengths, length_scale: float,
                             spks=None, buckets=None) -> int:
        """Run the (cheap, cached) encoder-only graph to get the exact
        predicted frame count, then snap to the smallest bucket.  Duration
        prediction is deterministic, so the fused graph sees no overflow."""
        y_lengths = encode_only(self.matcha_params, x, x_lengths,
                                self.matcha_cfg, length_scale=length_scale,
                                spks=spks)
        return self._bucket(int(np.max(np.asarray(y_lengths))),
                            buckets if buckets is not None
                            else self.frame_buckets)

    # frames-per-interspersed-token upper bound for the heuristic frame
    # bucket; LJSpeech averages ~2.7 with trained weights.  Undershoot is
    # detected from the packed y_length and retried one bucket up.  The
    # estimate adapts at runtime (observed max ratio x safety margin) so
    # buckets — and device->host transfer sizes — converge to the model's
    # actual duration statistics.
    FRAMES_PER_TOKEN = 4.0
    FPT_MARGIN = 1.25

    def _frames_per_token(self) -> float:
        obs = getattr(self, "_fpt_obs_max", None)
        if obs is None:
            return self.FRAMES_PER_TOKEN
        return min(8.0, max(1.0, obs * self.FPT_MARGIN))

    def _observe_ratio(self, y_len: int, n_tokens: int, length_scale: float):
        obs = y_len / max(n_tokens * length_scale, 1.0)
        prev = getattr(self, "_fpt_obs_max", 0.0)
        self._fpt_obs_max = max(prev, obs)

    def synthesize_tokens(self, ids: np.ndarray, n_timesteps=10,
                          temperature=0.667, length_scale=1.0, seed=0,
                          spk: Optional[int] = None,
                          exact_bucket: bool = False) -> LazySynthesisResult:
        """Single-utterance synthesis optimized for latency: one fused jit
        call, one packed device->host transfer.

        `exact_bucket=True` runs the cheap encoder graph first to pick the
        minimal frame bucket (an extra host round trip — better when
        transfers are cheap, e.g. local PCIe)."""
        t_x = self._bucket(len(ids), self.text_buckets)
        ids = ids[:t_x]  # truncate past the largest bucket
        x = np.zeros((1, t_x), np.int32)
        x[0, : len(ids)] = ids
        x_lengths = np.asarray([len(ids)], np.int32)
        spks = np.asarray([spk], np.int32) if spk is not None else None

        x, x_lengths = jnp.asarray(x), jnp.asarray(x_lengths)
        if exact_bucket:
            t_y = self.predict_frame_bucket(x, x_lengths, length_scale, spks)
        else:
            t_y = self._bucket(
                int(len(ids) * self._frames_per_token() * length_scale),
                self.frame_buckets,
            )

        hop = self.matcha_cfg.audio.hop_length
        if self.hifi_cfg.total_upsample != hop:
            raise ValueError(
                f"vocoder upsampling x{self.hifi_cfg.total_upsample} must "
                f"equal the mel hop length {hop} (wav samples per frame)")
        key = jax.random.PRNGKey(seed)
        noise_ids = jnp.asarray([self._noise_id(ids)], jnp.int32)
        while True:
            self.stats["calls"] += 1
            packed, out = _synthesize_packed(
                self.matcha_params, self.vocoder_params, key, x, x_lengths,
                self.matcha_cfg, self.hifi_cfg, n_timesteps, t_y,
                temperature, length_scale, spks=spks,
                compute_dtype=self.compute_dtype,
                bias_spec=self._bias_spec,
                denoise_strength=self.denoise_strength,
                noise_ids=noise_ids,
            )
            result = LazySynthesisResult(packed, out, row=0, batch=1,
                                         t_wav=t_y * hop, hop=hop)
            # heuristic bucket undershoot -> predicted length was clipped;
            # retry one bucket up (rare; duration model is deterministic)
            if (result.y_length >= t_y
                    and t_y != self.frame_buckets[-1]):
                bigger = [b for b in self.frame_buckets if b > t_y]
                t_y = bigger[0]
                self.stats["bucket_retries"] += 1
                continue
            self._observe_ratio(result.y_length, len(ids), length_scale)
            return result

    def warmup(self, texts: Optional[Sequence[str]] = None,
               batch_sizes: Optional[Sequence[int]] = None,
               n_timesteps: int = 10, **kw) -> int:
        """Precompile the batched fused graphs a serving deployment will
        hit: for each batch bucket, synthesize representative `texts`
        cycled to that size (frame buckets follow the duration model).
        Returns the number of batch shapes warmed.  Combine with JAX's
        persistent compilation cache for warm restarts."""
        texts = list(texts) if texts else [
            "The birch canoe slid on the smooth planks.",
            "It is easy to tell the depth of a well, these days.",
        ]
        batch_sizes = list(batch_sizes) if batch_sizes else list(self.batch_buckets)
        for b in batch_sizes:
            reps = [texts[i % len(texts)] for i in range(b)]
            rs = self.synthesize_batch(reps, n_timesteps=n_timesteps, **kw)
            # drain the async executions so serving starts with an empty
            # device queue (see warmup_grid's drain note).  synthesize_batch
            # can split the reps into several text-bucket groups, each
            # dispatching its own packed graph — drain EVERY group, not just
            # rs[0]'s (the shared per-group cache makes this one fetch per
            # group, not per row).
            for r in rs:
                _ = r.y_length
        return len(batch_sizes)

    def warmup_grid(self, batch_sizes: Optional[Sequence[int]] = None,
                    n_timesteps: int = 10, temperature: float = 0.667,
                    length_scale: float = 1.0, spk: Optional[int] = None,
                    fpt_range=(1.0, 4.0)) -> List[tuple]:
        """Precompile EVERY reachable batched fused graph, not just the
        shapes sample texts happen to induce.

        Batched graphs are cached per (batch, text, frame)-bucket triple.
        `warmup` compiles only the triples its sample texts produce; under
        open-ended traffic a novel composition then compiles DURING a
        request — minutes cold on remote transports (the p99=60 s tail in
        the 2026-08-18 serving soak, docs/RESULTS.md).  This enumerates,
        for each (batch, text) bucket pair, every batch-frame bucket that a
        duration of `fpt_range` frames per interspersed token (times
        `length_scale`) can reach, and compiles those graphs directly.

        The cache key includes the static call parameters, so run this with
        the SAME (n_timesteps, temperature, length_scale) traffic will use.
        One-time cost per deployment (persisted by the JAX compilation
        cache); returns the list of (batch, t_x, t_y) triples warmed.
        """
        batch_sizes = (list(batch_sizes) if batch_sizes
                       else list(self.batch_buckets))
        lo, hi = fpt_range
        triples = []
        for t_x in self.text_buckets:
            y_lo = self._bucket(int(t_x * lo * length_scale),
                                self.batch_frame_buckets)
            y_hi = self._bucket(int(t_x * hi * length_scale),
                                self.batch_frame_buckets)
            t_ys = [t for t in self.batch_frame_buckets if y_lo <= t <= y_hi]
            for b in batch_sizes:
                b = self._bucket(b, self.batch_buckets)
                for t_y in t_ys:
                    if (b, t_x, t_y) not in triples:
                        triples.append((b, t_x, t_y))
        for b, t_x, t_y in triples:
            if self.compute_dtype == "float32":
                try:
                    self._check_vocoder_memory(b, t_y)
                except ValueError:
                    continue  # unreachable at runtime: the same guard trips
            # arbitrary valid tokens; t_y is forced, so content is irrelevant
            x = jnp.asarray(np.ones((b, t_x), np.int32))
            x_lengths = jnp.asarray(np.full((b,), t_x, np.int32))
            spks = np.full((b,), spk, np.int32) if spk is not None else None
            # warm the encoder-only duration graph for this (b, t_x) too —
            # predict_frame_bucket runs it before every batched call
            enc = encode_only(self.matcha_params, x, x_lengths,
                              self.matcha_cfg, length_scale=length_scale,
                              spks=spks)
            # warm the EXACT serving graph (packed transfer + in-graph
            # denoiser) — the cache key includes the denoise static args
            packed, _ = _synthesize_packed(
                self.matcha_params, self.vocoder_params,
                jax.random.PRNGKey(0), x, x_lengths,
                self.matcha_cfg, self.hifi_cfg, n_timesteps, t_y,
                temperature, length_scale, spks=spks,
                compute_dtype=self.compute_dtype,
                bias_spec=self._bias_spec,
                denoise_strength=self.denoise_strength,
                noise_ids=jnp.asarray(np.zeros((b,), np.int32)),
            )
            # DRAIN each warmed execution with a scalar fetch: dispatch is
            # async, and without this the whole grid's executions queue up
            # on the device — the first real request then waits behind
            # MINUTES of warmup backlog (measured round 4: 15 triples ->
            # 219 s first-request stall, Future timeouts / empty 500s in
            # the soak).  A scalar fetch is the reliable barrier on the
            # tunneled backend (block_until_ready alone under-reports).
            np.asarray(enc[-1])
            np.asarray(packed[-1])
        return triples

    # -- long-form / batched -------------------------------------------------

    @staticmethod
    def split_text(text: str) -> List[str]:
        """`|`-separated segments first (main.py:158 convention), then
        sentence boundaries."""
        parts: List[str] = []
        for seg in text.split("|"):
            seg = seg.strip()
            if not seg:
                continue
            sentences = re.split(r"(?<=[.!?;])\s+", seg)
            parts.extend(s for s in sentences if s)
        return parts

    def stream(self, text: str, n_timesteps: int = 10,
               temperature: float = 0.667, length_scale: float = 1.0,
               seed: int = 0, lookahead: int = 1):
        """Incremental synthesis: yields (chunk_text, wav) per sentence.

        Time-to-first-audio is one chunk's latency instead of the whole
        utterance's; `lookahead` extra chunks are dispatched ahead of the
        consumer so playback-rate consumers stay fed.
        """
        chunks = self.split_text(text)
        pending = []  # (chunk_text, LazySynthesisResult)

        def launch(i, chunk):
            ids = self.tokenize(chunk)
            return self.synthesize_tokens(ids, n_timesteps, temperature,
                                          length_scale, seed + i)

        for i, chunk in enumerate(chunks):
            pending.append((chunk, launch(i, chunk)))
            # keep `lookahead + 1` chunks in flight before draining
            while len(pending) > lookahead:
                done_text, res = pending.pop(0)
                yield done_text, res.wav
        for done_text, res in pending:
            yield done_text, res.wav

    def stream_samples(self, text: str, chunk_frames: int = 64,
                       n_timesteps: int = 10, temperature: float = 0.667,
                       length_scale: float = 1.0, seed: int = 0,
                       spk: Optional[int] = None,
                       max_chunk_frames: Optional[int] = 512,
                       pipeline_depth: int = 2,
                       lookahead_sentences: int = 1):
        """Sample-level streaming: yields float32 wav chunks as each
        sentence's mel is vocoded incrementally by `StreamingVocoder`.

        Chunks start at `chunk_frames * hop` samples (~0.74 s at the
        default 64) and grow geometrically to `max_chunk_frames` — time-
        to-first-audio stays one window while steady-state fetch count
        drops ~8x (round-4 book soak: 2634 sequential ~29 ms chunk
        fetches were 76 of the 126 s wall; docs/RESULTS.md).
        `pipeline_depth` windows are dispatched ahead of the fetch cursor,
        and with `lookahead_sentences` > 0 the NEXT sentence's acoustic
        pass (encoder -> duration fetch -> Euler CFM -> mel fetch) runs
        in a producer thread, overlapping its host round trips with this
        sentence's vocoder fetches.  All three levers are exactness-
        preserving: output equals the non-streaming vocoder pass, in
        order (see inference/streaming.py).

        Compared with `stream()` (per-sentence granularity), time-to-
        first-audio drops to one acoustic pass + one vocoder *window*
        instead of one full fused pass, and long sentences never
        materialize their whole waveform on device.
        """
        from matcha_tts_tpu.inference.streaming import StreamingVocoder
        from matcha_tts_tpu.models.matcha import synthesize as _acoustic

        sv = getattr(self, "_stream_vocoder", None)
        max_c = max_chunk_frames or chunk_frames
        if (sv is None or sv.chunk != chunk_frames
                or sv.max_chunk != max_c
                or sv.pipeline_depth != pipeline_depth):
            sv = StreamingVocoder(self.vocoder_params, self.hifi_cfg,
                                  chunk_frames,
                                  compute_dtype=self.compute_dtype,
                                  max_chunk_frames=max_c,
                                  pipeline_depth=pipeline_depth)
            self._stream_vocoder = sv

        spks = np.asarray([spk], np.int32) if spk is not None else None

        def acoustic_mel(i: int, sentence: str) -> np.ndarray:
            ids = self.tokenize(sentence)
            t_x = self._bucket(len(ids), self.text_buckets)
            ids = ids[:t_x]
            x = np.zeros((1, t_x), np.int32)
            x[0, : len(ids)] = ids
            x_lengths = np.asarray([len(ids)], np.int32)
            x, x_lengths = jnp.asarray(x), jnp.asarray(x_lengths)
            t_y = self.predict_frame_bucket(x, x_lengths, length_scale,
                                            spks)
            out = _acoustic(self.matcha_params, jax.random.PRNGKey(seed + i),
                            x, x_lengths, self.matcha_cfg,
                            n_timesteps=n_timesteps, t_y_max=t_y,
                            temperature=temperature,
                            length_scale=length_scale, spks=spks,
                            compute_dtype=self.compute_dtype)
            y_len = int(np.asarray(out.y_lengths)[0])
            return np.asarray(out.mel)[0, :, :y_len].T  # (T_valid, n_mels)

        sentences = self.split_text(text)
        if lookahead_sentences <= 0 or len(sentences) <= 1:
            for i, sentence in enumerate(sentences):
                yield from sv.stream(acoustic_mel(i, sentence))
            return

        # producer thread runs the acoustic stage `lookahead_sentences`
        # ahead; its blocking host fetches overlap the consumer's vocoder
        # window fetches.  Bounded queue keeps device memory bounded;
        # exceptions are forwarded and re-raised in order.
        import queue
        import threading

        q: "queue.Queue" = queue.Queue(maxsize=lookahead_sentences)
        _DONE = object()

        def producer():
            try:
                for i, sentence in enumerate(sentences):
                    q.put(("mel", acoustic_mel(i, sentence)))
            except BaseException as e:  # noqa: BLE001 — forwarded
                q.put(("err", e))
                return
            q.put((_DONE, None))

        th = threading.Thread(target=producer, daemon=True)
        th.start()
        try:
            while True:
                kind, payload = q.get()
                if kind is _DONE:
                    break
                if kind == "err":
                    raise payload
                yield from sv.stream(payload)
        finally:
            th.join(timeout=0.1)

    def synthesize_long(self, text: str, silence_ms: float = 100.0,
                        crossfade_ms: float = 0.0, mesh=None,
                        keep_aux: bool = True, **kw) -> SynthesisResult:
        """Chunked long-form synthesis.

        Chunks are joined with short silences (default) or, with
        `crossfade_ms > 0`, overlap-added under a linear crossfade.  With a
        `mesh`, chunks are synthesized as one batch sharded over the data
        axis (BASELINE config 5: long-form streaming across a pod);
        otherwise as one *local* batch — sentences of a paragraph are
        independent, so they amortize the MXU batch dim exactly like
        `synthesize_batch` (sequential batch-1 ran ~10x slower per
        paragraph, benchmarks/longform_bench.py).

        `keep_aux=False` skips materializing the concatenated mel and the
        alignment in the result (they stay lazy device buffers otherwise
        fetched per chunk at ~29 ms + 25 ms/MB on a tunneled TPU): at
        book scale the aux fetches cost more than the synthesis — 439
        chunks fetched ~26 s of mel/attn and held ~1.5 GB of host RSS
        for a 30-minute audiobook (benchmarks/longform_bench.py
        --book-seconds)."""
        chunks = self.split_text(text)
        sr = self.matcha_cfg.audio.sample_rate
        wavs, mels, attns = [], [], []
        if mesh is not None and len(chunks) > 1:
            results = self.synthesize_batch_sharded(chunks, mesh, **kw)
        elif len(chunks) > 1:
            results = self.synthesize_batch(chunks, **kw)
        else:
            seed = kw.pop("seed", 0)
            results = [self.synthesize(c, seed=seed + i, **kw)
                       for i, c in enumerate(chunks)]
        for r in results:
            wavs.append(r.wav)
            if keep_aux:
                mels.append(r.mel)
                attns.append(r.attn)

        if not wavs:
            wav = np.zeros(0, np.float32)
        elif crossfade_ms > 0:
            n_fade = max(1, int(sr * crossfade_ms / 1000.0))
            fade_in = np.linspace(0.0, 1.0, n_fade, dtype=np.float32)
            wav = wavs[0]
            for w in wavs[1:]:
                n = min(n_fade, len(wav), len(w))
                head, overlap_a = wav[: len(wav) - n], wav[len(wav) - n:]
                overlap_b, tail = w[:n], w[n:]
                mixed = overlap_a * fade_in[:n][::-1] + overlap_b * fade_in[:n]
                wav = np.concatenate([head, mixed, tail])
        else:
            gap = np.zeros(int(sr * silence_ms / 1000.0), np.float32)
            wav = np.concatenate(
                [w for pair in zip(wavs, [gap] * len(wavs)) for w in pair][:-1]
            )
        return SynthesisResult(
            wav=wav,
            mel=np.concatenate(mels, axis=1) if mels else np.zeros((0, 0)),
            attn=attns[0] if attns else np.zeros((0, 0)),
            rtf_breakdown={},
        )

    def synthesize_batch_sharded(self, texts: Sequence[str], mesh,
                                 n_timesteps: int = 10,
                                 temperature: float = 0.667,
                                 length_scale: float = 1.0,
                                 seed: int = 0,
                                 spk: Optional[int] = None,
                                 ) -> List[SynthesisResult]:
        """Pod-scale batched synthesis: the batch axis is sharded over the
        mesh's "data" axis, so each chip vocodes its shard and XLA keeps
        everything local (no collectives needed for inference).

        Texts are padded to a multiple of the mesh size per bucket group.
        `spk` applies to the whole batch, as in `synthesize_batch`
        (reference multi-speaker conditioning: model.py:527-528,977-979).
        """
        from matcha_tts_tpu.parallel import mesh as pmesh

        n_dev = mesh.devices.size
        encoded = [self.tokenize(t) for t in texts]
        results: List[Optional[SynthesisResult]] = [None] * len(texts)

        groups = {}
        for i in range(len(texts)):
            t_x = self._bucket(len(encoded[i]), self.text_buckets)
            groups.setdefault(t_x, []).append(i)

        sharding = pmesh.batch_sharding(mesh)
        for t_x, idxs in groups.items():
            b = -(-len(idxs) // n_dev) * n_dev  # round up to mesh size
            x = np.zeros((b, t_x), np.int32)
            x_lengths = np.ones((b,), np.int32)
            for row, i in enumerate(idxs):
                ids = encoded[i][:t_x]  # truncate past the largest bucket
                x[row, : len(ids)] = ids
                x_lengths[row] = len(ids)
            noise_ids = np.zeros((b,), np.int32)
            for row, i in enumerate(idxs):
                noise_ids[row] = self._noise_id(encoded[i][:t_x])
            xd = jax.device_put(x, sharding)
            xld = jax.device_put(x_lengths, sharding)
            nid = jax.device_put(noise_ids, sharding)
            spks = (jax.device_put(np.full((b,), spk, np.int32), sharding)
                    if spk is not None else None)
            t_y = self.predict_frame_bucket(
                xd, xld, length_scale, spks=spks,
                buckets=self.batch_frame_buckets)
            self.stats["calls"] += 1
            packed, out = _synthesize_packed(
                self.matcha_params, self.vocoder_params,
                jax.random.PRNGKey(seed), xd, xld,
                self.matcha_cfg, self.hifi_cfg, n_timesteps, t_y,
                temperature, length_scale, spks=spks,
                compute_dtype=self.compute_dtype,
                bias_spec=self._bias_spec,
                denoise_strength=self.denoise_strength,
                noise_ids=nid,
            )
            hop = self.hifi_cfg.total_upsample
            cache: list = [None]
            for row, i in enumerate(idxs):
                results[i] = LazySynthesisResult(
                    packed, out, row=row, batch=b, t_wav=t_y * hop,
                    hop=hop, shared_cache=cache)
        return results  # type: ignore

    def synthesize_batch(self, texts: Sequence[str], n_timesteps: int = 10,
                         temperature: float = 0.667, length_scale: float = 1.0,
                         seed: int = 0,
                         spk: Optional[int] = None) -> List[SynthesisResult]:
        """Batched synthesis: group utterances into one padded batch per
        (batch, text) bucket pair, amortizing the U-Net across the MXU
        batch dim.  The batch dim is padded up to `batch_buckets` so
        arrival-driven sizes reuse compiled graphs (serving-critical).
        `spk` applies to the whole batch (the serving batcher groups
        requests by speaker).

        Runs the same fused packed graph as the single path — including
        the in-graph denoiser when the Synthesizer was built with
        `denoise_strength > 0` — and returns lazy results whose rows share
        ONE packed int16 device->host transfer; mel/attention are fetched
        only on access."""
        encoded = [self.tokenize(t) for t in texts]
        order = sorted(range(len(texts)), key=lambda i: len(encoded[i]))
        results: List[Optional[SynthesisResult]] = [None] * len(texts)

        groups = {}
        for i in order:
            t_x = self._bucket(len(encoded[i]), self.text_buckets)
            groups.setdefault(t_x, []).append(i)

        max_b = self.batch_buckets[-1]
        for t_x, all_idxs in groups.items():
            for start in range(0, len(all_idxs), max_b):
                idxs = all_idxs[start : start + max_b]
                b = self._bucket(len(idxs), self.batch_buckets)
                # pad rows are all-zero tokens of length 1: cheapest valid
                # utterance; their duration cannot raise the frame bucket
                x = np.zeros((b, t_x), np.int32)
                x_lengths = np.ones((b,), np.int32)
                for row, i in enumerate(idxs):
                    ids = encoded[i][:t_x]
                    x[row, : len(ids)] = ids
                    x_lengths[row] = len(ids)
                xd, xld = jnp.asarray(x), jnp.asarray(x_lengths)
                spks = (np.full((b,), spk, np.int32)
                        if spk is not None else None)
                # content-keyed noise: a request's noise is independent of
                # row order and co-batched requests (pad rows get id 0)
                noise_ids = np.zeros((b,), np.int32)
                for row, i in enumerate(idxs):
                    noise_ids[row] = self._noise_id(encoded[i][:t_x])
                t_y = self.predict_frame_bucket(
                    xd, xld, length_scale, spks=spks,
                    buckets=self.batch_frame_buckets)
                self._check_vocoder_memory(b, t_y)
                self.stats["calls"] += 1
                packed, out = _synthesize_packed(
                    self.matcha_params, self.vocoder_params,
                    jax.random.PRNGKey(seed), xd, xld,
                    self.matcha_cfg, self.hifi_cfg, n_timesteps, t_y,
                    temperature, length_scale, spks=spks,
                    compute_dtype=self.compute_dtype,
                    bias_spec=self._bias_spec,
                    denoise_strength=self.denoise_strength,
                    noise_ids=jnp.asarray(noise_ids),
                )
                hop = self.hifi_cfg.total_upsample
                cache: list = [None]
                for row, i in enumerate(idxs):
                    results[i] = LazySynthesisResult(
                        packed, out, row=row, batch=b, t_wav=t_y * hop,
                        hop=hop, shared_cache=cache)
        return results  # type: ignore
