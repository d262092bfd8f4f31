"""Dataset mel statistics: the `data_statistics` the reference bakes in.

The reference normalizes every training mel with per-dataset constants
(train_standalone.py:422 `normalize(mel, mel_mean, mel_std)`) but ships
only the LJSpeech values hardcoded at train_standalone.py:802-805.  For
any other corpus those constants are wrong — silence lands standard
deviations away from zero, inflating the CFM padding floor and handing
the flow a badly conditioned target.  Upstream Matcha-TTS solves this
with a one-off `generate_data_statistics` pass over the training
filelist; this module is that pass, TPU-first: the log-mel runs on
device through the same `ops/stft.py` kernel training uses, one jit per
frame bucket, with masked accumulation so padding never biases the
moments.
"""

from __future__ import annotations

import functools
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from matcha_tts_tpu.config import AudioConfig
from matcha_tts_tpu.ops.stft import log_mel_spectrogram


@functools.partial(jax.jit, static_argnames=("sample_rate", "n_fft",
                                             "n_mels", "hop", "win",
                                             "f_min", "f_max"))
def _masked_moments(audio, n_frames, sample_rate, n_fft, n_mels, hop, win,
                    f_min, f_max):
    """(B, L) padded audio -> masked (sum, sum_sq, count) of its log-mel."""
    mel = log_mel_spectrogram(audio, sample_rate, n_fft, n_mels, hop, win,
                              f_min, f_max)  # (B, n_mels, T)
    t = mel.shape[-1]
    # per-batch sums are fp32 on device; the caller accumulates fp64 on host
    mask = (jnp.arange(t)[None, :] < n_frames[:, None])[:, None, :]
    mel = jnp.where(mask, mel.astype(jnp.float32), 0.0)
    count = jnp.sum(n_frames).astype(jnp.float32) * n_mels
    return jnp.sum(mel), jnp.sum(jnp.square(mel)), count


def compute_mel_statistics(
    filelist_path,
    audio: AudioConfig,
    batch_size: int = 8,
    frame_buckets: Sequence[int] = (256, 512, 1024, 2048),
) -> Tuple[float, float]:
    """Masked mean/std of the log-mel over a `wav_path|text` filelist.

    Matches what the reference's hardcoded `data_statistics`
    (train_standalone.py:802-805) are FOR: the moments of the
    unnormalized training mels.  Batches are padded to static frame
    buckets so the device sees one compile per bucket.
    """
    from matcha_tts_tpu.data.dataset import load_wav, parse_filelist

    a = audio
    entries = parse_filelist(filelist_path)
    pad = int((a.n_fft - a.hop_length) / 2)

    def wav_samples_for(t_y: int) -> int:
        return (t_y - 1) * a.hop_length + a.n_fft - 2 * pad

    total = np.zeros(3, np.float64)  # sum, sum_sq, count
    buckets = sorted(frame_buckets)

    def flush(group, t_y):
        wav_len = wav_samples_for(t_y)
        b = len(group)
        batch = np.zeros((b, wav_len), np.float32)
        n_frames = np.zeros((b,), np.int32)
        for i, (w, nf) in enumerate(group):
            m = min(len(w), wav_len)
            batch[i, :m] = w[:m]
            n_frames[i] = min(nf, t_y)
        s, sq, c = _masked_moments(jnp.asarray(batch), jnp.asarray(n_frames),
                                   a.sample_rate, a.n_fft, a.n_mels,
                                   a.hop_length, a.win_length, a.f_min,
                                   a.f_max)
        total[0] += float(s)
        total[1] += float(sq)
        total[2] += float(c)

    # group utterances by frame bucket so shapes stay static per batch
    groups: dict = {b: [] for b in buckets}
    for parts in entries:
        wav, sr = load_wav(parts[0])
        assert sr == a.sample_rate, (
            f"{parts[0]}: expected {a.sample_rate} Hz, got {sr}")
        nf = 1 + (len(wav) + 2 * pad - a.n_fft) // a.hop_length
        t_y = next((b for b in buckets if nf <= b), buckets[-1])
        groups[t_y].append((wav, nf))
        if len(groups[t_y]) == batch_size:
            flush(groups[t_y], t_y)
            groups[t_y] = []
    for t_y, group in groups.items():
        if group:
            flush(group, t_y)

    mean = total[0] / total[2]
    var = total[1] / total[2] - mean * mean
    return float(mean), float(np.sqrt(max(var, 0.0)))
