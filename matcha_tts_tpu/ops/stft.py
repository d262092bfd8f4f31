"""On-device STFT / log-mel / iSTFT pipeline (XLA, jittable).

Replaces the reference's host-side `torch.stft` feature extraction
(reference: /root/reference/train_standalone.py:164-201) and the denoiser's
stft/istft pair (hifigan/denoiser.py:29-54) with pure-XLA framing + rfft on
device, so features never leave HBM.

Numerics are matched to the reference:
* log-mel path: reflect-pad by (n_fft - hop)/2 on both sides, center=False,
  periodic Hann window, |X| = sqrt(re^2 + im^2 + 1e-9), mel matmul,
  log(clamp(., 1e-5))                         (train_standalone.py:177-199)
* denoiser path: center=True (reflect pad n_fft/2), magnitude WITHOUT the
  1e-9 epsilon and phase angle                 (hifigan/denoiser.py:29-39)
* istft: complex OLA with Hann window and window-square normalization,
  center trim                                  (hifigan/denoiser.py:48-54)
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from matcha_tts_tpu.ops.mel import mel_filterbank


@functools.lru_cache(maxsize=8)
def hann_window(win_length: int) -> np.ndarray:
    """Periodic Hann window, equal to `torch.hann_window(win_length)`."""
    n = np.arange(win_length, dtype=np.float64)
    return (0.5 - 0.5 * np.cos(2.0 * np.pi * n / win_length)).astype(np.float32)


def frame_signal(y: jnp.ndarray, n_fft: int, hop_length: int) -> jnp.ndarray:
    """(..., L) -> (..., n_frames, n_fft) sliding frames, center=False.

    n_frames = 1 + (L - n_fft) // hop.  When hop divides n_fft (all the
    reference configurations: 1024/256), framing is R = n_fft/hop shifted
    views of the (L/hop, hop) reshape concatenated on the last axis — pure
    slices, no gather."""
    length = y.shape[-1]
    n_frames = 1 + (length - n_fft) // hop_length
    if n_fft % hop_length == 0:
        r = n_fft // hop_length
        n_blocks = length // hop_length
        blocks = y[..., : n_blocks * hop_length].reshape(
            y.shape[:-1] + (n_blocks, hop_length)
        )
        # frame t = blocks[t : t + r] concatenated
        parts = [blocks[..., c : c + n_frames, :] for c in range(r)]
        return jnp.concatenate(parts, axis=-1)
    idx = (
        np.arange(n_frames, dtype=np.int32)[:, None] * hop_length
        + np.arange(n_fft, dtype=np.int32)[None, :]
    )
    return jnp.take(y, jnp.asarray(idx), axis=-1)


def reflect_pad(y: jnp.ndarray, pad: int) -> jnp.ndarray:
    """Reflect padding on the last axis (matches F.pad mode='reflect')."""
    return jnp.pad(y, [(0, 0)] * (y.ndim - 1) + [(pad, pad)], mode="reflect")


def stft_magnitude_and_phase(
    y: jnp.ndarray,
    n_fft: int = 1024,
    hop_length: int = 256,
    win_length: int = 1024,
    center: bool = True,
    magnitude_eps: float = 0.0,
):
    """STFT returning (magnitude, phase), shapes (..., n_freqs, n_frames).

    `center=True` reflect-pads by n_fft // 2 like torch.stft's default
    (used by the denoiser); the log-mel path pads externally and calls with
    center=False.
    """
    if center:
        y = reflect_pad(y, n_fft // 2)
    window = jnp.asarray(hann_window(win_length))
    if win_length < n_fft:  # torch zero-pads the window to n_fft centered
        lpad = (n_fft - win_length) // 2
        window = jnp.pad(window, (lpad, n_fft - win_length - lpad))
    frames = frame_signal(y, n_fft, hop_length) * window
    spec = jnp.fft.rfft(frames, n=n_fft, axis=-1)
    re, im = jnp.real(spec), jnp.imag(spec)
    if magnitude_eps:
        mag = jnp.sqrt(re * re + im * im + magnitude_eps)
    else:
        mag = jnp.sqrt(re * re + im * im)
    phase = jnp.arctan2(im, re)
    # torch.stft returns (freq, time); move frames last
    return jnp.moveaxis(mag, -2, -1), jnp.moveaxis(phase, -2, -1)


def log_mel_spectrogram(
    y: jnp.ndarray,
    sample_rate: int = 22050,
    n_fft: int = 1024,
    n_mels: int = 80,
    hop_length: int = 256,
    win_length: int = 1024,
    f_min: float = 0.0,
    f_max: float = 8000.0,
) -> jnp.ndarray:
    """(B, L) audio -> (B, n_mels, n_frames) log-mel, reference numerics.

    Matches `mel_spectrogram(..., center=False)`
    (reference: train_standalone.py:164-201): reflect pad (n_fft - hop)/2,
    Hann STFT, sqrt(power + 1e-9), Slaney mel matmul, log(clamp 1e-5).
    """
    pad = int((n_fft - hop_length) / 2)
    y = reflect_pad(y, pad)
    mag, _ = stft_magnitude_and_phase(
        y, n_fft, hop_length, win_length, center=False, magnitude_eps=1e-9
    )
    fb = jnp.asarray(mel_filterbank(sample_rate, n_fft, n_mels, f_min, f_max))
    # (n_mels, n_freqs) @ (..., n_freqs, n_frames); fp32 accumulation on MXU
    mel = jnp.einsum(
        "mf,...ft->...mt", fb, mag, precision=jax.lax.Precision.HIGHEST
    )
    return jnp.log(jnp.clip(mel, min=1e-5))


def istft(
    magnitude: jnp.ndarray,
    phase: jnp.ndarray,
    n_fft: int = 1024,
    hop_length: int = 256,
    win_length: int = 1024,
    length: int | None = None,
) -> jnp.ndarray:
    """Inverse STFT via windowed overlap-add (torch.istft semantics,
    center=True).  magnitude/phase: (..., n_freqs, n_frames) -> (..., L).
    """
    spec = magnitude * jnp.exp(1j * phase.astype(jnp.complex64))
    frames = jnp.fft.irfft(jnp.moveaxis(spec, -2, -1), n=n_fft, axis=-1)

    window = jnp.asarray(hann_window(win_length))
    if win_length < n_fft:
        lpad = (n_fft - win_length) // 2
        window = jnp.pad(window, (lpad, n_fft - win_length - lpad))
    frames = frames * window

    n_frames = frames.shape[-2]
    out_len = n_fft + hop_length * (n_frames - 1)
    batch_shape = frames.shape[:-2]

    if n_fft % hop_length == 0:
        # Overlap-add as R = n_fft/hop shifted block-sums — pure reshapes
        # and adds (the scatter-add formulation costs as much as the whole
        # vocoder on TPU).
        r = n_fft // hop_length
        n_blocks = out_len // hop_length  # = n_frames - 1 + r
        fb = frames.reshape(batch_shape + (n_frames, r, hop_length))
        signal = jnp.zeros(batch_shape + (n_blocks, hop_length), frames.dtype)
        for c in range(r):
            signal = signal.at[..., c : c + n_frames, :].add(fb[..., :, c, :])
        signal = signal.reshape(batch_shape + (out_len,))

        # window-square normalization via the same block structure (host
        # NumPy: depends only on static shapes — rebuild the window on host
        # rather than converting the traced device window)
        w_host = hann_window(win_length).astype(np.float64)
        if win_length < n_fft:
            lpad = (n_fft - win_length) // 2
            w_host = np.pad(w_host, (lpad, n_fft - win_length - lpad))
        wsq = w_host * w_host
        norm = np.zeros(out_len)
        for t in range(n_frames):
            norm[t * hop_length : t * hop_length + n_fft] += wsq
        signal = signal / jnp.asarray(np.maximum(norm, 1e-11), frames.dtype)
    else:
        idx = (
            np.arange(n_frames, dtype=np.int32)[:, None] * hop_length
            + np.arange(n_fft, dtype=np.int32)[None, :]
        ).reshape(-1)
        flat = frames.reshape(batch_shape + (-1,))
        signal = jnp.zeros(batch_shape + (out_len,), dtype=frames.dtype)
        signal = signal.at[..., jnp.asarray(idx)].add(flat)
        wsq = jnp.tile(window * window, (n_frames,))
        norm = jnp.zeros(out_len, dtype=frames.dtype).at[jnp.asarray(idx)].add(wsq)
        signal = signal / jnp.maximum(norm, 1e-11)

    trim = n_fft // 2  # undo center padding
    signal = signal[..., trim : out_len - trim]
    if length is not None:
        # torch.istft(length=L) truncates or zero-pads to exactly L
        cur = signal.shape[-1]
        if length <= cur:
            signal = signal[..., :length]
        else:
            signal = jnp.pad(
                signal, [(0, 0)] * (signal.ndim - 1) + [(0, length - cur)]
            )
    return signal


def normalize_mel(mel: jnp.ndarray, mel_mean: float, mel_std: float) -> jnp.ndarray:
    """Global affine normalization (reference: model.py:84-103)."""
    return (mel - mel_mean) / mel_std


def denormalize_mel(mel: jnp.ndarray, mel_mean: float, mel_std: float) -> jnp.ndarray:
    """Inverse of `normalize_mel` (reference: model.py:106-125)."""
    return mel * mel_std + mel_mean
