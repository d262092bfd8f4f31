"""Audio feature pipeline parity tests vs torch (L1).

The reference computes log-mels with torch.stft + librosa filterbank
(train_standalone.py:164-201).  We verify our XLA pipeline matches a torch
CPU reimplementation of those exact semantics to fp32 tolerance.
"""

import numpy as np
import pytest
import torch

from matcha_tts_tpu.ops import log_mel_spectrogram, istft, stft_magnitude_and_phase
from matcha_tts_tpu.ops.mel import mel_filterbank
from matcha_tts_tpu.ops.stft import hann_window


def slaney_filterbank_oracle(sr=22050, n_fft=1024, n_mels=80, fmin=0.0,
                             fmax=8000.0) -> np.ndarray:
    """Independent oracle for librosa.filters.mel(htk=False, norm="slaney")
    (the reference's filterbank, train_standalone.py:172-174).

    Deliberately does NOT share code with ops/mel.py: each triangle is
    built pointwise from its three corner frequencies (rising/falling
    edges), rather than ops/mel.py's vectorized lower/upper-ramp min.
    Slaney scale per the Auditory Toolbox: linear below 1 kHz at
    3/200 mel/Hz, logarithmic above with 27 steps per ln(6.4)."""

    def to_mel(f):
        if f < 1000.0:
            return 3.0 * f / 200.0
        return 15.0 + 27.0 * np.log(f / 1000.0) / np.log(6.4)

    def to_hz(m):
        if m < 15.0:
            return 200.0 * m / 3.0
        return 1000.0 * np.exp(np.log(6.4) * (m - 15.0) / 27.0)

    n_freqs = 1 + n_fft // 2
    fft_freqs = np.arange(n_freqs) * (sr / 2.0) / (n_freqs - 1)
    mel_edges = np.linspace(to_mel(fmin), to_mel(fmax), n_mels + 2)
    hz_edges = np.array([to_hz(m) for m in mel_edges])
    fb = np.zeros((n_mels, n_freqs))
    for m in range(n_mels):
        f_lo, f_c, f_hi = hz_edges[m], hz_edges[m + 1], hz_edges[m + 2]
        for k, f in enumerate(fft_freqs):
            if f_lo < f < f_c:
                fb[m, k] = (f - f_lo) / (f_c - f_lo)
            elif f_c <= f < f_hi:
                fb[m, k] = (f_hi - f) / (f_hi - f_c)
        fb[m] *= 2.0 / (f_hi - f_lo)  # Slaney area normalization
    return fb


def torch_log_mel(y: torch.Tensor, n_fft=1024, num_mels=80, sr=22050, hop=256, win=1024,
                  fmin=0.0, fmax=8000.0) -> torch.Tensor:
    """Reference mel semantics (train_standalone.py:164-201) on torch CPU.
    The filterbank comes from the independent in-test oracle, so this
    expectation shares nothing with the code under test."""
    fb = torch.from_numpy(
        slaney_filterbank_oracle(sr, n_fft, num_mels, fmin, fmax).astype(np.float32))
    window = torch.hann_window(win)
    pad = int((n_fft - hop) / 2)
    y = torch.nn.functional.pad(y.unsqueeze(1), (pad, pad), mode="reflect").squeeze(1)
    spec = torch.view_as_real(
        torch.stft(y, n_fft, hop_length=hop, win_length=win, window=window,
                   center=False, pad_mode="reflect", normalized=False,
                   onesided=True, return_complex=True)
    )
    spec = torch.sqrt(spec.pow(2).sum(-1) + 1e-9)
    spec = torch.matmul(fb, spec)
    return torch.log(torch.clamp(spec, min=1e-5))


def test_hann_window_matches_torch():
    ours = hann_window(1024)
    theirs = torch.hann_window(1024).numpy()
    np.testing.assert_allclose(ours, theirs, atol=1e-6)


def test_mel_filterbank_properties():
    fb = mel_filterbank(22050, 1024, 80, 0.0, 8000.0)
    assert fb.shape == (80, 513)
    # triangles are non-negative and every filter has support
    assert (fb >= 0).all()
    assert (fb.sum(axis=1) > 0).all()
    # energy above fmax bin must be zero
    fmax_bin = int(np.ceil(8000.0 / (22050 / 2) * 512)) + 1
    assert fb[:, fmax_bin + 1:].sum() == 0


def test_mel_filterbank_matches_independent_oracle():
    """ops/mel.py vs the pointwise in-test Slaney construction — kills the
    circular-oracle weakness where the torch mirror imported our own
    filterbank."""
    for sr, n_fft, n_mels, fmin, fmax in [
        (22050, 1024, 80, 0.0, 8000.0),   # acoustic band (LJSpeech)
        (22050, 1024, 80, 0.0, 11025.0),  # full band (GAN loss mel)
        (16000, 512, 40, 50.0, 7600.0),
    ]:
        ours = mel_filterbank(sr, n_fft, n_mels, fmin, fmax)
        oracle = slaney_filterbank_oracle(sr, n_fft, n_mels, fmin, fmax)
        np.testing.assert_allclose(ours, oracle.astype(np.float32),
                                   atol=1e-7, err_msg=f"{(sr, n_fft, n_mels)}")


def test_mel_filterbank_analytic_invariants():
    """Model-free checks derivable from the Slaney definition alone."""
    sr, n_fft = 22050, 1024
    fb = mel_filterbank(sr, n_fft, 80, 0.0, 8000.0).astype(np.float64)
    df = (sr / 2.0) / (n_fft // 2)
    # Slaney normalization makes each triangle have unit area in Hz:
    # sum_k w[m,k] * df ~= 1 once the triangle spans several bins
    # (narrow low-frequency triangles are under-resolved by the grid).
    areas = fb.sum(axis=1) * df
    assert np.all(np.abs(areas[40:] - 1.0) < 0.02), areas[40:]
    # each filter peaks at the bin nearest its center frequency, and
    # center frequencies increase monotonically
    peaks = fb.argmax(axis=1)
    assert (np.diff(peaks) >= 0).all()
    # the first ~15 mel points are linearly spaced below 1 kHz: centers
    # of the first filters sit at multiples of (1000/15)/(80ish) spacing —
    # check the linear-region edge: filter centered nearest 1 kHz
    fft_freqs = np.arange(513) * df
    assert abs(fft_freqs[peaks[0]]) < 100.0  # first center near DC
    # support never exceeds fmax
    assert fb[:, fft_freqs > 8000.0 + df].sum() == 0.0


def test_log_mel_matches_torch_reference():
    rng = np.random.default_rng(0)
    y = (rng.standard_normal((2, 22050), dtype=np.float32) * 0.3).clip(-1, 1)
    ours = np.asarray(log_mel_spectrogram(y))
    theirs = torch_log_mel(torch.from_numpy(y)).numpy()
    assert ours.shape == theirs.shape == (2, 80, (22050 + 2 * 384 - 1024) // 256 + 1)
    np.testing.assert_allclose(ours, theirs, atol=2e-4, rtol=1e-4)


def test_stft_matches_torch_center_true():
    rng = np.random.default_rng(1)
    y = rng.standard_normal((22050,), dtype=np.float32) * 0.1
    mag, phase = stft_magnitude_and_phase(y, 1024, 256, 1024, center=True)
    spec_t = torch.stft(torch.from_numpy(y), 1024, hop_length=256, win_length=1024,
                        window=torch.hann_window(1024), center=True, return_complex=True)
    mag_t = spec_t.abs().numpy()
    np.testing.assert_allclose(np.asarray(mag), mag_t, atol=2e-3)


@pytest.mark.parametrize("length", [22050, 8000])
def test_istft_roundtrip(length):
    rng = np.random.default_rng(2)
    y = rng.standard_normal((length,), dtype=np.float32) * 0.5
    mag, phase = stft_magnitude_and_phase(y, 1024, 256, 1024, center=True)
    y_rec = np.asarray(istft(mag, phase, 1024, 256, 1024, length=length))
    assert y_rec.shape == (length,)
    # torch.istft semantics: only hop*(n_frames-1) samples are recoverable
    n_rec = 256 * (length // 256)
    np.testing.assert_allclose(y_rec[:n_rec], y[:n_rec], atol=5e-3)


def test_istft_matches_torch():
    rng = np.random.default_rng(3)
    y = rng.standard_normal((11025,), dtype=np.float32)
    win = torch.hann_window(1024)
    spec = torch.stft(torch.from_numpy(y), 1024, hop_length=256, window=win,
                      center=True, return_complex=True)
    mag_t, ang_t = spec.abs(), spec.angle()
    rec_t = torch.istft(torch.polar(mag_t, ang_t), 1024, hop_length=256,
                        win_length=1024, window=win).numpy()
    rec_j = np.asarray(istft(mag_t.numpy(), ang_t.numpy(), 1024, 256, 1024))
    n = min(rec_t.shape[-1], rec_j.shape[-1])
    np.testing.assert_allclose(rec_j[:n], rec_t[:n], atol=5e-3)
