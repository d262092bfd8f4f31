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


def torch_log_mel(y: torch.Tensor, n_fft=1024, num_mels=80, sr=22050, hop=256, win=1024,
                  fmin=0.0, fmax=8000.0) -> torch.Tensor:
    """Reference mel semantics (train_standalone.py:164-201) on torch CPU,
    with our own filterbank standing in for librosa's."""
    fb = torch.from_numpy(mel_filterbank(sr, n_fft, num_mels, fmin, fmax))
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
