"""WER utility tests (benchmarks/evaluate.py)."""

import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).parent.parent))

from benchmarks.evaluate import (evaluate_wer, normalize_for_wer,
                                 resample_to_16k, word_error_rate)


def test_wer_zero_for_identical():
    assert word_error_rate("the cat sat", "the cat sat") == 0.0


def test_wer_counts_errors():
    assert word_error_rate("a b c d", "a x c") == 0.5  # 1 sub + 1 del
    assert word_error_rate("a", "b c") == 2.0


def test_normalize():
    assert normalize_for_wer("Hello, World! It's 'fine'.") == "hello world it's 'fine'"


def test_resample_preserves_tone():
    """440 Hz sine at 22.05 kHz resampled to 16 kHz keeps its frequency."""
    sr = 22050
    t = np.arange(sr) / sr
    w = np.sin(2 * np.pi * 440.0 * t).astype(np.float32)
    w16 = resample_to_16k(w, sr)
    assert w16.dtype == np.float32
    assert len(w16) == 16000
    spec = np.abs(np.fft.rfft(w16 * np.hanning(len(w16))))
    peak_hz = np.argmax(spec) * 16000 / len(w16)
    assert abs(peak_hz - 440.0) < 2.0, peak_hz


def test_evaluate_wer_plumbing_with_stub_asr():
    """Drives the full WER path (resample -> transcribe -> normalize ->
    aggregate) with a stub ASR, proving the harness works end-to-end
    without Whisper weights (MOS_audiou_generator.ipynb cells 13-14
    semantics)."""
    sentences = ["The cat sat on the mat.", "Hello world"]
    sr = 22050
    rng = np.random.default_rng(0)
    wavs = [rng.standard_normal(22050).astype(np.float32) * 0.1,
            rng.standard_normal(11025).astype(np.float32) * 0.1]

    seen_lengths = []
    hypotheses = iter(["the cat sat on the hat", "Hello, world!"])

    def stub_asr(wav16k):
        assert wav16k.dtype == np.float32
        seen_lengths.append(len(wav16k))
        return next(hypotheses)

    out = evaluate_wer(sentences, wavs, sr, stub_asr)
    # the ASR saw 16 kHz-resampled audio of the right durations
    assert seen_lengths == [16000, 8000]
    # sentence 1: one substitution over 6 words; sentence 2: exact after
    # normalization
    np.testing.assert_allclose(out["per_sentence_wer"], [1.0 / 6.0, 0.0])
    np.testing.assert_allclose(out["mean_wer"], (1.0 / 6.0) / 2.0)
    assert out["hypotheses"][1] == "Hello, world!"
