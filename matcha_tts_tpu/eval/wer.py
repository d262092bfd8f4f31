"""Word-error-rate metric plumbing (the reference's jiwer surface).

The reference computes WER with Whisper-medium + jiwer over 10 synthesized
sentences (MOS_audiou_generator.ipynb cells 13-14).  jiwer is not
installed here, so `word_error_rate` is a self-contained Levenshtein
implementation with identical semantics for plain word sequences.
"""

from __future__ import annotations

import re

import numpy as np


def word_error_rate(ref: str, hyp: str) -> float:
    """Levenshtein WER (jiwer-equivalent for plain word sequences)."""
    r, h = ref.lower().split(), hyp.lower().split()
    d = np.zeros((len(r) + 1, len(h) + 1), np.int32)
    d[:, 0] = np.arange(len(r) + 1)
    d[0, :] = np.arange(len(h) + 1)
    for i in range(1, len(r) + 1):
        for j in range(1, len(h) + 1):
            sub = d[i - 1, j - 1] + (r[i - 1] != h[j - 1])
            d[i, j] = min(sub, d[i - 1, j] + 1, d[i, j - 1] + 1)
    return float(d[len(r), len(h)]) / max(len(r), 1)


def normalize_for_wer(text: str) -> str:
    text = text.lower()
    text = re.sub(r"[^a-z' ]", " ", text)
    return re.sub(r"\s+", " ", text).strip()


def resample(wav: np.ndarray, sr_in: int, sr_out: int) -> np.ndarray:
    """Polyphase windowed-sinc resample (host-side, eval-only).

    The reference's WER loop hands torchaudio-resampled 16 kHz audio to
    Whisper; a linear-interp stand-in attenuates content near Nyquist by
    sinc^2 (measured: 7.3 kHz tones lost ~half their energy through the
    22.05k->16k->22.05k round trip, breaking the tone-corpus judge), so
    this is a real anti-aliased resampler.  Output length matches the
    int(len * sr_out / sr_in) convention of the old linear version.
    """
    if sr_in == sr_out:
        return np.asarray(wav, np.float32)
    from math import gcd

    from scipy.signal import resample_poly

    g = gcd(sr_in, sr_out)
    out = resample_poly(np.asarray(wav, np.float64), sr_out // g, sr_in // g)
    n = int(len(wav) * sr_out / sr_in)
    if len(out) < n:
        out = np.pad(out, (0, n - len(out)))
    return out[:n].astype(np.float32)


def resample_to_16k(wav: np.ndarray, sr: int) -> np.ndarray:
    """Whisper expects 16 kHz (MOS_audiou_generator.ipynb cell 13)."""
    return resample(wav, sr, 16000)


def evaluate_wer(sentences, wavs, sr: int, asr) -> dict:
    """Intelligibility evaluation (MOS_audiou_generator.ipynb cells 13-14):
    resample each synthesized wav to 16 kHz, transcribe with `asr`
    (a callable wav16k -> hypothesis string), and aggregate WER against
    the normalized ground-truth sentences."""
    wers, hyps = [], []
    for s, w in zip(sentences, wavs):
        hyp = asr(resample_to_16k(np.asarray(w, np.float32), sr))
        hyps.append(hyp)
        wers.append(word_error_rate(normalize_for_wer(s),
                                    normalize_for_wer(hyp)))
    return {"mean_wer": float(np.mean(wers)),
            "per_sentence_wer": [float(w) for w in wers],
            "hypotheses": hyps}
