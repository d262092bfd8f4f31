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


def resample_to_16k(wav: np.ndarray, sr: int) -> np.ndarray:
    """Whisper expects 16 kHz; linear-interp resample (host-side, eval-only)."""
    t_src = np.arange(len(wav)) / sr
    t_dst = np.arange(int(len(wav) * 16000 / sr)) / 16000
    return np.interp(t_dst, t_src, wav).astype(np.float32)


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
