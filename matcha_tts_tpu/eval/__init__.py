"""Evaluation subsystem: intelligibility (WER) and the in-repo CTC ASR.

The reference evaluates intelligibility with Whisper-medium + jiwer
(MOS_audiou_generator.ipynb cells 13-14).  This package provides the same
surface without external weights: `wer` holds the jiwer-equivalent metric
plumbing, and `ctc_asr` a small JAX CTC recognizer that can be trained
in-repo so the full synthesize -> transcribe -> WER loop actually executes
(benchmarks/wer_e2e.py).
"""

from matcha_tts_tpu.eval.wer import (evaluate_wer, normalize_for_wer,
                                     resample, resample_to_16k,
                                     word_error_rate)

__all__ = [
    "evaluate_wer",
    "normalize_for_wer",
    "resample",
    "resample_to_16k",
    "word_error_rate",
]
