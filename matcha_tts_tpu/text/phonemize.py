"""Phonemizer bridge (espeak-ng) with graceful fallback.

The reference phonemizes with `phonemizer` -> espeak-ng (a host-side C
library) both at training time (train_standalone.py:79-85,123) and at
inference (main.py:29-41), falling back to cleaned plain text / a canned
IPA string when the package is absent.  Phonemization is inherently a
host-CPU step in both worlds; on TPU it runs in the input pipeline, never
on device.

We expose the same behavior: use espeak if importable, otherwise fall back
to the cleaned text (whose ASCII letters are all in the symbol table, so
the model still receives valid token ids).
"""

from __future__ import annotations

import functools
import logging
from typing import List

from matcha_tts_tpu.text import cleaners

logger = logging.getLogger(__name__)


@functools.lru_cache(maxsize=1)
def _espeak_backend():
    """Build the espeak backend once (reference: train_standalone.py:76-85)."""
    try:
        import phonemizer  # type: ignore

        crit = logging.getLogger("phonemizer")
        crit.setLevel(logging.CRITICAL)
        return phonemizer.backend.EspeakBackend(
            language="en-us",
            preserve_punctuation=True,
            with_stress=True,
            language_switch="remove-flags",
            logger=crit,
        )
    except Exception:  # pragma: no cover - depends on host install
        return None


def phonemizer_available() -> bool:
    return _espeak_backend() is not None


def phonemize(text: str) -> str:
    """text -> IPA phoneme string via espeak-ng; identity fallback.

    Matches `english_cleaners2` (reference: train_standalone.py:110-126):
    ascii-fold, lowercase, expand abbreviations, phonemize (strip),
    remove brackets, collapse whitespace.  Without espeak, returns the
    cleaned (non-phonemized) text like the reference fallback
    (train_standalone.py:112-118).
    """
    cleaned = cleaners.english_cleaners_pre_phonemize(text)
    backend = _espeak_backend()
    if backend is None:
        return cleaners.collapse_whitespace(cleaned)
    phonemes = backend.phonemize([cleaned], strip=True, njobs=1)[0]
    return cleaners.english_cleaners_post_phonemize(phonemes)


def phonemize_batch(texts: List[str]) -> List[str]:
    """Batch phonemization (one espeak call; cheaper than per-item)."""
    cleaned = [cleaners.english_cleaners_pre_phonemize(t) for t in texts]
    backend = _espeak_backend()
    if backend is None:
        return [cleaners.collapse_whitespace(c) for c in cleaned]
    phonemes = backend.phonemize(cleaned, strip=True, njobs=1)
    return [cleaners.english_cleaners_post_phonemize(p) for p in phonemes]
