"""Tokenization: phoneme string -> symbol ids -> blank-interspersed ids.

The reference has two inconsistent `intersperse` variants (SURVEY.md §2.1):
`main.py:52-55` / `train_standalone.py:149-153` pad blanks at *both ends*
(length 2n+1) while `utils.py:127-146` only inserts *between* (2n-1).
Training uses the 2n+1 variant, so that is canonical here; the 2n-1 variant
is available as `intersperse_between` for API parity with utils.py.
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

import numpy as np

from matcha_tts_tpu.text import cleaners
from matcha_tts_tpu.text.phonemize import phonemize
from matcha_tts_tpu.text.symbols import SYMBOL_TO_ID


def phonemes_to_sequence(phonemized_text: str) -> List[int]:
    """Per-character symbol lookup; unknown symbols are skipped
    (reference: main.py:43-50)."""
    return [SYMBOL_TO_ID[s] for s in phonemized_text if s in SYMBOL_TO_ID]


def intersperse(seq: Sequence[int], item: int = 0) -> List[int]:
    """Blank id between tokens AND at both ends -> length 2n+1
    (reference: main.py:52-55)."""
    result = [item] * (len(seq) * 2 + 1)
    result[1::2] = list(seq)
    return result


def intersperse_between(seq: Sequence[int], item: int = 0) -> List[int]:
    """Blank id only between tokens -> length 2n-1
    (reference: utils.py:127-146)."""
    result: List[int] = []
    for i, element in enumerate(seq):
        result.append(element)
        if i < len(seq) - 1:
            result.append(item)
    return result


def text_to_sequence(
    text: str, cleaner_names: Sequence[str] = ("english_cleaners2",)
) -> Tuple[List[int], str]:
    """Text -> (ids, cleaned_text) (reference: train_standalone.py:129-146)."""
    clean_text = text
    for cleaner_name in cleaner_names:
        if cleaner_name == "english_cleaners2":
            clean_text = phonemize(clean_text)
        else:
            clean_text = cleaners.basic_cleaners(clean_text)
    return phonemes_to_sequence(clean_text), clean_text


def encode_text(
    text: str,
    add_blank: bool = True,
    cleaner_names: Sequence[str] = ("english_cleaners2",),
) -> np.ndarray:
    """Full host-side frontend: clean + phonemize + tokenize + intersperse.

    Returns int32 ids of length 2n+1 (when `add_blank`), ready to be padded
    to a static bucket and shipped to device.
    """
    ids, _ = text_to_sequence(text, cleaner_names)
    if add_blank:
        ids = intersperse(ids, 0)
    return np.asarray(ids, dtype=np.int32)


def process_text(text: str, add_blank: bool = True) -> dict:
    """Full frontend returning the reference's dict shape
    (reference: utils.py:24-60): original text, phoneme string, batched
    id array `x` (1, T), and `x_lengths` (1,) — NumPy instead of torch."""
    phonemes = phonemize(text)
    sequence = phonemes_to_sequence(phonemes)
    ids = intersperse(sequence, 0) if add_blank else sequence
    x = np.asarray(ids, dtype=np.int32)[None, :]
    return {
        "x_orig": text,
        "x_phones": phonemes,
        "x": x,
        "x_lengths": np.asarray([x.shape[-1]], dtype=np.int32),
        "sequence": sequence,
    }


def pad_to_bucket(ids: np.ndarray, buckets: Sequence[int]) -> Tuple[np.ndarray, int]:
    """Right-pad token ids to the smallest bucket >= len(ids).

    Static bucket shapes keep XLA from recompiling per utterance length
    (replacing the reference's dynamic max-length padding,
    train_standalone.py:446-452).
    """
    n = len(ids)
    for b in buckets:
        if n <= b:
            out = np.zeros(b, dtype=np.int32)
            out[:n] = ids
            return out, n
    raise ValueError(f"sequence of length {n} exceeds largest bucket {buckets[-1]}")
