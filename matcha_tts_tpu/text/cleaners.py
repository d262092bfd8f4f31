"""Text cleaners.

Host-side, pure-Python preprocessing matching the reference pipeline
(reference: /root/reference/train_standalone.py:62-126).  The reference
depends on `unidecode` for ASCII folding; that package is not available
here, so we use the NFKD-normalize + ascii-encode fallback the reference
itself ships in its third frontend copy (utils.py:153-158).
"""

from __future__ import annotations

import re
import unicodedata

_WHITESPACE_RE = re.compile(r"\s+")
_BRACKETS_RE = re.compile(r"[\[\]\(\)\{\}]")

# (pattern, replacement) pairs; reference: train_standalone.py:65-74.
_ABBREVIATIONS = [
    (re.compile(rf"\b{abbr}\.", re.IGNORECASE), full)
    for abbr, full in [
        ("mrs", "misess"),
        ("mr", "mister"),
        ("dr", "doctor"),
        ("st", "saint"),
        ("co", "company"),
        ("jr", "junior"),
        ("maj", "major"),
        ("gen", "general"),
        ("drs", "doctors"),
        ("rev", "reverend"),
        ("lt", "lieutenant"),
        ("hon", "honorable"),
        ("sgt", "sergeant"),
        ("capt", "captain"),
        ("esq", "esquire"),
        ("ltd", "limited"),
        ("col", "colonel"),
        ("ft", "fort"),
    ]
]


def convert_to_ascii(text: str) -> str:
    return unicodedata.normalize("NFKD", text).encode("ascii", "ignore").decode("ascii")


def lowercase(text: str) -> str:
    return text.lower()


def expand_abbreviations(text: str) -> str:
    for regex, replacement in _ABBREVIATIONS:
        text = re.sub(regex, replacement, text)
    return text


def remove_brackets(text: str) -> str:
    return re.sub(_BRACKETS_RE, "", text)


def collapse_whitespace(text: str) -> str:
    return re.sub(_WHITESPACE_RE, " ", text)


def basic_cleaners(text: str) -> str:
    """Lowercase + whitespace collapse (the reference's non-phonemized branch,
    train_standalone.py:138-139)."""
    return collapse_whitespace(lowercase(text))


def english_cleaners_pre_phonemize(text: str) -> str:
    """Cleaning applied *before* phonemization
    (reference: train_standalone.py:120-122)."""
    text = convert_to_ascii(text)
    text = lowercase(text)
    text = expand_abbreviations(text)
    return text


def english_cleaners_post_phonemize(phonemes: str) -> str:
    """Cleaning applied *after* phonemization
    (reference: train_standalone.py:124-125)."""
    phonemes = remove_brackets(phonemes)
    phonemes = collapse_whitespace(phonemes)
    return phonemes
