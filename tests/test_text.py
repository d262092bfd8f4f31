"""Text frontend tests (L0): symbols, cleaners, tokenizer, intersperse."""

import numpy as np
import pytest

from matcha_tts_tpu.text import (
    N_VOCAB,
    SYMBOLS,
    SYMBOL_TO_ID,
    encode_text,
    intersperse,
    intersperse_between,
    pad_to_bucket,
    phonemes_to_sequence,
)
from matcha_tts_tpu.text import cleaners


def test_symbol_table_shape():
    assert N_VOCAB == 178
    assert SYMBOLS[0] == "_"
    assert SYMBOL_TO_ID["_"] == 0
    # 1..16 punctuation, 17..68 letters
    assert SYMBOL_TO_ID[";"] == 1
    assert SYMBOL_TO_ID[" "] == 16
    assert SYMBOL_TO_ID["A"] == 17
    assert SYMBOL_TO_ID["z"] == 68
    # first IPA symbol directly after letters
    assert SYMBOL_TO_ID["ɑ"] == 69


def test_duplicate_apostrophe_resolves_to_later_index():
    # the IPA block contains ' twice; dict comprehension keeps the later one
    positions = [i for i, s in enumerate(SYMBOLS) if s == "'"]
    assert len(positions) == 2
    assert SYMBOL_TO_ID["'"] == positions[-1]


def test_phonemes_to_sequence_skips_unknown():
    ids = phonemes_to_sequence("a✓b")
    assert ids == [SYMBOL_TO_ID["a"], SYMBOL_TO_ID["b"]]


def test_intersperse_both_ends():
    assert intersperse([1, 2, 3], 0) == [0, 1, 0, 2, 0, 3, 0]
    assert intersperse([], 0) == [0]


def test_intersperse_between():
    assert intersperse_between([1, 2, 3], 0) == [1, 0, 2, 0, 3]


def test_cleaners_pipeline():
    out = cleaners.english_cleaners_pre_phonemize("Dr. Smith lives on St. Mary's.")
    assert out == "doctor smith lives on saint mary's."
    assert cleaners.collapse_whitespace("a   b\tc\n") == "a b c "
    assert cleaners.remove_brackets("a[b](c){d}") == "abcd"
    assert cleaners.convert_to_ascii("café naïve") == "cafe naive"


def test_encode_text_fallback_no_phonemizer():
    ids = encode_text("abc", add_blank=True)
    # 2n+1 with blanks
    assert ids.shape[0] == 7
    assert ids[0] == 0 and ids[-1] == 0
    assert ids.dtype == np.int32


def test_pad_to_bucket():
    ids = np.arange(10, dtype=np.int32)
    padded, n = pad_to_bucket(ids, (8, 16, 32))
    assert padded.shape == (16,)
    assert n == 10
    assert (padded[:10] == ids).all() and (padded[10:] == 0).all()
    with pytest.raises(ValueError):
        pad_to_bucket(np.zeros(64, np.int32), (8, 16, 32))
