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
    text_to_sequence,
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


class _FakeEspeakBackend:
    """Stands in for phonemizer.backend.EspeakBackend (espeak-ng is not
    installable here) so the PRIMARY phonemize branch runs: IPA string ->
    post-clean -> tokenizer -> 178-symbol vocab (reference main.py:29-41,
    train_standalone.py:76-85)."""

    #: espeak-ng en-us output (with_stress=True) for the cleaned inputs
    CANNED = {
        "hello world.": "həlˈoʊ wˈɜːld.",
        "doctor smith lives here.": "dˈɑːktɚ smˈɪθ lˈɪvz hˈɪɹ.",
    }
    init_kwargs = None

    def __init__(self, **kwargs):
        _FakeEspeakBackend.init_kwargs = kwargs

    def phonemize(self, texts, strip=True, njobs=1):
        assert strip and njobs == 1
        return [self.CANNED.get(t, t) for t in texts]


@pytest.fixture
def fake_phonemizer(monkeypatch):
    """Install a fake `phonemizer` package and reset the backend cache."""
    import importlib
    import sys
    import types

    # the package re-exports the phonemize FUNCTION under the same name,
    # so fetch the module itself
    pz = importlib.import_module("matcha_tts_tpu.text.phonemize")

    mod = types.ModuleType("phonemizer")
    backend_mod = types.ModuleType("phonemizer.backend")
    backend_mod.EspeakBackend = _FakeEspeakBackend
    mod.backend = backend_mod
    monkeypatch.setitem(sys.modules, "phonemizer", mod)
    monkeypatch.setitem(sys.modules, "phonemizer.backend", backend_mod)
    pz._espeak_backend.cache_clear()
    yield pz
    pz._espeak_backend.cache_clear()


def test_phonemize_primary_branch_produces_ipa_ids(fake_phonemizer):
    """With a phonemizer present the espeak branch must run: backend built
    with the reference's exact kwargs, IPA (incl. stress marks) flowing
    into the vocab."""
    pz = fake_phonemizer
    assert pz.phonemizer_available()
    out = pz.phonemize("Hello world.")
    assert out == "həlˈoʊ wˈɜːld."
    kw = _FakeEspeakBackend.init_kwargs
    assert kw["language"] == "en-us"
    assert kw["preserve_punctuation"] is True
    assert kw["with_stress"] is True
    assert kw["language_switch"] == "remove-flags"

    ids, clean = text_to_sequence("Hello world.")
    assert clean == "həlˈoʊ wˈɜːld."
    # every char of the IPA string is in the 178-symbol vocab -> none skipped
    assert len(ids) == len(clean)
    assert SYMBOL_TO_ID["ˈ"] in ids          # primary stress made it through
    assert SYMBOL_TO_ID["ə"] == ids[1]
    assert all(0 <= i < N_VOCAB for i in ids)


def test_phonemize_primary_branch_cleans_before_espeak(fake_phonemizer):
    """Abbreviation expansion happens BEFORE the backend sees the text
    (train_standalone.py:110-123 pipeline order)."""
    out = fake_phonemizer.phonemize("Dr. Smith lives here.")
    assert out == "dˈɑːktɚ smˈɪθ lˈɪvz hˈɪɹ."


def test_phonemize_batch_primary_branch(fake_phonemizer):
    outs = fake_phonemizer.phonemize_batch(["Hello world.", "Dr. Smith lives here."])
    assert outs == ["həlˈoʊ wˈɜːld.", "dˈɑːktɚ smˈɪθ lˈɪvz hˈɪɹ."]


def test_all_vocab_ipa_symbols_tokenize():
    """Every IPA symbol in the table round-trips through the tokenizer
    (no silent skips on real espeak output alphabets)."""
    from matcha_tts_tpu.text.symbols import LETTERS_IPA

    ids = phonemes_to_sequence(LETTERS_IPA)
    assert len(ids) == len(LETTERS_IPA)      # nothing skipped
    # lookups agree with the table (later-duplicate-wins for ')
    assert ids == [SYMBOL_TO_ID[s] for s in LETTERS_IPA]


def test_pad_to_bucket():
    ids = np.arange(10, dtype=np.int32)
    padded, n = pad_to_bucket(ids, (8, 16, 32))
    assert padded.shape == (16,)
    assert n == 10
    assert (padded[:10] == ids).all() and (padded[10:] == 0).all()
    with pytest.raises(ValueError):
        pad_to_bucket(np.zeros(64, np.int32), (8, 16, 32))
