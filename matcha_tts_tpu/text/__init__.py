"""Host-side text frontend (L0): cleaners, phonemizer bridge, tokenizer."""

from matcha_tts_tpu.text.symbols import SYMBOLS, SYMBOL_TO_ID, ID_TO_SYMBOL, N_VOCAB  # noqa: F401
from matcha_tts_tpu.text.tokenizer import (  # noqa: F401
    encode_text,
    intersperse,
    intersperse_between,
    pad_to_bucket,
    phonemes_to_sequence,
    process_text,
    text_to_sequence,
)
from matcha_tts_tpu.text.phonemize import phonemize, phonemizer_available  # noqa: F401
