"""Symbol inventory (vocabulary) for the text frontend.

Reproduces the reference table (178 entries): pad + 16 punctuation +
52 ASCII letters + 109 IPA symbols (reference: /root/reference/main.py:22-27;
duplicated at train_standalone.py:50-59 and utils.py:6-16).

Notes on reference quirks (kept bit-identical here):

* The IPA string contains the apostrophe ``'`` twice (around the combining
  vertical-line-below U+0329), so ``symbol_to_id["'"]`` resolves to the later
  index, exactly as a ``{s: i for i, s in enumerate(symbols)}`` dict does.
* ``train_standalone.py:51`` degrades the curly quotes to plain ``"`` (three
  duplicate ``"`` entries); ``main.py:23`` keeps ``“ ”``.  We use the
  ``main.py`` variant: it is the one used at inference time and the only one
  in which all 178 ids are reachable.
"""

from __future__ import annotations

PAD = "_"
PUNCTUATION = ';:,.!?¡¿—…"«»“” '
LETTERS = "ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz"
LETTERS_IPA = (
    "ɑɐɒæɓʙβɔɕçɗ"
    "ɖðʤəɘɚɛɜɝɞɟ"
    "ʄɡɠɢʛɦɧħɥʜɨ"
    "ɪʝɭɬɫɮʟɱɯɰŋ"
    "ɳɲɴøɵɸθœɶʘɹ"
    "ɺɾɻʀʁɽʂʃʈʧʉ"
    "ʊʋⱱʌɣɤʍχʎʏʑ"
    "ʐʒʔʡʕʢǀǁǂǃˈ"
    "ˌːˑʼʴʰʱʲʷˠˤ"
    "˞↓↑→↗↘'̩'ᵻ"
)

SYMBOLS = [PAD] + list(PUNCTUATION) + list(LETTERS) + list(LETTERS_IPA)

# Later duplicates win, matching the reference dict comprehension
# (main.py:27).
SYMBOL_TO_ID = {s: i for i, s in enumerate(SYMBOLS)}
ID_TO_SYMBOL = {i: s for i, s in enumerate(SYMBOLS)}

N_VOCAB = len(SYMBOLS)
assert N_VOCAB == 178
