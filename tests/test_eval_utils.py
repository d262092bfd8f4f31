"""WER utility tests (benchmarks/evaluate.py)."""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

from benchmarks.evaluate import normalize_for_wer, word_error_rate


def test_wer_zero_for_identical():
    assert word_error_rate("the cat sat", "the cat sat") == 0.0


def test_wer_counts_errors():
    assert word_error_rate("a b c d", "a x c") == 0.5  # 1 sub + 1 del
    assert word_error_rate("a", "b c") == 2.0


def test_normalize():
    assert normalize_for_wer("Hello, World! It's 'fine'.") == "hello world it's 'fine'"
