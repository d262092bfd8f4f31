"""Utilities: WAV IO, profiling timers."""

from matcha_tts_tpu.utils.wav import read_wav, write_wav  # noqa: F401
