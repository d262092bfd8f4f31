"""Inference: bucketed compile-cached synthesis engine + CLI."""

from matcha_tts_tpu.inference.synthesizer import SynthesisResult, Synthesizer  # noqa: F401
