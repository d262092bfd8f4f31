"""matcha_tts_tpu — a TPU-native conditional-flow-matching TTS framework.

A ground-up JAX/XLA/Pallas rebuild of the capabilities of the
Lounes78/matcha-tts reference (Matcha-TTS + HiFi-GAN + WaveGlow-style
denoiser), designed TPU-first:

* static-shape, bucketed compilation (no host syncs in the hot path),
* `(B, T, C)` channels-last layout so convolutions and matmuls tile onto
  the MXU,
* monotonic alignment search as an on-device associative-scan DP
  (the reference round-trips to a Numba CPU kernel),
* data-parallel training via `jax.sharding.Mesh` + XLA collectives
  (the reference uses Lightning DDP/NCCL),
* one jitted text->mel->wav program for inference.

Public surface mirrors the reference APIs (see SURVEY.md §1-§3).
"""

__version__ = "0.1.0"

# Make Pallas kernel cache keys independent of kernel source locations
# (see ops/pallas/_stable.py; opt out with MATCHA_MOSAIC_LOCATIONS=1).
from matcha_tts_tpu.ops.pallas import _stable as _mosaic_stable

_mosaic_stable.install()

from matcha_tts_tpu.config import (  # noqa: F401
    AudioConfig,
    CFMConfig,
    DecoderConfig,
    DurationPredictorConfig,
    EncoderConfig,
    HiFiGANConfig,
    MatchaConfig,
    TrainConfig,
)
