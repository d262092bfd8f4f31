"""Vocoder family dispatch.

The framework supports two mel->wav vocoder families behind one surface:

* HiFi-GAN V1 (reference parity, /root/reference/hifigan/models.py:14-206)
  — `HiFiGANConfig`, wav-rate conv pyramid, Pallas MRF kernels on TPU;
* Vocos (beyond parity) — `VocosConfig`, frame-rate ConvNeXt + iSTFT head.

Dispatch is on the config's type (both are hashable frozen dataclasses and
travel as static jit arguments), so the fused synthesis graph, the GAN
trainer, and the denoiser probe all stay family-agnostic.
"""

from __future__ import annotations

import jax.numpy as jnp

from matcha_tts_tpu.config import HiFiGANConfig, VocosConfig


def init_vocoder(key, cfg):
    """Family-dispatching parameter init."""
    if isinstance(cfg, VocosConfig):
        from matcha_tts_tpu.models import vocos

        return vocos.init_vocos(key, cfg)
    from matcha_tts_tpu.models import hifigan

    return hifigan.init_generator(key, cfg)


def generate(params, mel: jnp.ndarray, cfg) -> jnp.ndarray:
    """(B, T, num_mels) -> (B, T * cfg.total_upsample) audio, any family."""
    if isinstance(cfg, VocosConfig):
        from matcha_tts_tpu.models import vocos

        return vocos.generate(params, mel, cfg)
    from matcha_tts_tpu.models import hifigan

    return hifigan.generator(params, mel, cfg)
