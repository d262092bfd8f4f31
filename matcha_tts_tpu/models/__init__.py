"""Model zoo: Matcha-TTS acoustic model, HiFi-GAN vocoder, denoiser."""

from matcha_tts_tpu.models.matcha import (  # noqa: F401
    SynthesisOutput,
    encode_only,
    init_matcha,
    synthesize,
)
