"""Model zoo: Matcha-TTS acoustic model, vocoder families (HiFi-GAN,
Vocos), denoiser."""

from matcha_tts_tpu.models.matcha import (  # noqa: F401
    SynthesisOutput,
    encode_only,
    init_matcha,
    synthesize,
)
from matcha_tts_tpu.models.vocoder import (  # noqa: F401
    generate as vocoder_generate,
    init_vocoder,
)
