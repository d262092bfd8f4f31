"""Device-level ops: STFT/mel pipeline, masks, monotonic alignment search."""

from matcha_tts_tpu.ops.masking import (  # noqa: F401
    fix_len_compatibility,
    generate_path,
    sequence_mask,
)
from matcha_tts_tpu.ops.mas import maximum_path, maximum_path_numpy  # noqa: F401
from matcha_tts_tpu.ops.mel import mel_filterbank  # noqa: F401
from matcha_tts_tpu.ops.stft import (  # noqa: F401
    denormalize_mel,
    istft,
    log_mel_spectrogram,
    normalize_mel,
    stft_magnitude_and_phase,
)
