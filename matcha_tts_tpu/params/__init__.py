"""Parameter interop: torch<->JAX conversion, Orbax IO."""

from matcha_tts_tpu.params.convert import (  # noqa: F401
    convert_hifigan,
    convert_matcha,
    convert_vocos,
    export_matcha,
    export_vocos,
    fold_weight_norm,
    load_torch_state_dict,
    vocos_config_from_state_dict,
)
from matcha_tts_tpu.params.io import load_matcha_any, load_orbax_matcha  # noqa: F401
