"""Host-side data pipeline: filelists, WAV IO, bucketed batching."""

from matcha_tts_tpu.data.dataset import (  # noqa: F401
    BucketBatcher,
    TextMelDataset,
    create_filelists,
    load_wav,
    parse_filelist,
)
