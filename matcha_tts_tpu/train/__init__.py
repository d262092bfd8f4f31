"""Training: losses, optimizer/train step, fit loop, checkpointing."""

from matcha_tts_tpu.train.losses import LossOutput, matcha_losses  # noqa: F401
from matcha_tts_tpu.train.train_state import (  # noqa: F401
    TrainState,
    create_train_state,
    eval_step,
    train_step,
)
