"""Regenerate golden regression fixtures (run manually on CPU):
  python tests/make_golden.py
"""
import os, sys
os.environ["JAX_PLATFORMS"] = "cpu"
from pathlib import Path
sys.path.insert(0, str(Path(__file__).parent.parent))
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")
import numpy as np

from matcha_tts_tpu.ops import log_mel_spectrogram, maximum_path
from matcha_tts_tpu.ops.masking import sequence_mask

OUT = Path(__file__).parent / "golden"
OUT.mkdir(exist_ok=True)

rng = np.random.default_rng(1234)

# 1. log-mel of a fixed chirp
t = np.arange(22050) / 22050.0
chirp = (0.5 * np.sin(2 * np.pi * (200 + 400 * t) * t)).astype(np.float32)
mel = np.asarray(log_mel_spectrogram(chirp[None]))

# 2. MAS path of a fixed problem
neg_cent = rng.standard_normal((2, 16, 40)).astype(np.float32) * 2 - 3
x_mask = np.asarray(sequence_mask(np.array([16, 11]), 16)).astype(np.float32)
y_mask = np.asarray(sequence_mask(np.array([40, 30]), 40)).astype(np.float32)
mask = x_mask[:, :, None] * y_mask[:, None, :]
path = np.asarray(maximum_path(neg_cent, mask))

# 3. tiny-model synthesize mel, fixed seed
from matcha_tts_tpu.config import (AudioConfig, DecoderConfig,
                                   DurationPredictorConfig, EncoderConfig,
                                   MatchaConfig)
from matcha_tts_tpu.models.matcha import init_matcha, synthesize

cfg = MatchaConfig(
    n_vocab=60,
    encoder=EncoderConfig(n_feats=8, n_channels=32, filter_channels=64,
                          n_heads=2, n_layers=1, p_dropout=0.0),
    duration_predictor=DurationPredictorConfig(filter_channels_dp=32),
    decoder=DecoderConfig(channels=(16, 16), attention_head_dim=8,
                          num_heads=2, n_blocks=1, num_mid_blocks=1),
    audio=AudioConfig(n_mels=8),
)
params = init_matcha(jax.random.PRNGKey(777), cfg)
x = np.zeros((1, 16), np.int32)
x[0, :9] = np.arange(1, 10)
out = synthesize(params, jax.random.PRNGKey(5), x, np.asarray([9], np.int32),
                 cfg, n_timesteps=4, t_y_max=32)

np.savez_compressed(OUT / "golden.npz",
                    mel_chirp=mel.astype(np.float32),
                    mas_neg_cent=neg_cent, mas_mask=mask, mas_path=path,
                    synth_mel=np.asarray(out.mel),
                    synth_ylen=np.asarray(out.y_lengths))
print("written", OUT / "golden.npz")
