"""TextEncoder: tokens -> (mu, log-durations, mask)
(reference: /root/reference/model.py:452-535)."""

from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp

from matcha_tts_tpu.config import DurationPredictorConfig, EncoderConfig
from matcha_tts_tpu.models import layers, nn
from matcha_tts_tpu.models.nn import Rng
from matcha_tts_tpu.ops.masking import sequence_mask


def init_text_encoder(key, n_vocab: int, enc: EncoderConfig,
                      dp: DurationPredictorConfig, n_spks: int = 1,
                      spk_emb_dim: int = 0):
    k_emb, k_pre, k_enc, k_proj, k_dp = jax.random.split(key, 5)
    ch = enc.n_channels
    enc_ch = ch + (spk_emb_dim if n_spks > 1 else 0)
    params = {
        # Embedding init N(0, n_channels^-0.5) (model.py:471-472)
        "emb": nn.init_embedding(k_emb, n_vocab, ch, ch**-0.5),
        "encoder": layers.init_encoder(
            k_enc, enc_ch, enc.filter_channels, enc.n_heads, enc.n_layers,
            enc.kernel_size,
        ),
        "proj_m": nn.init_conv1d(k_proj, enc_ch, enc.n_feats, 1),
        "proj_w": layers.init_duration_predictor(
            k_dp, enc_ch, dp.filter_channels_dp, dp.kernel_size
        ),
    }
    if enc.prenet:
        params["prenet"] = layers.init_conv_relu_norm(k_pre, ch, ch, ch)
    return params


def text_encoder(params, x: jnp.ndarray, x_lengths: jnp.ndarray,
                 enc: EncoderConfig, dp: DurationPredictorConfig,
                 spk_emb: Optional[jnp.ndarray] = None,
                 rng: Optional[Rng] = None, compute_dtype=jnp.float32):
    """x: (B, T_x) int tokens; x_lengths: (B,).

    Returns (mu, logw, x_mask):
      mu:     (B, T_x, n_feats)
      logw:   (B, T_x, 1) — predicted log-durations, computed on a
              stop-gradient branch (model.py:532-533)
      x_mask: (B, T_x) float

    The speaker embedding, when given, is broadcast-concatenated on the
    channel axis after the prenet (model.py:527-528).
    """
    h = nn.embedding(params["emb"], x) * math.sqrt(enc.n_channels)
    h = h.astype(compute_dtype)
    x_mask = sequence_mask(x_lengths, x.shape[1]).astype(compute_dtype)

    if "prenet" in params:
        h = layers.conv_relu_norm(params["prenet"], h, x_mask,
                                  p_dropout=0.5 if rng is not None else 0.0,
                                  rng=rng)
    if spk_emb is not None:
        s = jnp.broadcast_to(spk_emb[:, None, :].astype(compute_dtype),
                             (h.shape[0], h.shape[1], spk_emb.shape[-1]))
        h = jnp.concatenate([h, s], axis=-1)

    h = layers.encoder(params["encoder"], h, x_mask, n_heads=enc.n_heads,
                       kernel_size=enc.kernel_size, p_dropout=enc.p_dropout,
                       rng=rng)
    mu = nn.conv1d(params["proj_m"], h) * x_mask[..., None]

    h_dp = jax.lax.stop_gradient(h)
    logw = layers.duration_predictor(params["proj_w"], h_dp, x_mask,
                                     kernel_size=dp.kernel_size,
                                     p_dropout=dp.p_dropout, rng=rng)
    return mu, logw, x_mask
