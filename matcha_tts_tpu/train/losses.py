"""Training losses: duration + prior + CFM, with MAS alignment
(reference: /root/reference/train_standalone.py:623-667 — the canonical
training forward; NOT the simplified/broken MatchaTTS.forward at
model.py:1234-1262, see SURVEY.md §2.1 note)."""

from __future__ import annotations

import math
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from matcha_tts_tpu.config import MatchaConfig
from matcha_tts_tpu.models import cfm
from matcha_tts_tpu.models.matcha import estimator_fn
from matcha_tts_tpu.models.nn import Rng
from matcha_tts_tpu.models.text_encoder import text_encoder
from matcha_tts_tpu.models import nn
from matcha_tts_tpu.ops.mas import maximum_path
from matcha_tts_tpu.ops.masking import sequence_mask


class LossOutput(NamedTuple):
    total: jnp.ndarray
    dur_loss: jnp.ndarray
    prior_loss: jnp.ndarray
    cfm_loss: jnp.ndarray


def log_gaussian_prior(mu: jnp.ndarray, y: jnp.ndarray, n_feats: int) -> jnp.ndarray:
    """log N(y; mu, I) cross table via three matmuls
    (train_standalone.py:638-644).

    mu: (B, T_x, C); y: (B, T_y, C) -> (B, T_x, T_y).
    """
    const = -0.5 * math.log(2 * math.pi) * n_feats
    # -0.5 * sum_c y^2  -> (B, 1, T_y) broadcast over x
    y_sq = -0.5 * jnp.sum(jnp.square(y), axis=-1)  # (B, T_y)
    # + sum_c mu_c y_c
    cross = jnp.einsum("bxc,byc->bxy", mu, y)
    mu_sq = -0.5 * jnp.sum(jnp.square(mu), axis=-1)  # (B, T_x)
    return y_sq[:, None, :] + cross + mu_sq[:, :, None] + const


def duration_loss(logw: jnp.ndarray, logw_: jnp.ndarray, lengths: jnp.ndarray):
    """Masked MSE over log-durations, normalized by total token count
    (train_standalone.py:336-339; logw/logw_ are already masked)."""
    return jnp.sum(jnp.square(logw - logw_)) / jnp.sum(lengths)


def matcha_losses(
    params,
    key: jax.Array,
    x: jnp.ndarray,
    x_lengths: jnp.ndarray,
    y: jnp.ndarray,
    y_lengths: jnp.ndarray,
    cfg: MatchaConfig,
    spks: Optional[jnp.ndarray] = None,
    train: bool = True,
    prior_loss_enabled: bool = True,
    compute_dtype: str = "float32",
) -> LossOutput:
    """One training forward: encoder -> MAS (stop-grad) -> three losses.

    x: (B, T_x) tokens; y: (B, T_y, n_feats) normalized mel (channels-last;
    the data pipeline transposes).  T_x/T_y are static bucket sizes.

    `compute_dtype="bfloat16"` is the TPU equivalent of the reference's
    "16-mixed" AMP (train_standalone.py:764): parameters stay fp32 master
    weights, activations run bf16 on the MXU with fp32 accumulation, and
    MAS / loss reductions stay fp32 (bf16 needs no loss scaling).
    """
    cd = jnp.dtype(compute_dtype)
    k_drop, k_cfm = jax.random.split(key)
    rng = Rng(k_drop) if train else None

    spk_emb = None
    if cfg.n_spks > 1 and spks is not None:
        spk_emb = nn.embedding(params["spk_emb"], spks)

    mu_x, logw, x_mask = text_encoder(params["encoder"], x, x_lengths,
                                      cfg.encoder, cfg.duration_predictor,
                                      spk_emb=spk_emb, rng=rng,
                                      compute_dtype=cd)
    mu_x = mu_x.astype(jnp.float32)
    logw = logw.astype(jnp.float32)
    x_mask = x_mask.astype(jnp.float32)
    y = y.astype(jnp.float32)

    t_y = y.shape[1]
    y_mask = sequence_mask(y_lengths, t_y).astype(x_mask.dtype)
    attn_mask = x_mask[:, :, None] * y_mask[:, None, :]

    # --- MAS (no grad; train_standalone.py:638-647) -----------------------
    log_prior = log_gaussian_prior(jax.lax.stop_gradient(mu_x),
                                   jax.lax.stop_gradient(y),
                                   cfg.encoder.n_feats)
    attn = maximum_path(log_prior, attn_mask)
    attn = jax.lax.stop_gradient(attn)  # (B, T_x, T_y)

    # --- duration loss (train_standalone.py:650-651) -----------------------
    logw_ = jnp.log(1e-8 + jnp.sum(attn, axis=-1, keepdims=True)) * x_mask[..., None]
    dur_loss = duration_loss(logw, logw_, x_lengths)

    # --- aligned conditioning (train_standalone.py:654-655) ----------------
    mu_y = jnp.einsum("bxy,bxc->byc", attn, mu_x)

    # --- CFM loss (model.py:1147-1162) --------------------------------------
    est = estimator_fn(params, cfg, spk_emb=spk_emb, rng=rng)
    cfm_loss, _, _, _ = cfm.compute_loss(est, k_cfm, y, y_mask, mu_y,
                                         sigma_min=cfg.cfm.sigma_min,
                                         compute_dtype=cd)

    # --- prior loss (train_standalone.py:661-663) ---------------------------
    if prior_loss_enabled:
        prior = jnp.sum(
            0.5 * (jnp.square(y - mu_y) + math.log(2 * math.pi))
            * y_mask[..., None]
        )
        prior = prior / (jnp.sum(y_mask) * cfg.encoder.n_feats)
    else:
        prior = jnp.asarray(0.0, y.dtype)

    total = dur_loss + prior + cfm_loss
    return LossOutput(total=total, dur_loss=dur_loss, prior_loss=prior,
                      cfm_loss=cfm_loss)
