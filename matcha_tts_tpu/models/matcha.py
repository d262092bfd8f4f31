"""MatchaTTS top model: TextEncoder + CFM(U-Net) wiring, init + synthesize
(reference: /root/reference/model.py:1173-1300).

The parameter tree mirrors the reference checkpoint namespace
(`encoder.*`, `decoder.estimator.*`, `mel_mean`, `mel_std`, `spk_emb.*`)
so converted PyTorch checkpoints load one-to-one (SURVEY.md §3.4).

`synthesize` is one pure, jittable function with static (T_x, T_y)
shapes; the reference's `.item()` host syncs (model.py:1278-1281) are
replaced by a host-side frame-bucket choice in the inference driver.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from matcha_tts_tpu.config import MatchaConfig
from matcha_tts_tpu.models import cfm, nn, unet
from matcha_tts_tpu.models.nn import Rng
from matcha_tts_tpu.models.text_encoder import init_text_encoder, text_encoder
from matcha_tts_tpu.ops.masking import generate_path, sequence_mask
from matcha_tts_tpu.ops.stft import denormalize_mel


def init_matcha(key, cfg: MatchaConfig):
    """Build the full parameter tree (reference: model.py:1174-1232)."""
    k_enc, k_dec, k_spk = jax.random.split(key, 3)
    params = {
        "encoder": init_text_encoder(
            k_enc, cfg.n_vocab, cfg.encoder, cfg.duration_predictor,
            cfg.n_spks, cfg.spk_emb_dim,
        ),
        # checkpoint namespace: the CFM wrapper is "decoder", its U-Net is
        # "decoder.estimator" (model.py:1226-1232)
        "decoder": {
            "estimator": unet.init_decoder(
                k_dec, cfg.decoder_in_channels, cfg.encoder.n_feats, cfg.decoder
            )
        },
        "mel_mean": jnp.asarray(cfg.audio.mel_mean, jnp.float32),
        "mel_std": jnp.asarray(cfg.audio.mel_std, jnp.float32),
    }
    if cfg.n_spks > 1:
        params["spk_emb"] = nn.init_embedding(k_spk, cfg.n_spks, cfg.spk_emb_dim, 1.0)
    return params


def estimator_fn(params, cfg: MatchaConfig, spk_emb=None, rng: Optional[Rng] = None):
    """Bind the U-Net as a (z, mask, mu, t) -> v closure for the solver."""

    def fn(z, mask, mu, t):
        return unet.decoder(params["decoder"]["estimator"], z, mask, mu, t,
                            cfg.decoder, spk_emb=spk_emb, rng=rng)

    return fn


class SynthesisOutput(NamedTuple):
    mel: jnp.ndarray        # (B, n_feats, T_y) — reference layout
    y_lengths: jnp.ndarray  # (B,) int32 frame counts
    attn: jnp.ndarray       # (B, T_x, T_y) duration-expansion path
    durations: jnp.ndarray  # (B, T_x) integer per-token durations


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "n_timesteps", "t_y_max", "temperature",
                     "length_scale", "solver", "compute_dtype"),
)
def synthesize(
    params,
    key: jax.Array,
    x: jnp.ndarray,
    x_lengths: jnp.ndarray,
    cfg: MatchaConfig,
    *,
    n_timesteps: int = 10,
    t_y_max: int = 1024,
    temperature: float = 0.667,
    length_scale: float = 1.0,
    solver: Optional[str] = None,
    spks: Optional[jnp.ndarray] = None,
    compute_dtype: str = "float32",
    noise_ids: Optional[jnp.ndarray] = None,
) -> SynthesisOutput:
    """Full text -> mel inference in ONE jitted graph
    (reference: model.py:1264-1300).

    x: (B, T_x) int tokens padded to a static bucket; x_lengths: (B,).
    `t_y_max` is the static output frame bucket (a multiple of
    2**num_downsamples); frames past the predicted length are masked and
    the true length is returned for host-side cropping.
    """
    dtype = jnp.dtype(compute_dtype)
    spk_emb = None
    if cfg.n_spks > 1 and spks is not None:
        spk_emb = nn.embedding(params["spk_emb"], spks)

    mu, logw, x_mask = text_encoder(params["encoder"], x, x_lengths,
                                    cfg.encoder, cfg.duration_predictor,
                                    spk_emb=spk_emb, rng=None,
                                    compute_dtype=dtype)

    # durations computed in fp32 for stable exp/ceil (model.py:1273-1275)
    logw = logw.astype(jnp.float32)
    x_mask = x_mask.astype(jnp.float32)
    w = jnp.exp(logw[..., 0]) * x_mask * length_scale
    w_ceil = jnp.ceil(w)
    y_lengths = jnp.maximum(jnp.sum(w_ceil, axis=1), 1.0).astype(jnp.int32)
    # clip to the static bucket: drop trailing tokens' frames if the
    # prediction overflows (host driver picks a bigger bucket next time)
    y_lengths = jnp.minimum(y_lengths, t_y_max)

    y_mask = sequence_mask(y_lengths, t_y_max).astype(jnp.float32)
    attn_mask = x_mask[:, :, None] * y_mask[:, None, :]
    attn = generate_path(w_ceil, attn_mask)  # (B, T_x, T_y)

    # mu_y[b, y, c] = sum_x attn[b, x, y] * mu[b, x, c] (model.py:1288-1289)
    mu_y = jnp.einsum("bxy,bxc->byc", attn.astype(dtype), mu.astype(dtype),
                      preferred_element_type=jnp.float32).astype(dtype)

    est = estimator_fn(params, cfg, spk_emb=spk_emb, rng=None)
    mel = cfm.sample(est, key, mu_y, y_mask.astype(dtype), n_timesteps,
                     temperature=temperature,
                     solver=solver or cfg.cfm.solver, noise_ids=noise_ids)

    mel = mel.astype(jnp.float32)
    mel = denormalize_mel(mel, params["mel_mean"], params["mel_std"])
    mel = mel * y_mask[..., None]
    # reference returns (B, n_feats, T) (model.py:1298-1300)
    return SynthesisOutput(
        mel=mel.transpose(0, 2, 1),
        y_lengths=y_lengths,
        attn=attn,
        durations=w_ceil.astype(jnp.int32),
    )


def forward_simplified(params, key, x, x_lengths, y, y_lengths,
                       cfg: MatchaConfig, spks=None):
    """API-parity port of `MatchaTTS.forward` (reference: model.py:1234-1262).

    NOTE: the reference's own `forward` is a *simplified* training pass that
    feeds `compute_loss` the TEXT mask and UNALIGNED mu — it is effectively
    unused/incorrect (SURVEY.md §2.1).  The canonical training forward with
    MAS lives in `matcha_tts_tpu.train.losses.matcha_losses`
    (train_standalone.py:623-667 semantics).  This function exists only so
    reference users find the same surface.  Like the reference, it requires
    y.shape[1] == x.shape[1] ("we assume lengths are compatible",
    model.py:1254-1258).

    Returns (cfm_loss, logw, y_lengths_pred) like the reference.
    """
    from matcha_tts_tpu.models import cfm as cfm_mod

    spk_emb = None
    if cfg.n_spks > 1 and spks is not None:
        spk_emb = nn.embedding(params["spk_emb"], spks)
    mu, logw, x_mask = text_encoder(params["encoder"], x, x_lengths,
                                    cfg.encoder, cfg.duration_predictor,
                                    spk_emb=spk_emb, rng=None)
    w = jnp.exp(logw[..., 0]) * x_mask
    w_ceil = jnp.ceil(w)
    y_lengths_pred = jnp.maximum(jnp.sum(w_ceil, axis=1), 1.0).astype(jnp.int32)

    est = estimator_fn(params, cfg, spk_emb=spk_emb, rng=None)
    cfm_loss, _, _, _ = cfm_mod.compute_loss(est, key, y, x_mask, mu,
                                             sigma_min=cfg.cfm.sigma_min)
    return cfm_loss, logw, y_lengths_pred


@functools.partial(jax.jit, static_argnames=("cfg", "length_scale"))
def encode_only(params, x, x_lengths, cfg: MatchaConfig,
                length_scale: float = 1.0, spks=None):
    """Encoder + duration prediction only — used by the inference driver to
    pick the exact frame bucket before calling the fused synthesize graph
    (duration prediction is deterministic, so the predicted y_lengths here
    equal the fused graph's)."""
    spk_emb = None
    if cfg.n_spks > 1 and spks is not None:
        spk_emb = nn.embedding(params["spk_emb"], spks)
    mu, logw, x_mask = text_encoder(params["encoder"], x, x_lengths,
                                    cfg.encoder, cfg.duration_predictor,
                                    spk_emb=spk_emb, rng=None)
    w = jnp.exp(logw[..., 0].astype(jnp.float32)) * x_mask.astype(jnp.float32)
    w_ceil = jnp.ceil(w * length_scale)
    y_lengths = jnp.maximum(jnp.sum(w_ceil, axis=1), 1.0).astype(jnp.int32)
    return y_lengths
