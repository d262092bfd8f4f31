"""Text-encoder building blocks (L2 encoder side).

Functional re-designs of the reference modules (model.py:148-444) in
(B, T, C) layout: channel LayerNorm, ConvReluNorm prenet, duration
predictor, RoPE-on-half-dims multi-head attention, conv FFN, and the
post-norm transformer stack.  Parameter dict keys mirror the reference
checkpoint tree so conversion is mechanical (SURVEY.md §3.4).
"""

from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from matcha_tts_tpu.models import nn
from matcha_tts_tpu.models.nn import Rng

# ---------------------------------------------------------------------------
# ConvReluNorm prenet (reference: model.py:171-208)
# ---------------------------------------------------------------------------


def init_conv_relu_norm(key, in_ch, hidden_ch, out_ch, kernel_size=5, n_layers=3):
    keys = jax.random.split(key, n_layers + 1)
    convs, norms = [], []
    ch = in_ch
    for i in range(n_layers):
        convs.append(nn.init_conv1d(keys[i], ch, hidden_ch, kernel_size))
        norms.append(nn.init_norm(hidden_ch))
        ch = hidden_ch
    # zero-initialized residual projection (model.py:198-199)
    proj = nn.init_conv1d(keys[-1], hidden_ch, out_ch, 1, zero=True)
    return {"conv_layers": convs, "norm_layers": norms, "proj": proj}


def conv_relu_norm(params, x, x_mask, *, kernel_size=5, p_dropout=0.5,
                   rng: Optional[Rng] = None):
    """x: (B, T, C), x_mask: (B, T).  Residual zero-init prenet."""
    m = x_mask[..., None]
    x_org = x
    pad = kernel_size // 2
    for conv_p, norm_p in zip(params["conv_layers"], params["norm_layers"]):
        x = nn.conv1d(conv_p, x * m, padding=pad)
        x = nn.channel_layer_norm(norm_p, x)
        x = jax.nn.relu(x)
        x = nn.dropout(x, p_dropout, rng)
    x = x_org + nn.conv1d(params["proj"], x)
    return x * m


# ---------------------------------------------------------------------------
# Duration predictor (reference: model.py:210-235)
# ---------------------------------------------------------------------------


def init_duration_predictor(key, in_ch, filter_ch, kernel_size=3):
    k1, k2, k3 = jax.random.split(key, 3)
    return {
        "conv_1": nn.init_conv1d(k1, in_ch, filter_ch, kernel_size),
        "norm_1": nn.init_norm(filter_ch),
        "conv_2": nn.init_conv1d(k2, filter_ch, filter_ch, kernel_size),
        "norm_2": nn.init_norm(filter_ch),
        "proj": nn.init_conv1d(k3, filter_ch, 1, 1),
    }


def duration_predictor(params, x, x_mask, *, kernel_size=3, p_dropout=0.1,
                       rng: Optional[Rng] = None):
    """(B, T, C) -> (B, T, 1) log-durations.  Conv -> relu -> LN -> dropout
    twice, then 1x1 proj; all conv inputs masked (model.py:225-235)."""
    m = x_mask[..., None]
    pad = kernel_size // 2
    x = nn.conv1d(params["conv_1"], x * m, padding=pad)
    x = jax.nn.relu(x)
    x = nn.channel_layer_norm(params["norm_1"], x)
    x = nn.dropout(x, p_dropout, rng)
    x = nn.conv1d(params["conv_2"], x * m, padding=pad)
    x = jax.nn.relu(x)
    x = nn.channel_layer_norm(params["norm_2"], x)
    x = nn.dropout(x, p_dropout, rng)
    x = nn.conv1d(params["proj"], x * m)
    return x * m


# ---------------------------------------------------------------------------
# Rotary positional embeddings on half the head dims
# (reference: model.py:244-292 — d = int(0.5 * head_dim) rotated, rest passed)
# ---------------------------------------------------------------------------


def rope_tables(seq_len: int, d: int, base: float = 10_000.0):
    """cos/sin tables of shape (seq_len, d), GPT-NeoX pairing: frequency i
    applies to dims (i, i + d/2) (model.py:264-272)."""
    theta = 1.0 / (base ** (np.arange(0, d, 2, dtype=np.float64) / d))
    idx_theta = np.arange(seq_len, dtype=np.float64)[:, None] * theta[None, :]
    idx_theta2 = np.concatenate([idx_theta, idx_theta], axis=1)
    return (np.cos(idx_theta2).astype(np.float32),
            np.sin(idx_theta2).astype(np.float32))


def apply_rope(x: jnp.ndarray, cos: jnp.ndarray, sin: jnp.ndarray, d: int):
    """x: (B, H, T, Dh); rotate x[..., :d], pass x[..., d:] through."""
    x_rope, x_pass = x[..., :d], x[..., d:]
    half = d // 2
    neg_half = jnp.concatenate([-x_rope[..., half:], x_rope[..., :half]], axis=-1)
    t = x.shape[2]
    x_rope = x_rope * cos[:t][None, None] + neg_half * sin[:t][None, None]
    return jnp.concatenate([x_rope, x_pass], axis=-1)


# ---------------------------------------------------------------------------
# Encoder self-attention (reference: model.py:294-365)
# ---------------------------------------------------------------------------


def init_mha(key, channels, out_channels, n_heads):
    kq, kk, kv, ko = jax.random.split(key, 4)
    # conv_q/k/v are xavier-initialized 1x1 convs (model.py:327-332)
    return {
        "conv_q": nn.init_conv1d(kq, channels, channels, 1, xavier=True),
        "conv_k": nn.init_conv1d(kk, channels, channels, 1, xavier=True),
        "conv_v": nn.init_conv1d(kv, channels, channels, 1, xavier=True),
        "conv_o": nn.init_conv1d(ko, channels, out_channels, 1),
    }


def mha(params, x, attn_mask, *, n_heads: int, p_dropout: float = 0.0,
        rng: Optional[Rng] = None, rope_cache=None):
    """Self-attention with RoPE on half the per-head dims.

    x: (B, T, C); attn_mask: (B, T, T) with 1 = attend (reference builds it
    as the outer product of the x-mask, model.py:434).  Scores are filled
    with -1e4 at masked positions (model.py:360) — NOT dtype-min; this is a
    reference numeric we keep.
    """
    b, t, c = x.shape
    head_dim = c // n_heads
    d_rope = int(head_dim * 0.5)

    q = nn.conv1d(params["conv_q"], x)
    k = nn.conv1d(params["conv_k"], x)
    v = nn.conv1d(params["conv_v"], x)

    def split_heads(a):
        # channels are laid out (head, head_dim) in the 1x1-conv output
        return a.reshape(b, t, n_heads, head_dim).transpose(0, 2, 1, 3)

    q, k, v = split_heads(q), split_heads(k), split_heads(v)

    if rope_cache is None:
        cos, sin = rope_tables(t, d_rope)
        cos, sin = jnp.asarray(cos), jnp.asarray(sin)
    else:
        cos, sin = rope_cache
    q = apply_rope(q, cos, sin, d_rope)
    k = apply_rope(k, cos, sin, d_rope)

    scores = jnp.einsum("bhtd,bhsd->bhts", q, k) / math.sqrt(head_dim)
    scores = jnp.where(attn_mask[:, None, :, :] == 0, jnp.asarray(-1e4, scores.dtype), scores)
    p_attn = jax.nn.softmax(scores, axis=-1)
    p_attn = nn.dropout(p_attn, p_dropout, rng)
    out = jnp.einsum("bhts,bhsd->bhtd", p_attn, v)
    out = out.transpose(0, 2, 1, 3).reshape(b, t, c)
    return nn.conv1d(params["conv_o"], out)


# ---------------------------------------------------------------------------
# Conv FFN (reference: model.py:375-393)
# ---------------------------------------------------------------------------


def init_ffn(key, in_ch, out_ch, filter_ch, kernel_size=3):
    k1, k2 = jax.random.split(key)
    return {
        "conv_1": nn.init_conv1d(k1, in_ch, filter_ch, kernel_size),
        "conv_2": nn.init_conv1d(k2, filter_ch, out_ch, kernel_size),
    }


def ffn(params, x, x_mask, *, kernel_size=3, p_dropout=0.0, rng: Optional[Rng] = None):
    m = x_mask[..., None]
    pad = kernel_size // 2
    x = nn.conv1d(params["conv_1"], x * m, padding=pad)
    x = jax.nn.relu(x)
    x = nn.dropout(x, p_dropout, rng)
    x = nn.conv1d(params["conv_2"], x * m, padding=pad)
    return x * m


# ---------------------------------------------------------------------------
# Post-norm transformer encoder stack (reference: model.py:395-444)
# ---------------------------------------------------------------------------


def init_encoder(key, hidden_ch, filter_ch, n_heads, n_layers, kernel_size):
    keys = jax.random.split(key, n_layers)
    layers = []
    for lk in keys:
        k1, k2 = jax.random.split(lk)
        layers.append({
            "attn": init_mha(k1, hidden_ch, hidden_ch, n_heads),
            "norm_1": nn.init_norm(hidden_ch),
            "ffn": init_ffn(k2, hidden_ch, hidden_ch, filter_ch, kernel_size),
            "norm_2": nn.init_norm(hidden_ch),
        })
    return {"layers": layers}


def encoder(params, x, x_mask, *, n_heads, kernel_size=3, p_dropout=0.0,
            rng: Optional[Rng] = None):
    """x = LN(x + Drop(Attn(x))); x = LN(x + Drop(FFN(x))) per layer,
    inputs re-masked each layer (model.py:433-444)."""
    t = x.shape[1]
    attn_mask = x_mask[:, :, None] * x_mask[:, None, :]
    head_dim = x.shape[-1] // n_heads
    cos, sin = rope_tables(t, int(head_dim * 0.5))
    rope_cache = (jnp.asarray(cos), jnp.asarray(sin))
    m = x_mask[..., None]
    for layer in params["layers"]:
        x = x * m
        y = mha(layer["attn"], x, attn_mask, n_heads=n_heads,
                p_dropout=p_dropout, rng=rng, rope_cache=rope_cache)
        y = nn.dropout(y, p_dropout, rng)
        x = nn.channel_layer_norm(layer["norm_1"], x + y)
        y = ffn(layer["ffn"], x, x_mask, kernel_size=kernel_size,
                p_dropout=p_dropout, rng=rng)
        y = nn.dropout(y, p_dropout, rng)
        x = nn.channel_layer_norm(layer["norm_2"], x + y)
    return x * m
