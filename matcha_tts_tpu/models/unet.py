"""CFM estimator: 1D U-Net with transformer blocks
(reference: /root/reference/model.py:576-1048).

TPU-first notes:
* (B, T, C) layout; all convs are `lax.conv_general_dilated` NWC.
* Static shapes only — frame buckets are multiples of 2**num_downsamples,
  so the reference's odd-length nearest-interp fix (model.py:1027-1028)
  can never trigger; masks are strided (`mask[:, ::2]`) exactly like
  model.py:1003.
* GroupNorm statistics include padded frames, as in the reference
  (see nn.group_norm docstring).
"""

from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp

from matcha_tts_tpu.config import DecoderConfig
from matcha_tts_tpu.models import nn
from matcha_tts_tpu.models.nn import Rng

# ---------------------------------------------------------------------------
# SnakeBeta activation (reference: model.py:580-609)
# ---------------------------------------------------------------------------


def init_snake_beta(key, in_features: int, out_features: int):
    return {
        "proj": nn.init_linear(key, in_features, out_features),
        # log-scale alpha/beta initialized to ZEROS -> exp() = 1
        # (model.py:589-590)
        "alpha": jnp.zeros((out_features,), jnp.float32),
        "beta": jnp.zeros((out_features,), jnp.float32),
    }


@jax.custom_vjp
def _snake_fused(z, alpha, beta):
    """x + sin^2(alpha x)/(beta+eps) via the identity
    sin^2(u/2) = (1 - cos u)/2, with a hand-written VJP that moves ALL
    transcendentals to the forward pass.

    Rationale (measured 2026-08-20, RESULTS.md "Backward-pass SOL
    verdict"): the SnakeBeta feed-forward is VPU-transcendental-bound —
    autodiff's backward computes cos(alpha x) over the (B, T, 4C)
    intermediate, and remat makes it worse.  Here the forward computes
    sin and cos of ONE shared angle u = 2 alpha x and saves sin(u), so
    the backward is pure multiply-adds:
        dy/dz     = 1 + alpha sin(u)/(beta+eps)
        dy/dalpha = z sin(u)/(beta+eps)
        dy/dbeta  = -(y - z)/(beta+eps)
    Trades one extra saved (B, T, 4C) tensor for the backward's
    transcendental pass (the backward is NOT bandwidth-bound, so the
    trade is in the right direction)."""
    u = (2.0 * alpha) * z
    return z + (0.5 * (1.0 - jnp.cos(u))) / (beta + 1e-9)


def _snake_fused_fwd(z, alpha, beta):
    u = (2.0 * alpha) * z
    s = jnp.sin(u)
    r = (0.5 * (1.0 - jnp.cos(u))) / (beta + 1e-9)
    return z + r, (z, s, r, alpha, beta)


def _snake_fused_bwd(res, g):
    z, s, r, alpha, beta = res
    inv = 1.0 / (beta + 1e-9)
    dz = g * (1.0 + (alpha * inv) * s)
    red = tuple(range(g.ndim - 1))
    # channel-vector grads accumulate in fp32 (they sum ~25M bf16 terms)
    dalpha = jnp.sum((g * z * s * inv).astype(jnp.float32), axis=red)
    dbeta = jnp.sum((g * r * (-inv)).astype(jnp.float32), axis=red)
    return dz, dalpha.astype(alpha.dtype), dbeta.astype(beta.dtype)


_snake_fused.defvjp(_snake_fused_fwd, _snake_fused_bwd)


def snake_beta(params, x, impl: str = "xla"):
    x = nn.linear(params["proj"], x)
    alpha = jnp.exp(params["alpha"]).astype(x.dtype)
    beta = jnp.exp(params["beta"]).astype(x.dtype)
    if impl == "fused_vjp":
        return _snake_fused(x, alpha, beta)
    return x + (1.0 / (beta + 1e-9)) * jnp.square(jnp.sin(x * alpha))


# ---------------------------------------------------------------------------
# Decoder feed-forward (reference: model.py:611-644)
# ---------------------------------------------------------------------------


def init_feed_forward(key, dim: int, mult: int = 4):
    k1, k2 = jax.random.split(key)
    inner = dim * mult
    return {
        "act": init_snake_beta(k1, dim, inner),
        "out": nn.init_linear(k2, inner, dim),
    }


def feed_forward(params, x, *, dropout_p=0.0, rng: Optional[Rng] = None,
                 snake_impl: str = "xla"):
    x = snake_beta(params["act"], x, impl=snake_impl)
    x = nn.dropout(x, dropout_p, rng)
    return nn.linear(params["out"], x)


# ---------------------------------------------------------------------------
# Decoder attention, diffusers-style (reference: model.py:646-705)
# ---------------------------------------------------------------------------


def init_attention(key, query_dim: int, heads: int, dim_head: int):
    kq, kk, kv, ko = jax.random.split(key, 4)
    inner = heads * dim_head
    return {
        "to_q": nn.init_linear(kq, query_dim, inner, bias=False),
        "to_k": nn.init_linear(kk, query_dim, inner, bias=False),
        "to_v": nn.init_linear(kv, query_dim, inner, bias=False),
        "to_out": nn.init_linear(ko, inner, query_dim),
    }


def _resolve_attention_impl(impl: str, b: int, t: int, dim_head: int) -> str:
    """Resolve the attention implementation for this trace.

    "auto" resolves to the XLA einsum path at every shape: the vmem
    kernel measured a TIE within run noise at batch 32 (8.50-8.83 ms vs
    XLA's 8.48-8.77 per estimator pass, benchmarks/estimator_bench.py,
    v5e bf16 2026-08-17) and no better at batch 8, so the simpler path
    stays default.  "flash"/"vmem" force their kernel if the shape
    allows, falling back to XLA otherwise."""
    del b  # batch does not affect resolution; kept for call-site symmetry
    if impl == "flash":
        from matcha_tts_tpu.ops.pallas.attention import flash_attention_ok

        return "flash" if flash_attention_ok(t, dim_head) else "xla"
    if impl == "vmem":
        from matcha_tts_tpu.ops.pallas.attn_vmem import attn_vmem_ok

        if attn_vmem_ok(t, dim_head):
            return "vmem"
    return "xla"


def attention(params, x, key_mask, *, heads: int, dim_head: int,
              dropout_p=0.0, rng: Optional[Rng] = None, impl: str = "xla"):
    """x: (B, T, C); key_mask: (B, T) 1=keep.  Masked key positions are
    filled with the dtype minimum (model.py:693-697) — unlike the encoder's
    -1e4 fill.

    With the flash impl (ops/pallas/attention.py), scores stay in VMEM;
    valid-row outputs match the XLA path (padded query rows differ but
    every downstream consumer pre-masks, so they never reach valid
    positions — see the wrapper's docstring)."""
    b, t, _ = x.shape
    qf = nn.linear(params["to_q"], x)  # (B, T, H*D)
    kf = nn.linear(params["to_k"], x)
    vf = nn.linear(params["to_v"], x)
    scale = dim_head ** -0.5
    resolved = _resolve_attention_impl(impl, b, t, dim_head)
    if resolved == "vmem":
        from matcha_tts_tpu.ops.pallas.attn_vmem import vmem_mha_packed

        out = vmem_mha_packed(qf, kf, vf, key_mask, heads=heads,
                              sm_scale=scale)
    elif resolved == "flash":
        from matcha_tts_tpu.ops.pallas.attention import flash_mha

        out = flash_mha(qf.reshape(b, t, heads, dim_head),
                        kf.reshape(b, t, heads, dim_head),
                        vf.reshape(b, t, heads, dim_head),
                        key_mask, sm_scale=scale)
    else:
        q = qf.reshape(b, t, heads, dim_head)
        k = kf.reshape(b, t, heads, dim_head)
        v = vf.reshape(b, t, heads, dim_head)
        sim = jnp.einsum("bihd,bjhd->bhij", q, k) * scale
        neg = jnp.finfo(sim.dtype).min
        sim = jnp.where(key_mask[:, None, None, :] == 0, neg, sim)
        attn = jax.nn.softmax(sim, axis=-1)
        out = jnp.einsum("bhij,bjhd->bihd", attn, v).reshape(
            b, t, heads * dim_head)
    out = nn.linear(params["to_out"], out)
    return nn.dropout(out, dropout_p, rng)


# ---------------------------------------------------------------------------
# BasicTransformerBlock: pre-norm attn + FF (reference: model.py:707-744)
# ---------------------------------------------------------------------------


def init_transformer_block(key, dim: int, heads: int, dim_head: int):
    k1, k2 = jax.random.split(key)
    return {
        "norm1": nn.init_norm(dim),
        "attn1": init_attention(k1, dim, heads, dim_head),
        "norm3": nn.init_norm(dim),
        "ff": init_feed_forward(k2, dim),
    }


def transformer_block(params, x, key_mask, *, heads, dim_head, dropout_p=0.0,
                      rng: Optional[Rng] = None, attn_impl: str = "xla",
                      snake_impl: str = "xla"):
    h = nn.layer_norm(params["norm1"], x)
    x = x + attention(params["attn1"], h, key_mask, heads=heads,
                      dim_head=dim_head, dropout_p=dropout_p, rng=rng,
                      impl=attn_impl)
    h = nn.layer_norm(params["norm3"], x)
    x = x + feed_forward(params["ff"], h, dropout_p=dropout_p, rng=rng,
                         snake_impl=snake_impl)
    return x


# ---------------------------------------------------------------------------
# Time embedding (reference: model.py:747-762, 819-832)
# ---------------------------------------------------------------------------


def sinusoidal_pos_emb(t: jnp.ndarray, dim: int, scale: float = 1000.0):
    """t: (B,) -> (B, dim); log-spaced frequencies, scale 1000
    (model.py:753-762)."""
    half = dim // 2
    emb = math.log(10000.0) / (half - 1)
    freqs = jnp.exp(jnp.arange(half, dtype=t.dtype) * -emb)
    arg = scale * t[:, None] * freqs[None, :]
    return jnp.concatenate([jnp.sin(arg), jnp.cos(arg)], axis=-1)


def init_timestep_embedding(key, in_channels: int, time_embed_dim: int):
    k1, k2 = jax.random.split(key)
    return {
        "linear_1": nn.init_linear(k1, in_channels, time_embed_dim),
        "linear_2": nn.init_linear(k2, time_embed_dim, time_embed_dim),
    }


def timestep_embedding(params, emb):
    emb = nn.linear(params["linear_1"], emb)
    emb = jax.nn.silu(emb)
    return nn.linear(params["linear_2"], emb)


# ---------------------------------------------------------------------------
# Conv blocks (reference: model.py:764-817)
# ---------------------------------------------------------------------------


def init_block1d(key, dim: int, dim_out: int):
    return {
        "conv": nn.init_conv1d(key, dim, dim_out, 3),
        "norm": nn.init_norm(dim_out),
    }


def block1d(params, x, mask, *, groups: int = 8, use_pallas: bool = False):
    """Conv(k=3) -> GroupNorm(8) -> Mish, masked in/out (model.py:764-775).

    With `use_pallas`, shapes permitting, the whole block runs as one
    fused VMEM-resident Pallas kernel (ops/pallas/block1d.py) — including
    under `jax.grad` via its rematerializing custom VJP."""
    m = mask[..., None]
    if use_pallas:
        from matcha_tts_tpu.ops.pallas.block1d import (
            block1d_fused_vjp,
            block1d_pallas_ok,
        )

        t, c_in = x.shape[1], x.shape[2]
        c_out = params["conv"]["weight"].shape[-1]
        if block1d_pallas_ok(t, c_in, c_out):
            h = block1d_fused_vjp(x * m, params["conv"]["weight"],
                                  params["conv"]["bias"],
                                  params["norm"]["gamma"],
                                  params["norm"]["beta"], groups)
            return h * m
    h = nn.conv1d(params["conv"], x * m, padding=1)
    h = nn.group_norm(params["norm"], h, groups)
    return nn.mish(h) * m


def init_resnet_block1d(key, dim: int, dim_out: int, time_emb_dim: int):
    k1, k2, k3, k4 = jax.random.split(key, 4)
    return {
        "mlp": nn.init_linear(k1, time_emb_dim, dim_out),
        "block1": init_block1d(k2, dim, dim_out),
        "block2": init_block1d(k3, dim_out, dim_out),
        "res_conv": nn.init_conv1d(k4, dim, dim_out, 1),
    }


def resnet_block1d(params, x, mask, t_emb, use_pallas: bool = False):
    """block1 -> (+ time-MLP broadcast) -> block2 -> + 1x1 residual
    (model.py:777-790).  t_emb: (B, time_emb_dim).

    With `use_pallas`, shapes permitting, the whole residual block runs
    as one fused VMEM-resident kernel (ops/pallas/resnet1d.py) —
    including under `jax.grad` via its rematerializing custom VJP."""
    if use_pallas:
        from matcha_tts_tpu.ops.pallas.resnet1d import (
            resnet1d_fused_vjp,
            resnet1d_pallas_ok,
        )

        t, c_in = x.shape[1], x.shape[2]
        c_out = params["block1"]["conv"]["weight"].shape[-1]
        if resnet1d_pallas_ok(t, c_in, c_out):
            temb_row = nn.linear(params["mlp"], nn.mish(t_emb))
            return resnet1d_fused_vjp(
                x * mask[..., None], mask, temb_row,
                params["block1"], params["block2"],
                params["res_conv"]["weight"][0], params["res_conv"]["bias"])
    h = block1d(params["block1"], x, mask, use_pallas=use_pallas)
    h = h + nn.linear(params["mlp"], nn.mish(t_emb))[:, None, :]
    h = block1d(params["block2"], h, mask, use_pallas=use_pallas)
    return h + nn.conv1d(params["res_conv"], x * mask[..., None])


# ---------------------------------------------------------------------------
# U-Net decoder (reference: model.py:834-1048)
# ---------------------------------------------------------------------------


def init_decoder(key, in_channels: int, out_channels: int, cfg: DecoderConfig):
    channels = tuple(cfg.channels)
    time_dim = channels[0] * 4
    n_levels = len(channels)
    keys = iter(jax.random.split(key, 4 + 4 * n_levels + 2 * cfg.num_mid_blocks
                                 + 4 * n_levels + 8))

    params = {
        "time_mlp": init_timestep_embedding(next(keys), in_channels, time_dim)
    }

    down = []
    out_ch = in_channels
    for i, ch in enumerate(channels):
        in_ch, out_ch = out_ch, ch
        is_last = i == n_levels - 1
        level = {
            "resnet": init_resnet_block1d(next(keys), in_ch, out_ch, time_dim),
            "transformer_blocks": [
                init_transformer_block(next(keys), out_ch, cfg.num_heads,
                                       cfg.attention_head_dim)
                for _ in range(cfg.n_blocks)
            ],
        }
        # last level's "downsample" is a plain k=3 conv (model.py:895-897);
        # earlier levels stride by 2.  Same param shape either way; the
        # stride is decided by position in `decoder()`.
        del is_last
        level["downsample"] = nn.init_conv1d(next(keys), out_ch, out_ch, 3)
        down.append(level)
    params["down_blocks"] = down

    mid = []
    for _ in range(cfg.num_mid_blocks):
        mid.append({
            "resnet": init_resnet_block1d(next(keys), channels[-1], channels[-1], time_dim),
            "transformer_blocks": [
                init_transformer_block(next(keys), channels[-1], cfg.num_heads,
                                       cfg.attention_head_dim)
                for _ in range(cfg.n_blocks)
            ],
        })
    params["mid_blocks"] = mid

    up = []
    rev = list(channels[::-1]) + [channels[0]]
    for i in range(len(rev) - 1):
        in_ch, out_ch2 = rev[i], rev[i + 1]
        is_last = i == len(rev) - 2
        level = {
            # 2x input channels: skip concat (model.py:933-938)
            "resnet": init_resnet_block1d(next(keys), 2 * in_ch, out_ch2, time_dim),
            "transformer_blocks": [
                init_transformer_block(next(keys), out_ch2, cfg.num_heads,
                                       cfg.attention_head_dim)
                for _ in range(cfg.n_blocks)
            ],
        }
        if is_last:
            # final level uses a plain k=3 conv (model.py:953-957)
            level["upsample"] = nn.init_conv1d(next(keys), out_ch2, out_ch2, 3)
        else:
            level["upsample"] = nn.init_conv_transpose1d(next(keys), out_ch2, out_ch2, 4)
        up.append(level)
    params["up_blocks"] = up

    params["final_block"] = init_block1d(next(keys), channels[-1], channels[-1])
    params["final_proj"] = nn.init_conv1d(next(keys), channels[-1], out_channels, 1)
    return params


def decoder(params, x, mask, mu, t, cfg: DecoderConfig,
            spk_emb: Optional[jnp.ndarray] = None,
            rng: Optional[Rng] = None):
    """CFM vector-field estimator (reference forward: model.py:964-1048).

    x, mu: (B, T, n_feats); mask: (B, T); t: (B,) flow time in [0, 1].
    Returns (B, T, n_feats).  T must be a multiple of 2**len(channels).
    """
    in_channels = x.shape[-1] + mu.shape[-1] + (spk_emb.shape[-1] if spk_emb is not None else 0)
    t_emb = sinusoidal_pos_emb(t, in_channels)
    t_emb = timestep_embedding(params["time_mlp"], t_emb)

    h = jnp.concatenate([x, mu], axis=-1)
    if spk_emb is not None:
        s = jnp.broadcast_to(spk_emb[:, None, :], (h.shape[0], h.shape[1], spk_emb.shape[-1]))
        h = jnp.concatenate([h, s], axis=-1)

    heads, dim_head = cfg.num_heads, cfg.attention_head_dim
    dropout_p = cfg.dropout if rng is not None else 0.0
    b = x.shape[0]
    # "auto" resolves to XLA at every batch: the fused-kernel paths
    # measured SLOWER at batch 32 bf16 (fused resnet 9.40 ms, fused
    # Block1D pair 9.71 ms vs XLA 8.48-8.77 per estimator pass,
    # benchmarks/estimator_bench.py, v5e 2026-08-17) and neutral at
    # batch 8.  The kernels stay available as forced modes ("pallas" /
    # use_pallas) for fp32-exact GroupNorm stats and training remat.
    use_pallas = cfg.use_pallas or cfg.block1d_impl == "pallas"
    attn_impl = cfg.attention_impl
    snake_impl = cfg.snake_impl

    n_levels = len(params["down_blocks"])
    hiddens = []
    masks = [mask]
    for i, level in enumerate(params["down_blocks"]):
        m = masks[-1]
        h = resnet_block1d(level["resnet"], h, m, t_emb, use_pallas)
        for tb in level["transformer_blocks"]:
            h = transformer_block(tb, h, m, heads=heads, dim_head=dim_head,
                                  dropout_p=dropout_p, rng=rng,
                                  attn_impl=attn_impl,
                                  snake_impl=snake_impl)
        hiddens.append(h)
        if i < n_levels - 1:
            h = nn.conv1d(level["downsample"], h * m[..., None], stride=2, padding=1)
            masks.append(m[:, ::2])
        else:
            # last level: plain conv, resolution unchanged; the appended
            # (strided) mask is immediately dropped below, as in
            # model.py:1003-1005
            h = nn.conv1d(level["downsample"], h * m[..., None], padding=1)
            masks.append(m)

    masks = masks[:-1]
    m_mid = masks[-1]
    for block in params["mid_blocks"]:
        h = resnet_block1d(block["resnet"], h, m_mid, t_emb, use_pallas)
        for tb in block["transformer_blocks"]:
            h = transformer_block(tb, h, m_mid, heads=heads, dim_head=dim_head,
                                  dropout_p=dropout_p, rng=rng,
                                  attn_impl=attn_impl,
                                  snake_impl=snake_impl)

    n_ups = len(params["up_blocks"])
    for i, level in enumerate(params["up_blocks"]):
        m = masks.pop()
        skip = hiddens.pop()
        assert h.shape[1] == skip.shape[1], (
            "frame bucket must be a multiple of 2**num_downsamples"
        )
        h = jnp.concatenate([h, skip], axis=-1)
        h = resnet_block1d(level["resnet"], h, m, t_emb, use_pallas)
        for tb in level["transformer_blocks"]:
            h = transformer_block(tb, h, m, heads=heads, dim_head=dim_head,
                                  dropout_p=dropout_p, rng=rng,
                                  attn_impl=attn_impl,
                                  snake_impl=snake_impl)
        if i < n_ups - 1:
            h = nn.conv_transpose1d(level["upsample"], h * m[..., None], stride=2, padding=1)
        else:
            h = nn.conv1d(level["upsample"], h * m[..., None], padding=1)

    m = mask
    h = block1d(params["final_block"], h, m, use_pallas=use_pallas)
    out = nn.conv1d(params["final_proj"], h * m[..., None])
    return out * m[..., None]
