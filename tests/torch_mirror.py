"""Torch mirror of the reference architecture, used ONLY as a parity oracle.

These modules re-state the reference's math (cited per class) with weights
*injected from the JAX parameter tree*, so tests verify that our XLA
implementation computes the same function as the PyTorch graph would.
Everything runs in eval mode / fp32 on CPU.
"""

from __future__ import annotations

import math

import numpy as np
import torch
import torch.nn.functional as F


def t_(x) -> torch.Tensor:
    return torch.from_numpy(np.asarray(x, dtype=np.float32))


def conv_w(p) -> torch.Tensor:
    # (W, I, O) -> torch Conv1d (O, I, W)
    return t_(p["weight"]).permute(2, 1, 0).contiguous()


def convT_w(p) -> torch.Tensor:
    # our stored transpose-conv weight is pre-flipped (W, I, O);
    # torch ConvTranspose1d wants (I, O, W) unflipped
    return t_(p["weight"]).flip(0).permute(1, 2, 0).contiguous()


def lin_w(p) -> torch.Tensor:
    # (I, O) -> torch Linear (O, I)
    return t_(p["weight"]).t().contiguous()


def channel_layer_norm(p, x: torch.Tensor, eps=1e-4) -> torch.Tensor:
    """Reference LayerNorm over dim 1 of (B, C, T) (model.py:148-166)."""
    mean = x.mean(1, keepdim=True)
    var = ((x - mean) ** 2).mean(1, keepdim=True)
    x = (x - mean) * torch.rsqrt(var + eps)
    return x * t_(p["gamma"]).view(1, -1, 1) + t_(p["beta"]).view(1, -1, 1)


def conv1d(p, x, stride=1, padding=0, dilation=1):
    return F.conv1d(x, conv_w(p), t_(p["bias"]) if "bias" in p else None,
                    stride=stride, padding=padding, dilation=dilation)


def conv_transpose1d(p, x, stride, padding):
    return F.conv_transpose1d(x, convT_w(p), t_(p["bias"]) if "bias" in p else None,
                              stride=stride, padding=padding)


def linear(p, x):
    return F.linear(x, lin_w(p), t_(p["bias"]) if "bias" in p else None)


# --------------------------------------------------------------------------
# Encoder side (model.py:171-535)
# --------------------------------------------------------------------------


def conv_relu_norm(p, x, x_mask, kernel_size=5):
    x_org = x
    pad = kernel_size // 2
    for cp, npm in zip(p["conv_layers"], p["norm_layers"]):
        x = conv1d(cp, x * x_mask, padding=pad)
        x = channel_layer_norm(npm, x)
        x = torch.relu(x)
    return (x_org + conv1d(p["proj"], x)) * x_mask


def duration_predictor(p, x, x_mask, kernel_size=3):
    pad = kernel_size // 2
    x = conv1d(p["conv_1"], x * x_mask, padding=pad)
    x = torch.relu(x)
    x = channel_layer_norm(p["norm_1"], x)
    x = conv1d(p["conv_2"], x * x_mask, padding=pad)
    x = torch.relu(x)
    x = channel_layer_norm(p["norm_2"], x)
    x = conv1d(p["proj"], x * x_mask)
    return x * x_mask


def rope(x: torch.Tensor, d: int) -> torch.Tensor:
    """model.py:244-292: x (B, H, T, Dh); rotate first d dims."""
    b, h, t, dh = x.shape
    theta = 1.0 / (10000.0 ** (torch.arange(0, d, 2).float() / d))
    idx_theta = torch.einsum("n,d->nd", torch.arange(t).float(), theta)
    idx2 = torch.cat([idx_theta, idx_theta], dim=1)
    cos, sin = idx2.cos(), idx2.sin()
    x_rope, x_pass = x[..., :d], x[..., d:]
    d2 = d // 2
    neg_half = torch.cat([-x_rope[..., d2:], x_rope[..., :d2]], dim=-1)
    x_rope = x_rope * cos[None, None] + neg_half * sin[None, None]
    return torch.cat([x_rope, x_pass], dim=-1)


def mha(p, x, attn_mask, n_heads):
    """model.py:294-365 (self-attention, eval mode)."""
    b, c, t = x.shape
    q = conv1d(p["conv_q"], x)
    k = conv1d(p["conv_k"], x)
    v = conv1d(p["conv_v"], x)
    hd = c // n_heads

    def split(a):
        return a.view(b, n_heads, hd, t).transpose(2, 3)

    q, k, v = split(q), split(k), split(v)
    d_rope = int(hd * 0.5)
    q, k = rope(q, d_rope), rope(k, d_rope)
    scores = torch.matmul(q, k.transpose(-2, -1)) / math.sqrt(hd)
    scores = scores.masked_fill(attn_mask == 0, -1e4)
    p_attn = F.softmax(scores, dim=-1)
    out = torch.matmul(p_attn, v)
    out = out.transpose(2, 3).contiguous().view(b, c, t)
    return conv1d(p["conv_o"], out)


def ffn(p, x, x_mask, kernel_size=3):
    pad = kernel_size // 2
    x = conv1d(p["conv_1"], x * x_mask, padding=pad)
    x = torch.relu(x)
    x = conv1d(p["conv_2"], x * x_mask, padding=pad)
    return x * x_mask


def encoder(p, x, x_mask, n_heads, kernel_size=3):
    attn_mask = x_mask.unsqueeze(2) * x_mask.unsqueeze(-1)
    for layer in p["layers"]:
        x = x * x_mask
        y = mha(layer["attn"], x, attn_mask, n_heads)
        x = channel_layer_norm(layer["norm_1"], x + y)
        y = ffn(layer["ffn"], x, x_mask, kernel_size)
        x = channel_layer_norm(layer["norm_2"], x + y)
    return x * x_mask


def text_encoder(p, x_ids, x_mask, n_channels, n_heads, kernel_size=3):
    emb = t_(p["emb"]["weight"])
    x = emb[x_ids] * math.sqrt(n_channels)
    x = x.transpose(1, 2)  # (B, C, T)
    if "prenet" in p:
        x = conv_relu_norm(p["prenet"], x, x_mask)
    x = encoder(p["encoder"], x, x_mask, n_heads, kernel_size)
    mu = conv1d(p["proj_m"], x) * x_mask
    logw = duration_predictor(p["proj_w"], x, x_mask)
    return mu, logw


# --------------------------------------------------------------------------
# Decoder / U-Net side (model.py:576-1048)
# --------------------------------------------------------------------------


def snake_beta(p, x):
    x = linear(p["proj"], x)
    alpha, beta = torch.exp(t_(p["alpha"])), torch.exp(t_(p["beta"]))
    return x + (1.0 / (beta + 1e-9)) * torch.sin(x * alpha) ** 2


def feed_forward(p, x):
    return linear(p["out"], snake_beta(p["act"], x))


def dec_attention(p, x, key_mask, heads, dim_head):
    b, t, _ = x.shape
    q = linear(p["to_q"], x).view(b, t, heads, dim_head).permute(0, 2, 1, 3)
    k = linear(p["to_k"], x).view(b, t, heads, dim_head).permute(0, 2, 1, 3)
    v = linear(p["to_v"], x).view(b, t, heads, dim_head).permute(0, 2, 1, 3)
    sim = torch.einsum("bhid,bhjd->bhij", q, k) * dim_head ** -0.5
    mask = key_mask.unsqueeze(1).unsqueeze(1)
    sim = sim.masked_fill(mask == 0, torch.finfo(sim.dtype).min)
    attn = sim.softmax(dim=-1)
    out = torch.einsum("bhij,bhjd->bhid", attn, v)
    out = out.permute(0, 2, 1, 3).reshape(b, t, heads * dim_head)
    return linear(p["to_out"], out)


def torch_layer_norm(p, x, eps=1e-5):
    return F.layer_norm(x, (x.shape[-1],), t_(p["gamma"]), t_(p["beta"]), eps)


def transformer_block(p, x, key_mask, heads, dim_head):
    h = torch_layer_norm(p["norm1"], x)
    x = x + dec_attention(p["attn1"], h, key_mask, heads, dim_head)
    h = torch_layer_norm(p["norm3"], x)
    return x + feed_forward(p["ff"], h)


def sinusoidal_pos_emb(t, dim, scale=1000.0):
    half = dim // 2
    emb = math.log(10000) / (half - 1)
    emb = torch.exp(torch.arange(half).float() * -emb)
    emb = scale * t.unsqueeze(1) * emb.unsqueeze(0)
    return torch.cat((emb.sin(), emb.cos()), dim=-1)


def timestep_embedding(p, e):
    return linear(p["linear_2"], F.silu(linear(p["linear_1"], e)))


def block1d(p, x, mask, groups=8):
    h = conv1d(p["conv"], x * mask, padding=1)
    h = F.group_norm(h, groups, t_(p["norm"]["gamma"]), t_(p["norm"]["beta"]))
    return F.mish(h) * mask


def resnet_block1d(p, x, mask, t_emb):
    h = block1d(p["block1"], x, mask)
    h = h + linear(p["mlp"], F.mish(t_emb)).unsqueeze(-1)
    h = block1d(p["block2"], h, mask)
    return h + conv1d(p["res_conv"], x * mask)


def unet_decoder(p, x, mask, mu, t, heads, dim_head):
    """model.py:964-1048 on (B, C, T) tensors."""
    in_ch = x.shape[1] + mu.shape[1]
    t_emb = timestep_embedding(p["time_mlp"], sinusoidal_pos_emb(t, in_ch))
    x = torch.cat([x, mu], dim=1)

    hiddens, masks = [], [mask]
    n_levels = len(p["down_blocks"])
    for i, level in enumerate(p["down_blocks"]):
        m = masks[-1]
        x = resnet_block1d(level["resnet"], x, m, t_emb)
        xt = x.transpose(1, 2)
        for tb in level["transformer_blocks"]:
            xt = transformer_block(tb, xt, m.squeeze(1), heads, dim_head)
        x = xt.transpose(1, 2)
        hiddens.append(x)
        if i < n_levels - 1:
            x = conv1d(level["downsample"], x * m, stride=2, padding=1)
            masks.append(m[:, :, ::2])
        else:
            x = conv1d(level["downsample"], x * m, padding=1)
            masks.append(m)

    masks = masks[:-1]
    m_mid = masks[-1]
    for block in p["mid_blocks"]:
        x = resnet_block1d(block["resnet"], x, m_mid, t_emb)
        xt = x.transpose(1, 2)
        for tb in block["transformer_blocks"]:
            xt = transformer_block(tb, xt, m_mid.squeeze(1), heads, dim_head)
        x = xt.transpose(1, 2)

    n_ups = len(p["up_blocks"])
    for i, level in enumerate(p["up_blocks"]):
        m = masks.pop()
        skip = hiddens.pop()
        x = torch.cat([x, skip], dim=1)
        x = resnet_block1d(level["resnet"], x, m, t_emb)
        xt = x.transpose(1, 2)
        for tb in level["transformer_blocks"]:
            xt = transformer_block(tb, xt, m.squeeze(1), heads, dim_head)
        x = xt.transpose(1, 2)
        if i < n_ups - 1:
            x = conv_transpose1d(level["upsample"], x * m, stride=2, padding=1)
        else:
            x = conv1d(level["upsample"], x * m, padding=1)

    x = block1d(p["final_block"], x, mask)
    out = conv1d(p["final_proj"], x * mask)
    return out * mask


# --------------------------------------------------------------------------
# HiFi-GAN generator (hifigan/models.py:14-197), weight-norm folded
# --------------------------------------------------------------------------


def hifigan_resblock1(p, x, kernel_size, dilations=(1, 3, 5)):
    for c1, c2, d in zip(p["convs1"], p["convs2"], dilations):
        xt = F.leaky_relu(x, 0.1)
        xt = conv1d(c1, xt, padding=(kernel_size * d - d) // 2, dilation=d)
        xt = F.leaky_relu(xt, 0.1)
        xt = conv1d(c2, xt, padding=(kernel_size - 1) // 2)
        x = xt + x
    return x


def hifigan_generator(p, mel, cfg):
    """mel: (B, 80, T) -> (B, 1, T*256)."""
    x = conv1d(p["conv_pre"], mel, padding=3)
    n_kernels = len(cfg.resblock_kernel_sizes)
    for i, (u, k) in enumerate(zip(cfg.upsample_rates, cfg.upsample_kernel_sizes)):
        x = F.leaky_relu(x, 0.1)
        x = conv_transpose1d(p["ups"][i], x, stride=u, padding=(k - u) // 2)
        xs = None
        for j in range(n_kernels):
            rb = p["resblocks"][i * n_kernels + j]
            y = hifigan_resblock1(rb, x, cfg.resblock_kernel_sizes[j],
                                  cfg.resblock_dilation_sizes[j])
            xs = y if xs is None else xs + y
        x = xs / n_kernels
    x = F.leaky_relu(x)  # default slope 0.01 (models.py:193)
    x = conv1d(p["conv_post"], x, padding=3)
    return torch.tanh(x)


# --------------------------------------------------------------------------
# Vocos vocoder (beyond-parity family; oracle for matcha_tts_tpu/models/vocos.py)
# --------------------------------------------------------------------------


def _vocos_ln(p, x, eps=1e-6):
    return F.layer_norm(x, (x.shape[-1],), t_(p["gamma"]), t_(p["beta"]), eps)


def vocos_generate(p, mel, cfg):
    """mel: (B, num_mels, T) -> (B, T*hop) audio.

    Independent restatement of the Vocos forward (ConvNeXt backbone +
    exp-magnitude/phase iSTFT head) using torch ops INCLUDING torch.istft —
    so the test also cross-checks our reshape-OLA iSTFT and the
    last-frame edge-replication that fixes the sample count at T*hop.
    """
    pad = cfg.kernel_size // 2
    x = conv1d(p["embed"], mel, padding=pad).transpose(1, 2)  # (B, T, D)
    x = _vocos_ln(p["norm_pre"], x)
    for blk in p["blocks"]:
        r = x
        h = F.conv1d(x.transpose(1, 2), conv_w(blk["dwconv"]),
                     t_(blk["dwconv"]["bias"]), padding=pad,
                     groups=cfg.dim).transpose(1, 2)
        h = _vocos_ln(blk["norm"], h)
        h = linear(blk["pw1"], h)
        h = F.gelu(h)
        h = linear(blk["pw2"], h)
        x = r + t_(blk["gamma"]) * h
    x = _vocos_ln(p["norm_post"], x)
    h = linear(p["head"], x)  # (B, T, n_fft + 2)
    n_freqs = cfg.n_fft // 2 + 1
    mag = torch.exp(h[..., :n_freqs]).clamp(max=cfg.mag_clip)
    phase = h[..., n_freqs:]
    spec = (mag * torch.exp(1j * phase)).transpose(1, 2)  # (B, F, T)
    spec = torch.cat([spec, spec[..., -1:]], dim=-1)  # edge-replicate
    return torch.istft(spec, cfg.n_fft, cfg.hop_length, cfg.n_fft,
                       torch.hann_window(cfg.n_fft), center=True)


def vocos_generate_official(sd, mel, cfg):
    """Official-layout Vocos forward consuming a raw official-named state
    dict (charactr/vocos VocosBackbone.forward + ISTFTHead.forward
    restated) — the oracle for params/convert.py::convert_vocos: tensors
    here use torch-native layouts ((O, I, W) convs, (O, I) linears), so
    agreement with our generate() on the converted tree proves every
    transpose in the mapping."""
    t = lambda k: torch.from_numpy(np.asarray(sd[k], np.float32))
    x = F.conv1d(mel, t("backbone.embed.weight"), t("backbone.embed.bias"),
                 padding=cfg.kernel_size // 2)
    x = x.transpose(1, 2)
    x = F.layer_norm(x, (cfg.dim,), t("backbone.norm.weight"),
                     t("backbone.norm.bias"), 1e-6)
    n_layers = len({k.split(".")[2] for k in sd
                    if k.startswith("backbone.convnext.")})
    for i in range(n_layers):
        p = f"backbone.convnext.{i}"
        r = x
        h = F.conv1d(x.transpose(1, 2), t(f"{p}.dwconv.weight"),
                     t(f"{p}.dwconv.bias"), padding=cfg.kernel_size // 2,
                     groups=cfg.dim).transpose(1, 2)
        h = F.layer_norm(h, (cfg.dim,), t(f"{p}.norm.weight"),
                         t(f"{p}.norm.bias"), 1e-6)
        h = F.linear(h, t(f"{p}.pwconv1.weight"), t(f"{p}.pwconv1.bias"))
        h = F.gelu(h)
        h = F.linear(h, t(f"{p}.pwconv2.weight"), t(f"{p}.pwconv2.bias"))
        x = r + t(f"{p}.gamma") * h
    x = F.layer_norm(x, (cfg.dim,), t("backbone.final_layer_norm.weight"),
                     t("backbone.final_layer_norm.bias"), 1e-6)
    h = F.linear(x, t("head.out.weight"), t("head.out.bias")).transpose(1, 2)
    mag, p = h.chunk(2, dim=1)
    mag = torch.exp(mag).clamp(max=cfg.mag_clip)
    spec = mag * (torch.cos(p) + 1j * torch.sin(p))
    spec = torch.cat([spec, spec[..., -1:]], dim=-1)  # edge-replicate
    return torch.istft(spec, cfg.n_fft, cfg.hop_length, cfg.n_fft,
                       torch.hann_window(cfg.n_fft), center=True)
