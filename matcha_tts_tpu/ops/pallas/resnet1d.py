"""Pallas TPU kernel: fused ResnetBlock1D (reference model.py:777-790).

The U-Net's ResnetBlock1D is Block1D -> (+ time-MLP broadcast) ->
Block1D -> (+ 1x1 residual).  With the fused Block1D kernel
(ops/pallas/block1d.py) each block avoids its internal conv->GroupNorm
HBM round trip, but the *between-block* tensors still travel to HBM:
h1 out/in, h2 out/in, plus a second read of x for the residual — at
batch 32 / T=768 / 256 ch that is ~5 round trips of a 12.6 MB tensor
per block, ~6 blocks per estimator pass, 10 passes per synthesis.

This kernel runs the whole residual block per batch item in one VMEM
pass: conv+GN+Mish (shared helper `conv_gn_mish`), the time-embedding
row add and re-mask, the second conv+GN+Mish, and the 1x1 residual —
one HBM read of x, one write of the output.

Masking semantics match models/unet.py exactly: the caller passes
x * mask; GroupNorm statistics INCLUDE padded frames; block outputs are
re-masked; the time-embedding add happens on the *masked* block-1
output and is re-masked before block 2 (algebraically identical to the
reference's unmasked add followed by block 2's input masking); the
residual-conv output is NOT masked (model.py:790 adds it raw).

Numerics: intermediates stay fp32 in VMEM; for bf16 inputs the
block-1 output is rounded to bf16 before conv 2, matching the XLA
path's bf16 activation store.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from matcha_tts_tpu.ops.pallas.block1d import conv_gn_mish


def _resnet_kernel(x_ref, m_ref, temb_ref, w1_ref, b1_ref, g1_ref, be1_ref,
                   w2_ref, b2_ref, g2_ref, be2_ref, wr_ref, br_ref, o_ref,
                   *, groups: int, eps: float):
    """One batch item: x (1, T, C_in) pre-masked, m (1, T, 1),
    temb (1, 1, C_out) -> o (1, T, C_out)."""
    x = x_ref[0]          # (T, C_in)
    m = m_ref[0].astype(jnp.float32)  # (T, 1)
    prec = (jax.lax.Precision.HIGHEST if x.dtype == jnp.float32
            else jax.lax.Precision.DEFAULT)

    h = conv_gn_mish(x, w1_ref[...], b1_ref[...], g1_ref[...], be1_ref[...],
                     groups=groups, eps=eps)            # (T, C) fp32
    h = h * m + temb_ref[0].astype(jnp.float32)         # masked + row bcast
    h = (h * m).astype(x.dtype)                         # block-2 input mask
    h = conv_gn_mish(h, w2_ref[...], b2_ref[...], g2_ref[...], be2_ref[...],
                     groups=groups, eps=eps)
    h = h * m

    res = jnp.dot(x, wr_ref[...], precision=prec,
                  preferred_element_type=jnp.float32)
    res += br_ref[...].astype(jnp.float32)
    o_ref[0] = (h + res).astype(o_ref.dtype)


def resnet1d_pallas_ok(t: int, c_in: int, c_out: int) -> bool:
    """Shape gate: (8, 128)-tileable dims and a VMEM budget that covers
    x + two fp32 intermediates + weights.  The 8 MB cap (vs ~16 MB VMEM)
    leaves headroom for the pipeline's double-buffered input/output
    blocks; the largest batch-mode bucket at up-path widths (T=2048,
    c_in=512) intentionally falls back to the Block1D pair."""
    fits = (t * c_in + 2 * t * c_out) * 4 + 6 * c_in * c_out * 4 \
        < 8 * 1024 * 1024
    return (t % 8 == 0 and c_in % 128 == 0 and c_out % 128 == 0 and fits)


@functools.partial(jax.jit, static_argnames=("groups", "eps", "interpret"))
def resnet1d_fused(x, mask, temb_row, p1, p2, res_w, res_b,
                   groups: int = 8, eps: float = 1e-5,
                   interpret: bool | None = None):
    """Fused ResnetBlock1D.

    x: (B, T, C_in) ALREADY masked; mask: (B, T); temb_row: (B, C_out)
    (the time-MLP output row, nn.linear(mlp, mish(t_emb)));
    p1/p2: {"conv": {weight (3, C, C'), bias}, "norm": {gamma, beta}};
    res_w: (C_in, C_out) 1x1 conv weight; res_b: (C_out,).
    Returns (B, T, C_out), unmasked tail exactly like the XLA path.
    """
    b, t, c_in = x.shape
    c_out = p1["conv"]["weight"].shape[-1]
    if interpret is None:
        interpret = jax.default_backend() == "cpu"

    def vec(a):
        return a.reshape(1, -1)

    kernel = functools.partial(_resnet_kernel, groups=groups, eps=eps)
    full = lambda shape: pl.BlockSpec(shape, lambda i: (0,) * len(shape))
    return pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, t, c_in), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, t, 1), lambda i: (i, 0, 0)),
            # (B, 1, C): unit sublane dim keeps the (sublane, lane) block
            # legal for a per-item row vector
            pl.BlockSpec((1, 1, c_out), lambda i: (i, 0, 0)),
            full((3, c_in, c_out)), full((1, c_out)), full((1, c_out)),
            full((1, c_out)),
            full((3, c_out, c_out)), full((1, c_out)), full((1, c_out)),
            full((1, c_out)),
            full((c_in, c_out)), full((1, c_out)),
        ],
        out_specs=pl.BlockSpec((1, t, c_out), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b, t, c_out), x.dtype),
        interpret=interpret,
    )(x, mask[..., None], temb_row[:, None, :],
      p1["conv"]["weight"], vec(p1["conv"]["bias"]),
      vec(p1["norm"]["gamma"]), vec(p1["norm"]["beta"]),
      p2["conv"]["weight"], vec(p2["conv"]["bias"]),
      vec(p2["norm"]["gamma"]), vec(p2["norm"]["beta"]),
      res_w, vec(res_b))


def _resnet_reference(x, mask, temb_row, p1, p2, res_w, res_b,
                      groups: int, eps: float):
    """Plain-XLA composition with the kernel's exact semantics; used to
    derive gradients (same remat trade as block1d_fused_vjp)."""
    from matcha_tts_tpu.models import nn

    m = mask[..., None]
    h = nn.conv1d(p1["conv"], x, padding=1)
    h = nn.mish(nn.group_norm(p1["norm"], h, groups, eps=eps)) * m
    h = (h + temb_row[:, None, :]) * m
    h = nn.conv1d(p2["conv"], h.astype(x.dtype), padding=1)
    h = nn.mish(nn.group_norm(p2["norm"], h, groups, eps=eps)) * m
    res = jnp.einsum("btc,cd->btd", x, res_w) + res_b
    return h + res.astype(h.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8, 9))
def resnet1d_fused_vjp(x, mask, temb_row, p1, p2, res_w, res_b,
                       groups: int = 8, eps: float = 1e-5,
                       interpret: bool | None = None):
    """Differentiable fused ResnetBlock1D: Pallas forward +
    rematerializing VJP (gradients of the XLA reference composition)."""
    return resnet1d_fused(x, mask, temb_row, p1, p2, res_w, res_b,
                          groups=groups, eps=eps, interpret=interpret)


def _resnet_vjp_fwd(x, mask, temb_row, p1, p2, res_w, res_b, groups, eps,
                    interpret):
    out = resnet1d_fused(x, mask, temb_row, p1, p2, res_w, res_b,
                         groups=groups, eps=eps, interpret=interpret)
    return out, (x, mask, temb_row, p1, p2, res_w, res_b)


def _resnet_vjp_bwd(groups, eps, interpret, res, g):
    del interpret
    x, mask, temb_row, p1, p2, res_w, res_b = res
    _, vjp = jax.vjp(
        lambda *args: _resnet_reference(*args, groups=groups, eps=eps),
        x, mask, temb_row, p1, p2, res_w, res_b)
    return vjp(g)


resnet1d_fused_vjp.defvjp(_resnet_vjp_fwd, _resnet_vjp_bwd)
