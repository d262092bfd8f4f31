"""Pallas TPU kernel: fused Conv1d(k=3) + GroupNorm(8) + Mish ("Block1D").

The U-Net's Block1D (reference: /root/reference/model.py:764-775) runs
2 x (levels + mids + ups) + 1 ~= 13 times per estimator pass, i.e. 130
times per NFE=10 synthesis.  XLA fuses the norm+mish elementwise chain but
keeps conv -> norm as two HBM round trips because GroupNorm needs global
(T, C/G) statistics.  This kernel keeps the conv output tile-resident in
VMEM, computes group statistics in-register, and applies normalization +
Mish in the same pass — one HBM read of x, one HBM write of the result.

Layout: x (B, T, C) fp32/bf16, weight (3, C_in, C_out), gamma/beta (1, C).
Grid: one program per batch item; T and C are multiples of the (8, 128)
fp32 tile (frame buckets and the U-Net's 256/128-channel widths satisfy
this; other shapes fall back to the XLA path).

Masking semantics match the reference: the conv consumes `x * mask` (the
caller pre-masks), GroupNorm statistics INCLUDE padded frames
(models/nn.py group_norm docstring), and the caller re-masks the output.

Numerics: all dots run at Precision.HIGHEST, so the kernel is fp32-exact —
verified on hardware against the XLA path under
jax_default_matmul_precision=highest (maxdiff 8e-6 at T=512, C=256).
Under JAX's TPU default (bf16 matmul precision) the unfused XLA path
itself deviates by ~1e-2 per block, so with `DecoderConfig.use_pallas`
the fused kernel is the MORE precise of the two.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def conv_gn_mish(x, w, b, gamma, beta, *, groups: int, eps: float):
    """VMEM-value helper: k=3 'same' conv + GroupNorm + Mish.

    x: (T, C_in); w: (3, C_in, C_out); b/gamma/beta: (1, C_out).
    Returns (T, C_out) float32.  Shared by the Block1D and ResnetBlock1D
    kernels (ops/pallas/resnet1d.py).
    """
    t, c_in = x.shape
    c_out = w.shape[-1]

    # k=3 'same' conv as three shifted matmuls on the MXU.  fp32 inputs
    # use the HIGHEST-precision decomposition so the fused path matches
    # XLA's conv numerics to ~1e-6; bf16 inputs must use DEFAULT (Mosaic
    # rejects an fp32-precision contract on bf16 operands: "Bad lhs type").
    prec = (jax.lax.Precision.HIGHEST if x.dtype == jnp.float32
            else jax.lax.Precision.DEFAULT)
    y = jnp.dot(x, w[1], precision=prec,
                preferred_element_type=jnp.float32)
    x_prev = jnp.concatenate([jnp.zeros((1, c_in), x.dtype), x[:-1]], axis=0)
    y += jnp.dot(x_prev, w[0], precision=prec,
                 preferred_element_type=jnp.float32)
    x_next = jnp.concatenate([x[1:], jnp.zeros((1, c_in), x.dtype)], axis=0)
    y += jnp.dot(x_next, w[2], precision=prec,
                 preferred_element_type=jnp.float32)
    y += b.astype(jnp.float32)

    # GroupNorm statistics over (T, C/G) per group.  Mosaic cannot split
    # the 128-lane channel dim, so group reduction/broadcast run as
    # matmuls with a (C, G) group-membership one-hot: contiguous channel
    # blocks of size C/G map to each group.
    g = groups
    cg = c_out // g
    chan = jax.lax.broadcasted_iota(jnp.int32, (c_out, g), 0)
    grp = jax.lax.broadcasted_iota(jnp.int32, (c_out, g), 1)
    member = (chan // cg == grp).astype(jnp.float32)  # (C, G)
    inv_n = 1.0 / (t * cg)

    mean_g = jnp.dot(jnp.sum(y, axis=0, keepdims=True), member,
                     precision=prec,
                     preferred_element_type=jnp.float32) * inv_n  # (1, G)
    mean_c = jnp.dot(mean_g, member.T, precision=prec,
                     preferred_element_type=jnp.float32)          # (1, C)
    d = y - mean_c
    var_g = jnp.dot(jnp.sum(d * d, axis=0, keepdims=True), member,
                    precision=prec,
                    preferred_element_type=jnp.float32) * inv_n
    var_c = jnp.dot(var_g, member.T, precision=prec,
                    preferred_element_type=jnp.float32)
    yn = d * jax.lax.rsqrt(var_c + eps)
    yn = yn * gamma.astype(jnp.float32) + beta.astype(jnp.float32)

    # Mish(x) = x * tanh(softplus(x))
    return yn * jnp.tanh(jax.nn.softplus(yn))


def _block1d_kernel(x_ref, w_ref, b_ref, gamma_ref, beta_ref, o_ref,
                    *, groups: int, eps: float):
    """One batch item: x (1, T, C_in) -> o (1, T, C_out)."""
    out = conv_gn_mish(x_ref[0], w_ref[...], b_ref[...], gamma_ref[...],
                       beta_ref[...], groups=groups, eps=eps)
    o_ref[0] = out.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("groups", "eps", "interpret"))
def block1d_fused(x: jnp.ndarray, weight: jnp.ndarray, bias: jnp.ndarray,
                  gamma: jnp.ndarray, beta: jnp.ndarray,
                  groups: int = 8, eps: float = 1e-5,
                  interpret: bool | None = None) -> jnp.ndarray:
    """Fused Block1D: x (B, T, C_in) -> (B, T, C_out).

    Caller contract: x is already masked (x * mask); caller re-masks the
    output.  (T, C) must fit VMEM — true for every frame bucket <= 4096 at
    the U-Net widths."""
    b, t, c_in = x.shape
    c_out = weight.shape[-1]

    kernel = functools.partial(_block1d_kernel, groups=groups, eps=eps)
    return pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, t, c_in), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, c_in, c_out), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c_out), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c_out), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c_out), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, t, c_out), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, t, c_out), x.dtype),
        # None = auto: interpret on the CPU backend.  Explicit False forces
        # Mosaic lowering (used by the TPU cross-lowering regression tests).
        interpret=(jax.default_backend() == "cpu" if interpret is None
                   else interpret),
    )(x, weight, bias.reshape(1, -1), gamma.reshape(1, -1),
      beta.reshape(1, -1))


def _block1d_reference(x, weight, bias, gamma, beta, groups: int, eps: float):
    """Plain-XLA composition with the kernel's exact math (conv k=3 'same'
    -> GroupNorm incl. padded frames -> Mish); used to derive gradients."""
    from matcha_tts_tpu.models import nn

    h = nn.conv1d({"weight": weight, "bias": bias}, x, padding=1)
    h = nn.group_norm({"gamma": gamma, "beta": beta}, h, groups, eps=eps)
    return nn.mish(h)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7))
def block1d_fused_vjp(x, weight, bias, gamma, beta, groups: int = 8,
                      eps: float = 1e-5, interpret: bool | None = None):
    """Differentiable fused Block1D: Pallas forward + rematerializing VJP.

    The backward saves only the five inputs and re-derives gradients from
    the XLA reference composition (one extra forward in bwd — the same
    FLOPs-for-memory trade as `jax.checkpoint`, so the fused kernel's
    conv output and norm statistics never persist to HBM between passes).
    Forward == `block1d_fused` (fp32-exact vs XLA, module docstring);
    gradients == gradients of the XLA composition.
    """
    return block1d_fused(x, weight, bias, gamma, beta, groups=groups,
                         eps=eps, interpret=interpret)


def _block1d_vjp_fwd(x, weight, bias, gamma, beta, groups, eps, interpret):
    out = block1d_fused(x, weight, bias, gamma, beta, groups=groups, eps=eps,
                        interpret=interpret)
    return out, (x, weight, bias, gamma, beta)


def _block1d_vjp_bwd(groups, eps, interpret, res, g):
    del interpret
    x, weight, bias, gamma, beta = res
    _, vjp = jax.vjp(
        lambda *args: _block1d_reference(*args, groups=groups, eps=eps),
        x, weight, bias, gamma, beta,
    )
    return vjp(g)


block1d_fused_vjp.defvjp(_block1d_vjp_fwd, _block1d_vjp_bwd)


def block1d_pallas_ok(t: int, c_in: int, c_out: int) -> bool:
    """Shape gate: dims must map onto fp32 (8, 128) tiles and fit VMEM."""
    fits_vmem = t * max(c_in, c_out) * 4 * 3 < 12 * 1024 * 1024
    return (t % 8 == 0 and c_in % 128 == 0 and c_out % 128 == 0
            and fits_vmem)
