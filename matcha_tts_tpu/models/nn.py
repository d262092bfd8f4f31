"""Functional NN primitives in TPU-native (B, T, C) channels-last layout.

This framework keeps parameters as plain nested dicts (pytrees) and layers
as pure functions — no module framework in the hot path, nothing between
the model code and XLA.  Conventions:

* activations: (batch, time, channels) — channels last so convolutions and
  matmuls tile directly onto the MXU (the torch reference is (B, C, T)).
* conv weights: (width, in, out) = XLA 'WIO' (torch is (out, in, width));
  linear weights: (in, out) (torch is (out, in)).  The checkpoint converter
  (matcha_tts_tpu/params/convert.py) performs the transposes.
* initializers reproduce the torch defaults the reference relies on
  (kaiming-uniform fan-in for Conv1d/Linear, xavier-uniform where the
  reference calls it explicitly — model.py:327-332).
* masks are (B, T) floats (1 = valid); `x * mask[..., None]` replaces the
  reference's (B, 1, T) broadcasting.
"""

from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp


class Rng:
    """Deterministic per-call-site key stream for dropout.

    Under `jit` the call sequence is static, so folding in an incrementing
    counter yields a reproducible, collision-free stream.  Pass `None` for
    inference (all dropout disabled).
    """

    def __init__(self, key: Optional[jax.Array]):
        self._key = key
        self._n = 0

    def next(self) -> Optional[jax.Array]:
        if self._key is None:
            return None
        self._n += 1
        return jax.random.fold_in(self._key, self._n)


def dropout(x: jnp.ndarray, rate: float, rng: Rng) -> jnp.ndarray:
    key = rng.next() if rng is not None else None
    if key is None or rate == 0.0:
        return x
    keep = 1.0 - rate
    mask = jax.random.bernoulli(key, keep, x.shape)
    return jnp.where(mask, x / keep, 0.0)


# ---------------------------------------------------------------------------
# initializers (torch-default compatible)
# ---------------------------------------------------------------------------


def kaiming_uniform(key, shape, fan_in: int, dtype=jnp.float32):
    """torch's default Conv/Linear weight init: U(-1/sqrt(fan_in), +)."""
    bound = 1.0 / math.sqrt(fan_in)
    return jax.random.uniform(key, shape, dtype, -bound, bound)


def xavier_uniform(key, shape, fan_in: int, fan_out: int, dtype=jnp.float32):
    bound = math.sqrt(6.0 / (fan_in + fan_out))
    return jax.random.uniform(key, shape, dtype, -bound, bound)


def init_conv1d(key, in_ch: int, out_ch: int, width: int, bias: bool = True,
                xavier: bool = False, zero: bool = False, dtype=jnp.float32):
    """Conv1d params {weight: (W, I, O)[, bias: (O,)]}, torch-equivalent init."""
    kw, kb = jax.random.split(key)
    fan_in = in_ch * width
    if zero:
        w = jnp.zeros((width, in_ch, out_ch), dtype)
    elif xavier:
        w = xavier_uniform(kw, (width, in_ch, out_ch), fan_in, out_ch * width, dtype)
    else:
        w = kaiming_uniform(kw, (width, in_ch, out_ch), fan_in, dtype)
    p = {"weight": w}
    if bias:
        p["bias"] = (jnp.zeros((out_ch,), dtype) if zero
                     else kaiming_uniform(kb, (out_ch,), fan_in, dtype))
    return p


def init_linear(key, in_f: int, out_f: int, bias: bool = True, dtype=jnp.float32):
    kw, kb = jax.random.split(key)
    p = {"weight": kaiming_uniform(kw, (in_f, out_f), in_f, dtype)}
    if bias:
        p["bias"] = kaiming_uniform(kb, (out_f,), in_f, dtype)
    return p


def init_norm(ch: int, dtype=jnp.float32):
    return {"gamma": jnp.ones((ch,), dtype), "beta": jnp.zeros((ch,), dtype)}


def init_embedding(key, n_vocab: int, dim: int, std: float, dtype=jnp.float32):
    return {"weight": jax.random.normal(key, (n_vocab, dim), dtype) * std}


# ---------------------------------------------------------------------------
# layer applications
# ---------------------------------------------------------------------------


def conv1d(params, x: jnp.ndarray, stride: int = 1, padding: int = 0,
           dilation: int = 1, groups: int = 1) -> jnp.ndarray:
    """1D convolution, torch.nn.Conv1d semantics, (B, T, C) layout.

    `groups=C` with a (W, 1, C) weight is a depthwise conv (torch
    Conv1d(groups=C)).  When `x` is bf16 the MXU runs bf16 multiplies
    with fp32 internal accumulation — the TPU equivalent of the
    reference's "16-mixed" AMP (train_standalone.py:764).  fp32 inputs
    request an explicit fp32 result type; bf16 inputs do not (lax.conv's
    transpose rule cannot differentiate a preferred_element_type upcast,
    and the MXU accumulates fp32 internally either way)."""
    pet = jnp.float32 if x.dtype == jnp.float32 else None
    out = jax.lax.conv_general_dilated(
        x,
        params["weight"].astype(x.dtype),
        window_strides=(stride,),
        padding=[(padding, padding)],
        rhs_dilation=(dilation,),
        dimension_numbers=("NWC", "WIO", "NWC"),
        feature_group_count=groups,
        preferred_element_type=pet,
    )
    out = out.astype(x.dtype)
    if "bias" in params:
        out = out + params["bias"].astype(x.dtype)
    return out


def conv_transpose1d(params, x: jnp.ndarray, stride: int, padding: int) -> jnp.ndarray:
    """torch.nn.ConvTranspose1d semantics via an lhs-dilated convolution.

    torch stores transposed-conv weights as (in, out, W); the converter maps
    them to (W, I, O) with the kernel ALREADY flipped, so here we run a
    plain conv with lhs_dilation = stride and padding (W - 1 - padding).
    Output length = (T-1)*stride - 2*padding + W.
    """
    w = params["weight"].astype(x.dtype)
    width = w.shape[0]
    pad = width - 1 - padding
    out = jax.lax.conv_general_dilated(
        x,
        w,
        window_strides=(1,),
        padding=[(pad, pad)],
        lhs_dilation=(stride,),
        dimension_numbers=("NWC", "WIO", "NWC"),
        # see conv1d: fp32 requests an fp32 result; bf16 must not (grad)
        preferred_element_type=(jnp.float32 if x.dtype == jnp.float32
                                else None),
    )
    out = out.astype(x.dtype)
    if "bias" in params:
        out = out + params["bias"].astype(x.dtype)
    return out


def init_conv_transpose1d(key, in_ch: int, out_ch: int, width: int,
                          bias: bool = True, dtype=jnp.float32):
    """ConvTranspose1d params; torch init uses fan_in = out_ch * width
    (from its (in, out, W) weight shape).  Stored pre-flipped as (W, I, O)."""
    kw, kb = jax.random.split(key)
    fan_in = out_ch * width  # torch _ConvTransposeNd fan-in quirk
    w = kaiming_uniform(kw, (width, in_ch, out_ch), fan_in, dtype)
    p = {"weight": w}
    if bias:
        p["bias"] = kaiming_uniform(kb, (out_ch,), fan_in, dtype)
    return p


def linear(params, x: jnp.ndarray) -> jnp.ndarray:
    out = jnp.einsum("...i,io->...o", x, params["weight"].astype(x.dtype),
                     preferred_element_type=jnp.float32).astype(x.dtype)
    if "bias" in params:
        out = out + params["bias"].astype(x.dtype)
    return out


def channel_layer_norm(params, x: jnp.ndarray, eps: float = 1e-4) -> jnp.ndarray:
    """The reference's custom LayerNorm over channels with eps 1e-4 and
    rsqrt normalization (model.py:148-166); channels-last here.
    Statistics are computed in fp32 regardless of the compute dtype."""
    dtype = x.dtype
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
    xf = (xf - mean) * jax.lax.rsqrt(var + eps)
    out = xf * params["gamma"] + params["beta"]
    return out.astype(dtype)


def layer_norm(params, x: jnp.ndarray, eps: float = 1e-5) -> jnp.ndarray:
    """torch.nn.LayerNorm semantics (decoder blocks, model.py:720,730);
    fp32 statistics."""
    dtype = x.dtype
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
    xf = (xf - mean) * jax.lax.rsqrt(var + eps)
    return (xf * params["gamma"] + params["beta"]).astype(dtype)


def group_norm(params, x: jnp.ndarray, num_groups: int, eps: float = 1e-5) -> jnp.ndarray:
    """torch.nn.GroupNorm on (B, T, C): statistics over (T, C/G) per group,
    computed in fp32.

    NOTE (parity): like the reference (model.py:764-775), padded time steps
    participate in the statistics — inputs are masked before the preceding
    conv, not inside the norm.
    """
    b, t, c = x.shape
    g = num_groups
    dtype = x.dtype
    xg = x.astype(jnp.float32).reshape(b, t, g, c // g)
    mean = jnp.mean(xg, axis=(1, 3), keepdims=True)
    var = jnp.mean(jnp.square(xg - mean), axis=(1, 3), keepdims=True)
    xg = (xg - mean) * jax.lax.rsqrt(var + eps)
    out = xg.reshape(b, t, c) * params["gamma"] + params["beta"]
    return out.astype(dtype)


def mish(x: jnp.ndarray) -> jnp.ndarray:
    return x * jnp.tanh(jax.nn.softplus(x))


def embedding(params, ids: jnp.ndarray) -> jnp.ndarray:
    return jnp.take(params["weight"], ids, axis=0)
