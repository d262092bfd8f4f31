"""VMEM-resident attention for the U-Net transformer blocks.

The XLA path for the decoder attention (reference
/root/reference/model.py:646-705) materializes the full (B, H, T, T)
score tensor in HBM: at batch 32 / T=768 / bf16 that is ~75 MB written
and re-read around an HBM softmax, ~1 ms of pure bandwidth per
full-resolution block.  The upstream Pallas flash kernel
(ops/pallas/attention.py) avoids the traffic but measured SLOWER in
context (docs/RESULTS.md): its online-softmax machinery, many small
grid blocks, and segment-id plumbing are overhead this problem does not
need — the U-Net's score matrix for one (batch, head) is at most
(1024, 1024) fp32 = 4 MB and simply *fits in VMEM*.

So this kernel does the obvious thing: one grid program per batch item,
whole rows of scores resident in VMEM, plain (not online) softmax, two
MXU dots per head.  Heads stay packed in lanes — inputs/outputs are the
projection layout (B, T, H*D), so the caller needs no reshape or
transpose at all; the per-head split is a static lane slice.  Query
rows are processed in static row tiles to bound VMEM at large T.

Semantics match the XLA einsum path EXACTLY at every position —
including padded query rows (uniform attention over valid keys), unlike
the flash kernel whose padded rows emit junk.  Masked keys get an
additive -1e30 bias; after row-max subtraction their weight underflows
to exactly 0 in fp32, same as the dtype-min fill (model.py:693-697).

Precision follows ops/pallas/block1d.py: fp32 inputs run
HIGHEST-precision dots (parity with XLA), bf16 inputs run the MXU's
native bf16 (Mosaic rejects HIGHEST on bf16 operands).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

_NEG = -1e30
_ROW_TILE = 512  # query rows per in-kernel step; bounds scores at 2 MB fp32


def _attn_kernel(q_ref, k_ref, v_ref, m_ref, o_ref, *, sm_scale: float,
                 heads: int, row_tile: int):
    """One batch item: q,k,v (1, T, H*D), mask (1, 1, T) -> o (1, T, H*D)."""
    q = q_ref[0]  # (T, H*D)
    k = k_ref[0]
    v = v_ref[0]
    t, inner = q.shape
    d = inner // heads
    prec = (jax.lax.Precision.HIGHEST if q.dtype == jnp.float32
            else jax.lax.Precision.DEFAULT)

    # additive key-padding bias, broadcast over query rows: (1, T)
    bias = jnp.where(m_ref[0] == 0.0, _NEG, 0.0).astype(jnp.float32)

    for h in range(heads):
        kh = k[:, h * d:(h + 1) * d]  # (T, D)
        vh = v[:, h * d:(h + 1) * d]
        for r0 in range(0, t, row_tile):
            qr = q[r0:r0 + row_tile, h * d:(h + 1) * d]  # (R, D)
            s = jax.lax.dot_general(
                qr, kh, (((1,), (1,)), ((), ())), precision=prec,
                preferred_element_type=jnp.float32) * sm_scale  # (R, T)
            s = s + bias
            s = s - jnp.max(s, axis=1, keepdims=True)
            e = jnp.exp(s)
            p = e / jnp.sum(e, axis=1, keepdims=True)
            o = jnp.dot(p.astype(vh.dtype), vh, precision=prec,
                        preferred_element_type=jnp.float32)  # (R, D)
            o_ref[0, r0:r0 + row_tile, h * d:(h + 1) * d] = (
                o.astype(o_ref.dtype))


def attn_vmem_ok(t: int, dim_head: int) -> bool:
    """Shape gate: row tiles must cover T exactly; head dim must map onto
    dense-enough lanes; scores (ROW_TILE, T) fp32 must fit VMEM."""
    return (t % 8 == 0 and dim_head % 64 == 0
            and t * min(t, _ROW_TILE) * 4 <= 8 * 1024 * 1024)


@functools.partial(jax.jit, static_argnames=("heads", "sm_scale",
                                             "interpret"))
def vmem_mha_packed(q, k, v, key_mask, *, heads: int, sm_scale: float,
                    interpret: bool | None = None):
    """q, k, v: (B, T, H*D) projection layout; key_mask: (B, T) 1=keep.

    Returns (B, T, H*D).  Bit-compatible with the XLA einsum path at
    every position (padded query rows included); see module docstring."""
    b, t, inner = q.shape
    if interpret is None:
        interpret = jax.default_backend() == "cpu"

    qkv_spec = pl.BlockSpec((1, t, inner), lambda i: (i, 0, 0))
    # (B, 1, T): unit sublane dim keeps the (sublane, lane) block legal
    m_spec = pl.BlockSpec((1, 1, t), lambda i: (i, 0, 0))
    kernel = functools.partial(_attn_kernel, sm_scale=sm_scale, heads=heads,
                               row_tile=min(t, _ROW_TILE))
    return pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=[qkv_spec, qkv_spec, qkv_spec, m_spec],
        out_specs=qkv_spec,
        out_shape=jax.ShapeDtypeStruct((b, t, inner), q.dtype),
        interpret=interpret,
    )(q, k, v, key_mask.astype(jnp.float32)[:, None, :])


def vmem_mha(q, k, v, key_mask, *, sm_scale: float,
             interpret: bool | None = None):
    """(B, T, H, D) convenience wrapper around `vmem_mha_packed`."""
    b, t, h, d = q.shape
    return vmem_mha_packed(
        q.reshape(b, t, h * d), k.reshape(b, t, h * d),
        v.reshape(b, t, h * d), key_mask, heads=h, sm_scale=sm_scale,
        interpret=interpret)
