"""Fused (flash) attention for the U-Net transformer blocks.

The reference decoder attention (/root/reference/model.py:646-705)
materializes the full (B, H, T, T) score tensor; at batch 32 / T=768 /
bf16 that is ~75 MB written + read twice per block around an
HBM-resident softmax — ~1 ms of pure bandwidth per full-resolution
block, x6 blocks x NFE per synthesis.  This wrapper runs JAX's TPU
Pallas flash-attention kernel instead: scores never leave VMEM, softmax
is computed online, and the only HBM traffic is q/k/v in and out.

Key-padding semantics: the XLA path fills masked-key logits with the
dtype minimum (model.py:693-697).  Here padded positions get a distinct
segment id, which the kernel treats as -inf logits — identical softmax
over the valid keys.  Padded-*query* rows differ (flash emits zeros /
junk instead of a uniform average) but every downstream consumer masks
them out (convs take `x * mask`), so valid outputs are unchanged; the
hardware parity test asserts exactly that.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental.pallas.ops.tpu.flash_attention import (
    BlockSizes,
    SegmentIds,
    flash_attention,
)

# The kernel tiles the two sequence axes in >=128 blocks; the frame
# buckets (multiples of 128 at full resolution, 64 at half) gate below.
_MIN_SEQ_BLOCK = 128


def flash_attention_ok(t: int, dim_head: int) -> bool:
    """Shape gate: sequence must tile into 128-blocks; head dim must be a
    lane multiple so q/k/v tiles are dense."""
    return t % _MIN_SEQ_BLOCK == 0 and dim_head % 64 == 0


@functools.partial(jax.jit, static_argnames=("sm_scale",))
def flash_mha(q, k, v, key_mask, *, sm_scale: float):
    """q, k, v: (B, T, H, D); key_mask: (B, T) 1=keep -> (B, T, H*D).

    Matches `jnp.einsum` attention with masked keys filled to dtype-min
    at all valid query positions (see module docstring for the padded-row
    difference).
    """
    b, t, h, d = q.shape
    qt = q.transpose(0, 2, 1, 3)
    kt = k.transpose(0, 2, 1, 3)
    vt = v.transpose(0, 2, 1, 3)
    seg = (key_mask == 0).astype(jnp.int32)  # 0 = valid, 1 = padded
    # largest seq block that divides T (the gate guarantees T % 128 == 0)
    block = 256 if t % 256 == 0 else _MIN_SEQ_BLOCK
    sizes = BlockSizes(
        block_q=block, block_k_major=block, block_k=block, block_b=1,
        block_q_major_dkv=block, block_k_major_dkv=block,
        block_k_dkv=block, block_q_dkv=block,
        block_k_major_dq=block, block_k_dq=block, block_q_dq=block,
    )
    out = flash_attention(qt, kt, vt,
                          segment_ids=SegmentIds(q=seg, kv=seg),
                          sm_scale=sm_scale, block_sizes=sizes)
    return out.transpose(0, 2, 1, 3).reshape(b, t, h * d)
