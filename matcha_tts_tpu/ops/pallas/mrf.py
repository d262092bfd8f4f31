"""Pallas TPU kernel: fused HiFi-GAN multi-receptive-field (MRF) stack.

One upsample level of the HiFi-GAN generator runs 3 resblock branches
(k in {3, 7, 11}) of 3 residual sub-blocks each — 18 dilated convolutions
plus LeakyReLUs and residual adds (reference: hifigan/models.py:14-97,
181-192).  As separate XLA ops at waveform rate that is ~18 HBM round
trips per level; the deep levels (C <= 64, T up to hop*T_mel samples)
dominate vocoder time.

This kernel computes the ENTIRE level-MRF for a time tile in VMEM:

  out = mean_j  resblock1_{k_j}(x)           (branch sum / 3)

* grid = (B, T/TILE); halo exchange uses three shifted views of x
  (prev/cur/next tile) concatenated in VMEM, with edge tiles zero-filled.
  A halo of H=64 covers the deepest receptive field (k=11, dilations
  1,3,5 -> 60).
* each dilated conv is a sum over taps of statically-shifted (T, C) @
  (C, C) matmuls — MXU work on VMEM-resident data.
* weights are packed (branch, sub, tap<=11, C, C), zero-padded taps are
  skipped statically per-branch.

Numerics: fp32 math with HIGHEST-precision dots — verified bit-close
(maxdiff 3e-7) against the XLA path on v5e hardware.

STATUS (v5e, measured): exact but slower than XLA's conv emitter at these
shapes — v1 (value-based, 512-row tiles) 69 ms; v2 (scratch-ref
accumulation, 2048-row tiles, this file) 57 ms; XLA 21 ms for a 768-frame
vocoder pass.  The gap is structural: 128-lane padding at C in {32, 64}
wastes 2-4x of every tap matmul and the halo adds ~6% recompute.  Next
step (docs/ROADMAP.md): time-in-lanes packing — compute 4 consecutive
output frames per 128-lane row with block-Toeplitz weights.  Kept
flag-gated (HiFiGANConfig.use_pallas, default OFF).
"""

from __future__ import annotations

import functools
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

HALO = 64
_KERNELS = (3, 7, 11)
_DILATIONS = (1, 3, 5)


def pack_mrf_weights(resblocks: Sequence[dict],
                     kernel_sizes: Sequence[int] = _KERNELS) -> Tuple:
    """Pack one level's 3 resblock param dicts into dense arrays
    (jit-traceable: static-amount pads + stacks).

    Returns (w1, b1, w2, b2):
      w1, w2: (3, 3, 11, C, C) — taps zero-padded to 11
      b1, b2: (3, 3, 1, C)
    """
    max_k = max(kernel_sizes)

    def pad_w(w, k):
        return jnp.pad(jnp.asarray(w, jnp.float32),
                       ((0, max_k - k), (0, 0), (0, 0)))

    w1 = jnp.stack([
        jnp.stack([pad_w(rb["convs1"][m]["weight"], k) for m in range(3)])
        for rb, k in zip(resblocks, kernel_sizes)
    ])
    w2 = jnp.stack([
        jnp.stack([pad_w(rb["convs2"][m]["weight"], k) for m in range(3)])
        for rb, k in zip(resblocks, kernel_sizes)
    ])
    b1 = jnp.stack([
        jnp.stack([jnp.asarray(rb["convs1"][m]["bias"], jnp.float32)[None]
                   for m in range(3)])
        for rb in resblocks
    ])
    b2 = jnp.stack([
        jnp.stack([jnp.asarray(rb["convs2"][m]["bias"], jnp.float32)[None]
                   for m in range(3)])
        for rb in resblocks
    ])
    return w1, b1, w2, b2


def _shift(x: jnp.ndarray, off: int) -> jnp.ndarray:
    """Shift rows by `off` with zero fill (off > 0 pulls future rows up)."""
    t, c = x.shape
    if off == 0:
        return x
    z = jnp.zeros((abs(off), c), x.dtype)
    if off > 0:
        return jnp.concatenate([x[off:], z], axis=0)
    return jnp.concatenate([z, x[:off]], axis=0)


def _mrf_kernel(x_prev_ref, x_cur_ref, x_next_ref, w1_ref, b1_ref, w2_ref,
                b2_ref, o_ref, xb_ref, act_ref, xt_ref, acc_ref,
                *, kernel_sizes, dilations, slope: float):
    """Scratch-ref variant: every intermediate is stored to one of four
    VMEM scratch buffers, bounding Mosaic's liveness stack to ~4 tiles
    regardless of how many tap matmuls unroll."""
    i = pl.program_id(1)
    n = pl.num_programs(1)

    prev_tail = x_prev_ref[0, -HALO:, :]
    next_head = x_next_ref[0, :HALO, :]
    # zero the halo at the sequence edges (index maps clamp at the ends)
    prev_tail = jnp.where(i == 0, 0.0, prev_tail)
    next_head = jnp.where(i == n - 1, 0.0, next_head)

    tile = x_cur_ref.shape[1]
    prec = jax.lax.Precision.HIGHEST

    # Row-validity mask: at the sequence edges the halo rows are VIRTUAL
    # (outside [0, T)).  The reference zero-pads every conv input there,
    # so virtual rows must read as zero before each conv — the chain's
    # intermediate values at those rows are otherwise bias-contaminated.
    rows = jax.lax.broadcasted_iota(jnp.int32, (tile + 2 * HALO, 1), 0)
    left_ok = jnp.logical_or(i > 0, rows >= HALO)
    right_ok = jnp.logical_or(i < n - 1, rows < HALO + tile)
    valid = jnp.logical_and(left_ok, right_ok).astype(jnp.float32)

    def conv_same_into_xt(j, m, which_w, which_b, dilation):
        """xt_ref <- conv(act_ref) with 'same' zero padding."""
        k = kernel_sizes[j]
        half = (k * dilation - dilation) // 2
        xt_ref[...] = jnp.broadcast_to(which_b[m, 0],
                                       xt_ref.shape).astype(jnp.float32)
        for tap in range(k):
            off = tap * dilation - half
            xt_ref[...] += jnp.dot(_shift(act_ref[...], off), which_w[m, tap],
                                   precision=prec,
                                   preferred_element_type=jnp.float32)

    acc_ref[...] = jnp.zeros_like(acc_ref)
    for j in range(len(kernel_sizes)):
        xb_ref[...] = jnp.concatenate(
            [prev_tail, x_cur_ref[0], next_head], axis=0
        ).astype(jnp.float32)
        w1j, b1j = w1_ref[j], b1_ref[j]
        w2j, b2j = w2_ref[j], b2_ref[j]
        for m in range(3):
            act_ref[...] = jax.nn.leaky_relu(xb_ref[...], slope) * valid
            conv_same_into_xt(j, m, w1j, b1j, dilations[m])
            act_ref[...] = jax.nn.leaky_relu(xt_ref[...], slope) * valid
            conv_same_into_xt(j, m, w2j, b2j, 1)
            xb_ref[...] += xt_ref[...]
        acc_ref[...] += xb_ref[HALO : HALO + tile]
    o_ref[0] = (acc_ref[...] / len(kernel_sizes)).astype(o_ref.dtype)


def _tile_for(c: int) -> int:
    # Scratch-ref kernel: 4 scratch buffers + pipelined in/out blocks.
    # (TILE+128) x 128 lanes x 4 B per buffer -> 2048 rows keeps the whole
    # working set ~10 MB under the 16 MB scoped-VMEM limit.
    del c
    return 2048


def mrf_pallas_ok(t: int, c: int) -> bool:
    """Gate: wav-rate channel widths, tile-divisible length, 128-lane pad
    acceptable only up to C=64 (larger C -> XLA path is efficient)."""
    return c in (32, 64) and t % _tile_for(c) == 0 and t >= 2 * _tile_for(c)


@functools.partial(jax.jit, static_argnames=("kernel_sizes", "dilations",
                                             "slope", "interpret"))
def mrf_fused(x: jnp.ndarray, w1, b1, w2, b2,
              kernel_sizes: Tuple[int, ...] = _KERNELS,
              dilations: Tuple[int, ...] = _DILATIONS,
              slope: float = 0.1, interpret: bool | None = None) -> jnp.ndarray:
    """Fused 3-branch MRF: x (B, T, C) -> (B, T, C) = mean of resblocks."""
    b, t, c = x.shape
    tile = _tile_for(c)
    n_tiles = t // tile

    kernel = functools.partial(_mrf_kernel, kernel_sizes=kernel_sizes,
                               dilations=dilations, slope=slope)

    def idx_prev(bi, ti):
        return (bi, jnp.maximum(ti - 1, 0), 0)

    def idx_cur(bi, ti):
        return (bi, ti, 0)

    def idx_next(bi, ti):
        return (bi, jnp.minimum(ti + 1, n_tiles - 1), 0)

    def idx_w(bi, ti):
        return (0, 0, 0, 0, 0)

    def idx_b(bi, ti):
        return (0, 0, 0, 0)

    wspec1 = pl.BlockSpec(w1.shape, idx_w, memory_space=pltpu.VMEM)
    wspec2 = pl.BlockSpec(w2.shape, idx_w, memory_space=pltpu.VMEM)
    bspec1 = pl.BlockSpec(b1.shape, idx_b, memory_space=pltpu.VMEM)
    bspec2 = pl.BlockSpec(b2.shape, idx_b, memory_space=pltpu.VMEM)

    return pl.pallas_call(
        kernel,
        grid=(b, n_tiles),
        in_specs=[
            pl.BlockSpec((1, tile, c), idx_prev, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile, c), idx_cur, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile, c), idx_next, memory_space=pltpu.VMEM),
            wspec1, bspec1, wspec2, bspec2,
        ],
        out_specs=pl.BlockSpec((1, tile, c), idx_cur, memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, t, c), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((tile + 2 * HALO, c), jnp.float32),  # xb
            pltpu.VMEM((tile + 2 * HALO, c), jnp.float32),  # act
            pltpu.VMEM((tile + 2 * HALO, c), jnp.float32),  # xt
            pltpu.VMEM((tile, c), jnp.float32),             # acc
        ],
        interpret=(jax.default_backend() == "cpu" if interpret is None
                   else interpret),
    )(x, x, x, w1, b1, w2, b2)
