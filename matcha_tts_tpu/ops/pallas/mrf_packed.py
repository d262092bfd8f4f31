"""Pallas TPU kernel: time-in-lanes packed HiFi-GAN MRF stack.

The deep HiFi-GAN levels run at waveform rate with C in {32, 64} channels
(reference: hifigan/models.py:14-103, 181-192).  Any (T, C) @ (C, C) tap
matmul on the MXU pads C up to the 128-lane width, wasting 4x (C=32) or
2x (C=64) of every pass — the structural gap that made the tap-unrolled
kernel (ops/pallas/mrf.py) lose to XLA's conv emitter.

This kernel removes the padding by *packing time into lanes*: with
R = 128 // C, each VMEM row holds R consecutive frames,

    X[s, r*C + ci] = x[s*R + r, ci]            (a pure reshape, NWC layout)

and a dilated conv  y[t] = sum_tap w_tap @ x[t + off_tap]  becomes a short
sum of block-Toeplitz matmuls over *super-row* shifts:

    Y[s] = sum_q  X[s + q] @ W_q,   W_q[r2*C+ci, r*C+co] = w_tap[ci, co]
           where (q, r2) = divmod(r + off_tap, R)

Every matmul is now a fully-dense (tile, 128) @ (128, 128) MXU pass.  At
C=32 the whole 18-conv level costs 92 packed matmuls on T/4 rows versus
126 padded matmuls on T rows for the tap formulation — 5.5x less MXU
work; at C=64 it is 144 on T/2 vs 126 on T — 1.75x less.

Like mrf.py, the full 3-branch / 3-sub-block residual chain for a time
tile runs in VMEM (one HBM read + one write per level), with a super-row
halo covering the chain's receptive field and scratch-ref accumulation to
bound Mosaic's liveness.  bf16 operands hit the MXU in a single pass with
fp32 accumulation; fp32 inputs use HIGHEST-precision dots for parity.

Reference semantics reproduced: LeakyReLU(0.1) -> dilated conv -> LReLU
-> conv -> residual add, branch mean (hifigan/models.py:74-97, 186-192),
zero 'same' padding at the sequence edges.
"""

from __future__ import annotations

import functools
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128
_KERNELS = (3, 7, 11)
_DILATIONS = ((1, 3, 5),) * 3


def _delta_map(k: int, d: int, r_pack: int):
    """For a k-tap dilation-d conv under R-frame packing: map super-row
    shift q -> list of (tap, r2, r) placements (python ints, static)."""
    half = (k * d - d) // 2
    out: dict = {}
    for tap in range(k):
        off = tap * d - half
        for r in range(r_pack):
            q, r2 = divmod(r + off, r_pack)
            out.setdefault(q, []).append((tap, r2, r))
    return dict(sorted(out.items()))


def packed_meta(kernel_sizes: Tuple[int, ...],
                dilations: Tuple[Tuple[int, ...], ...],
                r_pack: int):
    """Static kernel schedule: per branch, per sub-block, the (q, mat_idx)
    lists for conv1 and conv2, plus total mat count and the super-row halo
    (receptive field of the deepest residual chain, rounded up to 16)."""
    specs = []
    n = 0
    halo = 0
    for k, dils in zip(kernel_sizes, dilations):
        branch = []
        reach = 0
        for d in dils:
            spec = []
            for which_d in (d, 1):  # convs1[m] then convs2[m]
                dm = _delta_map(k, which_d, r_pack)
                qs = tuple((q, n + i) for i, q in enumerate(dm))
                n += len(dm)
                spec.append(qs)
                reach += max(abs(q) for q in dm)
            branch.append((spec[0], spec[1]))
        specs.append(tuple(branch))
        halo = max(halo, reach)
    halo = -(-halo // 16) * 16
    return tuple(specs), n, halo


def pack_packed_weights(resblocks: Sequence[dict],
                        kernel_sizes: Tuple[int, ...] = _KERNELS,
                        dilations: Tuple[Tuple[int, ...], ...] = _DILATIONS,
                        dtype=jnp.float32):
    """Pack one level's 3 resblock param dicts into block-Toeplitz form.

    Returns (w, b): w (N_mats, 128, 128), b (n_convs, 128).  The placement
    tensors are static constants, so under jit this folds to one einsum
    per conv (18 total) — no scatter chains in the graph.
    """
    c = jnp.shape(resblocks[0]["convs1"][0]["weight"])[1]  # tracer-safe
    r_pack = LANES // c
    mats, biases = [], []
    for rb, k, dils in zip(resblocks, kernel_sizes, dilations):
        for m, d in enumerate(dils):
            for which, dd in (("convs1", d), ("convs2", 1)):
                w = jnp.asarray(rb[which][m]["weight"], jnp.float32)
                bias = jnp.asarray(rb[which][m]["bias"], jnp.float32)
                dm = _delta_map(k, dd, r_pack)
                # P[qi, r2, r, tap] = 1 where tap lands at (q, r2) for r
                p = np.zeros((len(dm), r_pack, r_pack, k), np.float32)
                for qi, (q, places) in enumerate(dm.items()):
                    for tap, r2, r in places:
                        p[qi, r2, r, tap] = 1.0
                big = jnp.einsum("qsrt,tio->qsiro", jnp.asarray(p), w)
                mats.append(big.reshape(len(dm), LANES, LANES))
                biases.append(jnp.tile(bias, r_pack))
    # 2D layout (N*128, 128): the kernel row-slices contiguous delta runs
    # for K-stacked dots without an in-kernel reshape.
    return (jnp.concatenate(mats, axis=0).reshape(-1, LANES).astype(dtype),
            jnp.stack(biases).astype(dtype))


def _shift(x: jnp.ndarray, off: int) -> jnp.ndarray:
    """Shift rows by `off` with zero fill (off > 0 pulls future rows up)."""
    t, c = x.shape
    if off == 0:
        return x
    z = jnp.zeros((abs(off), c), x.dtype)
    if off > 0:
        return jnp.concatenate([x[off:], z], axis=0)
    return jnp.concatenate([z, x[:off]], axis=0)


def _mrf_packed_kernel(x_prev_ref, x_cur_ref, x_next_ref, w_ref, b_ref,
                       o_ref, xb_ref, act_ref, xt_ref, acc_ref,
                       *, specs, halo: int, slope: float, fp32: bool,
                       kstack: int):
    i = pl.program_id(1)
    n = pl.num_programs(1)
    tile = x_cur_ref.shape[1]
    ext = tile + 2 * halo
    prec = jax.lax.Precision.HIGHEST if fp32 else None

    prev_tail = x_prev_ref[0, -halo:, :].astype(jnp.float32)
    next_head = x_next_ref[0, :halo, :].astype(jnp.float32)
    # zero the halo at the sequence edges (index maps clamp at the ends)
    prev_tail = jnp.where(i == 0, 0.0, prev_tail)
    next_head = jnp.where(i == n - 1, 0.0, next_head)

    # Super-rows outside [0, T/R) are virtual; the reference zero-pads every
    # conv input there, so they must read as zero before each conv.
    rows = jax.lax.broadcasted_iota(jnp.int32, (ext, 1), 0)
    left_ok = jnp.logical_or(i > 0, rows >= halo)
    right_ok = jnp.logical_or(i < n - 1, rows < halo + tile)
    valid = jnp.logical_and(left_ok, right_ok).astype(jnp.float32)

    def conv_into_xt(spec, bias_idx):
        # SSA accumulation (one store per conv): Mosaic keeps the running
        # sum live instead of read-modify-writing xt_ref per delta.
        # K-stacking: lane-concat up to `kstack` shifted acts and row-slice
        # the matching contiguous weight run -> one deep-K MXU dot per
        # group instead of one K=128 pass per delta.
        acc = jnp.broadcast_to(b_ref[bias_idx].astype(jnp.float32),
                               (ext, LANES))
        for g0 in range(0, len(spec), kstack):
            grp = spec[g0:g0 + kstack]
            if len(grp) == 1:
                lhs = _shift(act_ref[...], grp[0][0])
            else:
                lhs = jnp.concatenate(
                    [_shift(act_ref[...], q) for q, _ in grp], axis=1)
            m0 = grp[0][1]
            rhs = w_ref[m0 * LANES:(m0 + len(grp)) * LANES]
            acc = acc + jnp.dot(lhs, rhs, precision=prec,
                                preferred_element_type=jnp.float32)
        xt_ref[...] = acc

    acc_ref[...] = jnp.zeros_like(acc_ref)
    conv_ord = 0
    for branch in specs:
        xb_ref[...] = jnp.concatenate(
            [prev_tail, x_cur_ref[0].astype(jnp.float32), next_head], axis=0)
        for spec1, spec2 in branch:
            act_ref[...] = (jax.nn.leaky_relu(xb_ref[...], slope)
                            * valid).astype(act_ref.dtype)
            conv_into_xt(spec1, conv_ord)
            act_ref[...] = (jax.nn.leaky_relu(xt_ref[...], slope)
                            * valid).astype(act_ref.dtype)
            conv_into_xt(spec2, conv_ord + 1)
            xb_ref[...] += xt_ref[...]
            conv_ord += 2
        acc_ref[...] += xb_ref[halo:halo + tile]
    o_ref[0] = (acc_ref[...] / len(specs)).astype(o_ref.dtype)


def _tile_for_packed(tp: int, fp32: bool, c: int = 32) -> int:
    """Largest tile (rows of packed super-frames) dividing tp that keeps
    weights + 4 scratch buffers + pipeline blocks under ~13 MB VMEM."""
    cap = (512 if c == 64 else 1024) if fp32 else 2048
    t = cap
    while t >= 128:
        if tp % t == 0:
            return t
        t //= 2
    return 0


def mrf_packed_ok(t: int, c: int, fp32: bool = False) -> bool:
    """Gate: lane-divisible channel widths and a tileable packed length."""
    if c not in (32, 64) or t % (LANES // c) != 0:
        return False
    return _tile_for_packed(t // (LANES // c), fp32, c) > 0


@functools.partial(jax.jit,
                   static_argnames=("kernel_sizes", "dilations", "slope",
                                    "tile", "kstack", "interpret"))
def mrf_packed(x: jnp.ndarray, w: jnp.ndarray, b: jnp.ndarray,
               kernel_sizes: Tuple[int, ...] = _KERNELS,
               dilations: Tuple[Tuple[int, ...], ...] = _DILATIONS,
               slope: float = 0.1, tile: int = 0, kstack: int = 8,
               interpret: bool = False) -> jnp.ndarray:
    """Fused packed 3-branch MRF: x (B, T, C) -> (B, T, C), C in {32, 64}.

    w, b from pack_packed_weights (same dtype as x for bf16; fp32 inputs
    run HIGHEST-precision dots for parity with the XLA conv path).
    """
    bsz, t, c = x.shape
    r_pack = LANES // c
    tp = t // r_pack
    fp32 = x.dtype == jnp.float32
    if tile == 0:
        tile = _tile_for_packed(tp, fp32, c)
    n_tiles = tp // tile
    specs, n_mats, halo = packed_meta(kernel_sizes, dilations, r_pack)
    assert w.shape == (n_mats * LANES, LANES), (w.shape, n_mats)
    assert halo <= tile, (halo, tile)

    xp = x.reshape(bsz, tp, LANES)
    kernel = functools.partial(_mrf_packed_kernel, specs=specs, halo=halo,
                               slope=slope, fp32=fp32, kstack=kstack)

    def idx_prev(bi, ti):
        return (bi, jnp.maximum(ti - 1, 0), 0)

    def idx_cur(bi, ti):
        return (bi, ti, 0)

    def idx_next(bi, ti):
        return (bi, jnp.minimum(ti + 1, n_tiles - 1), 0)

    act_dtype = jnp.float32 if fp32 else jnp.bfloat16
    out = pl.pallas_call(
        kernel,
        grid=(bsz, n_tiles),
        in_specs=[
            pl.BlockSpec((1, tile, LANES), idx_prev, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile, LANES), idx_cur, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile, LANES), idx_next, memory_space=pltpu.VMEM),
            pl.BlockSpec(w.shape, lambda bi, ti: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(b.shape, lambda bi, ti: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, tile, LANES), idx_cur,
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bsz, tp, LANES), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((tile + 2 * halo, LANES), jnp.float32),   # xb
            pltpu.VMEM((tile + 2 * halo, LANES), act_dtype),     # act
            pltpu.VMEM((tile + 2 * halo, LANES), jnp.float32),   # xt
            pltpu.VMEM((tile, LANES), jnp.float32),              # acc
        ],
        interpret=interpret,
    )(xp, xp, xp, w, b)
    return out.reshape(bsz, t, c)
