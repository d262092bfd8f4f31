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

Three variants share the kernel body:
  * mrf_packed, C in {32, 64}: lane-packed MRF level;
  * mrf_packed, C = 128: degenerate r_pack=1 (no packing win, but the
    whole 18-conv chain still runs HBM-round-trip-free);
  * mrf_packed_up: additionally fuses the level's LeakyReLU ->
    ConvTranspose1d(k=4, s=2, C 2c->c) upsample prologue
    (hifigan/models.py:181-185) as block-Toeplitz dots — the packed
    super-row count is invariant across a stride-2 upsample (frames
    double, frames per lane row double), so the same grid serves both
    sides and the wav-rate upsampled tensor never touches HBM.
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


def _rp(c: int) -> int:
    """Frames packed per VMEM row: 128//C for the lane-packed widths,
    1 for C >= 128 (C=256 rows span two lane tiles — the 'wide' case,
    where every tap is already a dense CxC dot and no packing is
    needed)."""
    return max(1, LANES // c)


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
    r_pack = _rp(c)
    width = c * r_pack
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
                mats.append(big.reshape(len(dm), width, width))
                biases.append(jnp.tile(bias, r_pack))
    # 2D layout (N*width, width): the kernel row-slices contiguous delta
    # runs for K-stacked dots without an in-kernel reshape.
    return (jnp.concatenate(mats, axis=0).reshape(-1, width).astype(dtype),
            jnp.stack(biases).astype(dtype))


def pack_packed_weights_int8(resblocks: Sequence[dict],
                             kernel_sizes: Tuple[int, ...] = _KERNELS,
                             dilations: Tuple[Tuple[int, ...], ...] = _DILATIONS):
    """int8 variant of `pack_packed_weights` for the quantized MRF chain.

    Per conv, per OUTPUT channel: s_w[co] = max|w[:, :, co]| / 127 and
    w_q = round(w / s_w) in [-127, 127]; the existing block-Toeplitz
    packer then runs on the integer-valued floats (exact) and the result
    casts to int8.  Output lane l of the packed layout holds (frame
    r = l // C, channel co = l % C), so the per-lane dequant scale row
    is s_w tiled r_pack times — the same repetition the bias rows use.

    Returns (w_i8 (N*128, 128) int8, b (n_convs, 128) f32,
             ws (n_convs, 128) f32 per-output-lane weight scales).
    """
    c = jnp.shape(resblocks[0]["convs1"][0]["weight"])[1]
    r_pack = _rp(c)
    # quantize each conv's weights in place (iteration order matches the
    # packer's conv order exactly: branch -> sub-block -> convs1, convs2)
    q_blocks, scales = [], []
    for rb, dils in zip(resblocks, dilations):
        q_rb = {"convs1": [], "convs2": []}
        for m in range(len(dils)):
            for which in ("convs1", "convs2"):
                w = jnp.asarray(rb[which][m]["weight"], jnp.float32)
                s_w = jnp.max(jnp.abs(w), axis=(0, 1)) / 127.0  # (C_out,)
                s_w = jnp.where(s_w > 0, s_w, 1.0)
                q_rb[which].append({
                    "weight": jnp.clip(jnp.round(w / s_w), -127, 127),
                    "bias": rb[which][m]["bias"],
                })
                scales.append(jnp.tile(s_w, r_pack))
        q_blocks.append(q_rb)
    w, b = pack_packed_weights(q_blocks, kernel_sizes, dilations,
                               dtype=jnp.float32)
    return (w.astype(jnp.int8), b, jnp.stack(scales).astype(jnp.float32))


def upsample_meta(u: int, k: int, padding: int, r_in: int):
    """Super-row shifts q for a stride-u ConvTranspose under packing with
    R_in input frames per row and R_out = u*R_in output frames per row.

    The stored weight layout is already flipped (models/nn.py:137-147): the
    transpose conv runs as a plain conv over the u-dilated input with
    pad' = k - 1 - padding, so output frame t_out reads dilated index
    t_out + tap - pad', i.e. input frame (t_out + tap - pad')/u when
    divisible.  In packed coords (t_out = s*uR_in + r):
        (q, r_in) = divmod((r + tap - pad') // u, R_in).
    """
    padp = k - 1 - padding
    qs = set()
    for r in range(u * r_in):
        for tap in range(k):
            m = r + tap - padp
            if m % u == 0:
                q, _ = divmod(m // u, r_in)
                qs.add(q)
    return tuple(sorted(qs))


def pack_upsample_weights(up_params: dict, u: int = 2,
                          padding: int = 1, dtype=jnp.float32):
    """Pack one ConvTranspose1d level (weight (W, C_in, C_out) in the
    flipped (W, I, O) store layout, models/nn.py:137-147) into super-row
    block-Toeplitz form for the fused upsample+MRF kernel.

    Returns (wup, bup): wup (n_q*128, 128), bup (1, 128) with the conv
    bias tiled over the R_out output frames per lane row."""
    w = jnp.asarray(up_params["weight"], jnp.float32)  # (W, I, O)
    k, c_in, co = w.shape[0], w.shape[1], w.shape[2]
    r_in = LANES // c_in
    r_out = u * r_in
    padp = k - 1 - padding
    qs = upsample_meta(u, k, padding, r_in)
    # P[qi, r_in, tap, r] = 1 where input (q, r_in) feeds output frame r
    p = np.zeros((len(qs), r_in, k, r_out), np.float32)
    for r in range(r_out):
        for tap in range(k):
            m = r + tap - padp
            if m % u == 0:
                q, ri = divmod(m // u, r_in)
                p[qs.index(q), ri, tap, r] = 1.0
    big = jnp.einsum("qstr,tio->qsiro", jnp.asarray(p), w)
    wup = big.reshape(len(qs) * LANES, LANES).astype(dtype)
    bias = (jnp.asarray(up_params["bias"], jnp.float32)
            if "bias" in up_params else jnp.zeros((co,), jnp.float32))
    bup = jnp.tile(bias, r_out).reshape(1, LANES).astype(dtype)
    return wup, bup


def pack_convpost_weights(post_params: dict, c: int = 32,
                          dtype=jnp.float32):
    """Pack conv_post (k=7, C->1, 'same' padding; hifigan/models.py:176,
    194-196) into super-row block-Toeplitz form over the C=32 packed
    layout.  The single output channel lands in lane r*C of each packed
    row (frame r's channel-0 slot); the host reads the wav back with a
    strided slice.

    Returns (wpost, bpost, qs): wpost (n_q*128, 128), bpost (1, 128) with
    the scalar bias in every lane (only the r*C lanes are meaningful)."""
    w = jnp.asarray(post_params["weight"], jnp.float32)  # (k, C, 1)
    k = w.shape[0]
    r_pack = LANES // c
    dm = _delta_map(k, 1, r_pack)
    qs = tuple(dm)
    p = np.zeros((len(qs), r_pack, r_pack, k), np.float32)
    for qi, (q, places) in enumerate(dm.items()):
        for tap, r2, r in places:
            p[qi, r2, r, tap] = 1.0
    # big[q, r2, ci, r, co] with co a single channel -> broadcast into the
    # r*C + 0 column of each output frame slot
    big = jnp.einsum("qsrt,tio->qsiro", jnp.asarray(p), w)  # (..., r, 1)
    full = jnp.zeros((len(qs), r_pack, c, r_pack, c), jnp.float32)
    full = full.at[:, :, :, :, 0].set(big[..., 0])
    wpost = full.reshape(len(qs) * LANES, LANES).astype(dtype)
    bias = jnp.asarray(post_params.get("bias", jnp.zeros((1,))), jnp.float32)
    bpost = jnp.full((1, LANES), bias[0], jnp.float32).astype(dtype)
    return wpost, bpost, qs


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
                       *refs, specs, halo: int, slope: float, fp32: bool,
                       kstack: int, up_qs: tuple = (), hup: int = 0,
                       post_qs: tuple = (), quant: bool = False,
                       stream_sched: tuple = ()):
    up_nq = len(up_qs)
    refs = list(refs)
    wpost_ref = bpost_ref = o2_ref = ws_ref = None
    wbuf_ref = wsem_ref = None
    if stream_sched:
        # weight-streaming mode: w_ref stays in HBM; the per-conv mats DMA
        # into a double-buffered VMEM scratch (last two scratch refs).
        wsem_ref = refs.pop()
        wbuf_ref = refs.pop()
    if quant:
        ws_ref = refs.pop(0)  # (n_convs, 128) per-output-lane weight scales
    if up_nq:
        wup_ref, bup_ref = refs[:2]
        del refs[:2]
    if post_qs:
        wpost_ref, bpost_ref = refs[:2]
        del refs[:2]
    o_ref = refs.pop(0)
    if post_qs:
        o2_ref = refs.pop(0)
    if up_nq:
        xb_ref, act_ref, xt_ref, acc_ref, xup_ref, actin_ref = refs
    else:
        xb_ref, act_ref, xt_ref, acc_ref = refs
        wup_ref = bup_ref = xup_ref = actin_ref = None
    i = pl.program_id(1)
    n = pl.num_programs(1)
    tile = x_cur_ref.shape[1]
    width = x_cur_ref.shape[2]  # 128 lane-packed; 256 for the wide C=256 case
    ext = tile + 2 * halo
    prec = jax.lax.Precision.HIGHEST if fp32 else None

    # Input halo: the MRF chain's receptive field, plus (fused-upsample
    # only) the transpose conv's own super-row reach padded to a full
    # sublane group.
    hin = halo + hup
    prev_tail = x_prev_ref[0, -hin:, :].astype(jnp.float32)
    next_head = x_next_ref[0, :hin, :].astype(jnp.float32)
    # zero the halo at the sequence edges (index maps clamp at the ends)
    prev_tail = jnp.where(i == 0, 0.0, prev_tail)
    next_head = jnp.where(i == n - 1, 0.0, next_head)

    # Super-rows outside [0, T/R) are virtual; the reference zero-pads every
    # conv input there, so they must read as zero before each conv.
    rows = jax.lax.broadcasted_iota(jnp.int32, (ext, 1), 0)
    left_ok = jnp.logical_or(i > 0, rows >= halo)
    right_ok = jnp.logical_or(i < n - 1, rows < halo + tile)
    valid = jnp.logical_and(left_ok, right_ok).astype(jnp.float32)

    n_convs = len(stream_sched)

    def w_dma(ci, slot):
        m0, nm = stream_sched[ci]
        return pltpu.make_async_copy(
            w_ref.at[m0 * width:(m0 + nm) * width],
            wbuf_ref.at[slot, 0:nm * width],
            wsem_ref.at[slot])

    if stream_sched:
        # warm the double buffer: convs 0 and 1 in flight before compute
        w_dma(0, 0).start()
        if n_convs > 1:
            w_dma(1, 1).start()

    def quantize_act(src):
        """fp32 (ext, LANES) -> (int8 stored in act_ref, fp32 scalar scale).

        One dynamic absmax scale per (conv, tile): per-row/per-lane scales
        cannot factor out of the block-Toeplitz super-row sum (each output
        row mixes several shifted input rows), so a scalar is the finest
        granularity that dequantizes exactly with one multiply."""
        m = jnp.max(jnp.abs(src))
        inv = jnp.where(m > 0, 127.0 / m, 0.0)
        act_ref[...] = jnp.clip(jnp.round(src * inv), -127.0, 127.0
                                ).astype(jnp.int8)
        return jnp.where(m > 0, m / 127.0, 1.0)

    def conv_into_xt(spec, bias_idx, s_act=None):
        # SSA accumulation (one store per conv): Mosaic keeps the running
        # sum live instead of read-modify-writing xt_ref per delta.
        # K-stacking: lane-concat up to `kstack` shifted acts and row-slice
        # the matching contiguous weight run -> one deep-K MXU dot per
        # group instead of one K=128 pass per delta.
        # quant mode: int8 x int8 -> int32 MXU dots (no overflow: <= 1408
        # products of <= 127^2 per output), dequantized once at the end by
        # s_act * per-lane weight scale.
        if quant:
            acc = jnp.zeros((ext, width), jnp.int32)
            acc_ty = jnp.int32
        else:
            acc = jnp.broadcast_to(b_ref[bias_idx].astype(jnp.float32),
                                   (ext, width))
            acc_ty = jnp.float32
        if stream_sched:
            # bias_idx IS the conv execution index (biases are stacked in
            # the same order the chain runs)
            slot, base = bias_idx % 2, stream_sched[bias_idx][0]
            w_dma(bias_idx, slot).wait()
        for g0 in range(0, len(spec), kstack):
            grp = spec[g0:g0 + kstack]
            if len(grp) == 1:
                lhs = _shift(act_ref[...], grp[0][0])
            else:
                lhs = jnp.concatenate(
                    [_shift(act_ref[...], q) for q, _ in grp], axis=1)
            m0 = grp[0][1]
            if stream_sched:
                rhs = wbuf_ref[slot,
                               (m0 - base) * width:
                               (m0 - base + len(grp)) * width]
            else:
                rhs = w_ref[m0 * width:(m0 + len(grp)) * width]
            acc = acc + jnp.dot(lhs, rhs,
                                precision=None if quant else prec,
                                preferred_element_type=acc_ty)
        if quant:
            xt_ref[...] = (acc.astype(jnp.float32)
                           * (ws_ref[bias_idx].astype(jnp.float32) * s_act)
                           + b_ref[bias_idx].astype(jnp.float32))
        else:
            xt_ref[...] = acc
        if stream_sched and bias_idx + 2 < n_convs:
            # refill this slot for the conv after next; its latency hides
            # behind the next conv's dots
            w_dma(bias_idx + 2, slot).start()

    if up_nq:
        # Fused-upsample prologue: the refs hold the C_in-packed PRE-lrelu
        # input of the level; build LeakyReLU -> ConvTranspose into xup as
        # one lane-stacked block-Toeplitz dot, then the MRF chain below
        # uses xup as its residual base (reference hifigan/models.py:186:
        # x = ups[i](lrelu(x)) feeds the resblocks).
        ein = ext + 2 * hup
        xin = jnp.concatenate(
            [prev_tail, x_cur_ref[0].astype(jnp.float32), next_head], axis=0)
        rows_in = jax.lax.broadcasted_iota(jnp.int32, (ein, 1), 0)
        lin = jnp.logical_or(i > 0, rows_in >= hin)
        rin = jnp.logical_or(i < n - 1, rows_in < hin + tile)
        vin = jnp.logical_and(lin, rin).astype(jnp.float32)
        actin_ref[...] = (jax.nn.leaky_relu(xin, slope)
                          * vin).astype(actin_ref.dtype)
        # one dot per super-row shift (Mosaic cannot lane-concat slices
        # whose sublane offsets differ, so no K-stacking here; it is only
        # 3 dots per level)
        actin = actin_ref[...]
        upacc = jnp.broadcast_to(bup_ref[...].astype(jnp.float32),
                                 (ext, LANES))
        for qi, q in enumerate(up_qs):
            upacc = upacc + jnp.dot(
                actin[hup + q:hup + q + ext],
                wup_ref[qi * LANES:(qi + 1) * LANES],
                precision=prec, preferred_element_type=jnp.float32)
        xup_ref[...] = upacc

    acc_ref[...] = jnp.zeros_like(acc_ref)
    pad = 16 if post_qs else 0  # conv_post halo (1 super-row, padded)
    conv_ord = 0
    for branch in specs:
        if up_nq:
            xb_ref[...] = xup_ref[...]
        else:
            xb_ref[...] = jnp.concatenate(
                [prev_tail, x_cur_ref[0].astype(jnp.float32), next_head],
                axis=0)
        for spec1, spec2 in branch:
            a1 = jax.nn.leaky_relu(xb_ref[...], slope) * valid
            if quant:
                conv_into_xt(spec1, conv_ord, quantize_act(a1))
            else:
                act_ref[...] = a1.astype(act_ref.dtype)
                conv_into_xt(spec1, conv_ord)
            a2 = jax.nn.leaky_relu(xt_ref[...], slope) * valid
            if quant:
                conv_into_xt(spec2, conv_ord + 1, quantize_act(a2))
            else:
                act_ref[...] = a2.astype(act_ref.dtype)
                conv_into_xt(spec2, conv_ord + 1)
            xb_ref[...] += xt_ref[...]
            conv_ord += 2
        acc_ref[...] += xb_ref[halo - pad:halo + tile + pad]
    o_ref[0] = (acc_ref[pad:pad + tile] / len(specs)).astype(o_ref.dtype)

    if post_qs:
        # conv_post epilogue (hifigan/models.py:193-196): LeakyReLU(0.01)
        # -> k=7 conv to 1 channel -> tanh, emitted in the packed layout
        # (wav sample for frame r lives in lane r*C; host strided-slices).
        apost = jax.nn.leaky_relu(acc_ref[...] / len(specs), 0.01)
        rows_p = jax.lax.broadcasted_iota(jnp.int32, (tile + 2 * pad, 1), 0)
        lp = jnp.logical_or(i > 0, rows_p >= pad)
        rp = jnp.logical_or(i < n - 1, rows_p < pad + tile)
        apost = (apost * jnp.logical_and(lp, rp).astype(jnp.float32)
                 ).astype(wpost_ref.dtype)  # act_ref is int8 in quant mode
        pacc = jnp.broadcast_to(bpost_ref[...].astype(jnp.float32),
                                (tile, LANES))
        for qi, q in enumerate(post_qs):
            pacc = pacc + jnp.dot(
                apost[pad + q:pad + q + tile],
                wpost_ref[qi * LANES:(qi + 1) * LANES],
                precision=prec, preferred_element_type=jnp.float32)
        o2_ref[0] = jnp.tanh(pacc).astype(o2_ref.dtype)


def _tile_for_packed(tp: int, fp32: bool, c: int = 32) -> int:
    """Largest tile (rows of packed super-frames) dividing tp that keeps
    weights + 4 scratch buffers + pipeline blocks under ~13 MB VMEM."""
    # fp32 doubles both the resident packed weights (up to 9.4 MB at C=64,
    # 8.1 MB at C=128) and the K-stack concat temporary, so its tiles must
    # shrink to stay inside the 16 MB scoped-VMEM budget.  The wide C=256
    # case is int8-only and STREAMS its 8.25 MB of weights from HBM
    # (double-buffered per-conv DMA), so only the double-width scratch
    # rows bound the tile: cap 1024 keeps xb/xt/acc + the kstack concat
    # temporary + the 1.4 MB weight double-buffer near ~13 MB.
    if c == 256:
        cap = 1024
    else:
        cap = (256 if c == 128 else 512 if c == 64 else 1024) if fp32 else 2048
    t = cap
    while t >= 128:
        if tp % t == 0:
            return t
        t //= 2
    return 0


def mrf_packed_ok(t: int, c: int, fp32: bool = False,
                  quant: bool = False) -> bool:
    """Gate: lane-divisible channel widths and a tileable packed length.

    C=128 is the degenerate r_pack=1 case (no lane packing, pure fusion of
    the 18-conv level into one VMEM-resident chain); C=256 is the wide
    double-lane-tile case, available in the int8 (`quant`) mode only."""
    if c not in (32, 64, 128, 256) or t % _rp(c) != 0:
        return False
    if c == 256 and not quant:
        # wide-case weights only fit VMEM at int8 (8.25 MB); the bf16/fp32
        # C=256 level stays on XLA, which already runs it near peak
        # (docs/RESULTS.md parked-kernel note).
        return False
    return _tile_for_packed(t // _rp(c), fp32, c) > 0


@functools.partial(jax.jit,
                   static_argnames=("kernel_sizes", "dilations", "slope",
                                    "tile", "kstack", "interpret"))
def mrf_packed(x: jnp.ndarray, w: jnp.ndarray, b: jnp.ndarray,
               ws: jnp.ndarray | None = None,
               kernel_sizes: Tuple[int, ...] = _KERNELS,
               dilations: Tuple[Tuple[int, ...], ...] = _DILATIONS,
               slope: float = 0.1, tile: int = 0, kstack: int = 16,
               interpret: bool | None = None) -> jnp.ndarray:
    """Fused packed 3-branch MRF: x (B, T, C) -> (B, T, C), C in {32, 64, 128}.

    w, b from pack_packed_weights (same dtype as x for bf16; fp32 inputs
    run HIGHEST-precision dots for parity with the XLA conv path).

    With `ws` (from pack_packed_weights_int8: int8 w, fp32 b, fp32
    per-lane scales) the 18-conv chain runs int8 MXU dots with a dynamic
    per-(conv, tile) activation scale — the opt-in quantized mode
    (hifigan mrf_kernel="int8"; 1.5x MXU headroom, benchmarks/int8_probe).
    Residuals and the chain state stay fp32; only conv inputs quantize.
    """
    bsz, t, c = x.shape
    r_pack = _rp(c)
    width = c * r_pack
    tp = t // r_pack
    quant = ws is not None
    fp32 = x.dtype == jnp.float32 and not quant
    if quant:
        assert w.dtype == jnp.int8, w.dtype
    assert c <= 128 or quant, "wide C=256 kernel is int8-only (VMEM)"
    if fp32:
        # the fp32 path exists for parity/precision (denoiser bias spec,
        # tests), not speed; kstack=16 concat temporaries at fp32 blow the
        # scoped-VMEM budget next to the 2x-size packed weights.
        kstack = min(kstack, 8)
    if tile == 0:
        tile = _tile_for_packed(tp, fp32, c)
    n_tiles = tp // tile
    specs, n_mats, halo = packed_meta(kernel_sizes, dilations, r_pack)
    assert w.shape == (n_mats * width, width), (w.shape, n_mats)
    assert halo <= tile, (halo, tile)

    xp = x.reshape(bsz, tp, width)

    # Wide C=256 case: the packed weights (8.25 MB int8) cannot sit in
    # VMEM next to useful tiles, so they stay in HBM and stream per conv
    # through a double-buffered scratch; each conv's mats are contiguous
    # rows of w (packer order), so the DMA schedule is static.
    stream = quant and c == 256
    stream_sched = ()
    max_nm = 0
    if stream:
        conv_specs = [s for branch in specs for pair in branch for s in pair]
        stream_sched = tuple((s[0][1], len(s)) for s in conv_specs)
        max_nm = max(nm for _, nm in stream_sched)

    kernel = functools.partial(_mrf_packed_kernel, specs=specs, halo=halo,
                               slope=slope, fp32=fp32, kstack=kstack,
                               quant=quant, stream_sched=stream_sched)

    def idx_prev(bi, ti):
        return (bi, jnp.maximum(ti - 1, 0), 0)

    def idx_cur(bi, ti):
        return (bi, ti, 0)

    def idx_next(bi, ti):
        return (bi, jnp.minimum(ti + 1, n_tiles - 1), 0)

    act_dtype = (jnp.int8 if quant
                 else jnp.float32 if fp32 else jnp.bfloat16)
    full = functools.partial(pl.BlockSpec, memory_space=pltpu.VMEM)
    in_specs = [
        pl.BlockSpec((1, tile, width), idx_prev, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, tile, width), idx_cur, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, tile, width), idx_next, memory_space=pltpu.VMEM),
        (pl.BlockSpec(memory_space=pltpu.ANY) if stream
         else full(w.shape, lambda bi, ti: (0, 0))),
        full(b.shape, lambda bi, ti: (0, 0)),
    ]
    operands = [xp, xp, xp, w, b]
    if quant:
        in_specs.append(full(ws.shape, lambda bi, ti: (0, 0)))
        operands.append(ws)
    scratch_shapes = [
        pltpu.VMEM((tile + 2 * halo, width), jnp.float32),   # xb
        pltpu.VMEM((tile + 2 * halo, width), act_dtype),     # act
        pltpu.VMEM((tile + 2 * halo, width), jnp.float32),   # xt
        pltpu.VMEM((tile, width), jnp.float32),              # acc
    ]
    if stream:
        scratch_shapes += [
            pltpu.VMEM((2, max_nm * width, width), w.dtype),  # wbuf
            pltpu.SemaphoreType.DMA((2,)),                    # wsem
        ]
    out = pl.pallas_call(
        kernel,
        grid=(bsz, n_tiles),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, tile, width), idx_cur,
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bsz, tp, width), x.dtype),
        scratch_shapes=scratch_shapes,
        # None = auto: interpret on the CPU backend.  Explicit False forces
        # Mosaic lowering (used by the TPU cross-lowering regression tests).
        interpret=(jax.default_backend() == "cpu" if interpret is None
                   else interpret),
    )(*operands)
    return out.reshape(bsz, t, c)


def mrf_packed_up_ok(t_out: int, c_out: int, fp32: bool = False,
                     stride: int = 2, up_k: int = 4) -> bool:
    """Gate for the fused LeakyReLU->ConvTranspose->MRF level: stride-2
    channel-halving upsamples only (HiFi-GAN V1's two deepest levels,
    hifigan/config.py:9-10: rates (8,8,2,2), kernels (16,16,4,4))."""
    if stride != 2 or up_k != 4 or c_out not in (32, 64):
        return False
    if t_out % (LANES // c_out) != 0:
        return False
    return _tile_for_packed(t_out // (LANES // c_out), fp32, c_out) > 0


@functools.partial(jax.jit,
                   static_argnames=("kernel_sizes", "dilations", "slope",
                                    "stride", "up_k", "up_padding", "tile",
                                    "kstack", "post_k", "interpret"))
def mrf_packed_up(x: jnp.ndarray, wup: jnp.ndarray, bup: jnp.ndarray,
                  w: jnp.ndarray, b: jnp.ndarray,
                  kernel_sizes: Tuple[int, ...] = _KERNELS,
                  dilations: Tuple[Tuple[int, ...], ...] = _DILATIONS,
                  slope: float = 0.1, stride: int = 2, up_k: int = 4,
                  up_padding: int = 1, tile: int = 0, kstack: int = 16,
                  wpost: jnp.ndarray = None, bpost: jnp.ndarray = None,
                  post_k: int = 7, ws: jnp.ndarray | None = None,
                  interpret: bool | None = None):
    """Fused generator level: x (B, T_in, C_in) -> (B, T_in*stride, C_in//2).

    Computes LeakyReLU(x) -> ConvTranspose1d(stride, up_k, up_padding) ->
    3-branch MRF mean in ONE kernel (reference hifigan/models.py:181-192),
    saving the wav-rate HBM round trip of the upsampled tensor.  The packed
    super-row count is invariant across the upsample (frames double, frames
    per lane row double), so input and output share the same grid/tiles.

    wup, bup from pack_upsample_weights; w, b from pack_packed_weights
    built for C_out = C_in // stride.

    With wpost/bpost (from pack_convpost_weights) the kernel additionally
    emits the generator tail LeakyReLU(0.01) -> conv_post(k=post_k, C->1)
    -> tanh (hifigan/models.py:193-196) as a second output in the packed
    layout: wav sample for frame r of a row sits in lane r*C_out.  Returns
    (level_out, wav_packed) in that case.
    """
    bsz, t_in, c_in = x.shape
    assert stride == 2 and c_in in (64, 128), (stride, c_in)
    c_out = c_in // stride
    r_in = LANES // c_in
    r_out = stride * r_in
    tp = t_in // r_in
    quant = ws is not None
    fp32 = x.dtype == jnp.float32 and not quant
    if quant:
        # int8 applies to the MRF chain only; the upsample prologue and
        # conv_post tail (3 dots each) keep the input dtype.
        assert w.dtype == jnp.int8, w.dtype
    if fp32:
        kstack = min(kstack, 8)  # see mrf_packed
    if tile == 0:
        tile = _tile_for_packed(tp, fp32, c_out)
        if fp32:
            # the fused variant adds the upsample scratches and keeps more
            # concat temporaries live; measured 22.2 MB scoped VMEM at
            # C_out=64 tile=512 fp32 — quarter the tile to fit.
            tile = max(128, tile // 4)
        else:
            # bf16 also carries the upsample scratches (+ the conv_post
            # second output on the last level): measured 17.64 MB scoped
            # VMEM at tile=2048 (Mosaic AOT OOM, batch-8 T=384 vocode,
            # 2026-08-20) — cap at 1024 (~12 MB; halo recompute grows
            # ~3%, unmeasurable at level granularity).
            tile = min(tile, 1024)
    n_tiles = tp // tile
    specs, n_mats, halo = packed_meta(kernel_sizes, dilations, r_out)
    up_qs = upsample_meta(stride, up_k, up_padding, r_in)
    hup = 16  # max |q| is 1 for stride-2 k=4; padded to one sublane group
    post_qs = ()
    pad = 0
    if wpost is not None:
        post_qs = tuple(_delta_map(post_k, 1, r_out))
        pad = 16
        halo += pad  # widen the chain's valid center by the conv_post halo
        assert max(abs(q) for q in post_qs) <= pad
        assert wpost.shape == (len(post_qs) * LANES, LANES), wpost.shape
    assert max(abs(q) for q in up_qs) <= hup
    assert w.shape == (n_mats * LANES, LANES), (w.shape, n_mats)
    assert wup.shape == (len(up_qs) * LANES, LANES), (wup.shape, up_qs)
    assert halo + hup <= tile, (halo, hup, tile)

    xp = x.reshape(bsz, tp, LANES)
    kernel = functools.partial(_mrf_packed_kernel, specs=specs, halo=halo,
                               slope=slope, fp32=fp32, kstack=kstack,
                               up_qs=up_qs, hup=hup, post_qs=post_qs,
                               quant=quant)

    def idx_prev(bi, ti):
        return (bi, jnp.maximum(ti - 1, 0), 0)

    def idx_cur(bi, ti):
        return (bi, ti, 0)

    def idx_next(bi, ti):
        return (bi, jnp.minimum(ti + 1, n_tiles - 1), 0)

    chain_act_dtype = (jnp.int8 if quant
                       else jnp.float32 if fp32 else jnp.bfloat16)
    up_act_dtype = jnp.float32 if fp32 else jnp.bfloat16
    ext = tile + 2 * halo
    full = functools.partial(pl.BlockSpec, memory_space=pltpu.VMEM)
    in_specs = [
        pl.BlockSpec((1, tile, LANES), idx_prev, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, tile, LANES), idx_cur, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, tile, LANES), idx_next, memory_space=pltpu.VMEM),
        full(w.shape, lambda bi, ti: (0, 0)),
        full(b.shape, lambda bi, ti: (0, 0)),
    ]
    operands = [xp, xp, xp, w, b]
    if quant:
        in_specs.append(full(ws.shape, lambda bi, ti: (0, 0)))
        operands.append(ws)
    in_specs += [full(wup.shape, lambda bi, ti: (0, 0)),
                 full(bup.shape, lambda bi, ti: (0, 0))]
    operands += [wup, bup]
    out_spec = pl.BlockSpec((1, tile, LANES), idx_cur,
                            memory_space=pltpu.VMEM)
    out_shape = jax.ShapeDtypeStruct((bsz, tp, LANES), x.dtype)
    if post_qs:
        in_specs += [full(wpost.shape, lambda bi, ti: (0, 0)),
                     full(bpost.shape, lambda bi, ti: (0, 0))]
        operands += [wpost, bpost]
        out_spec = (out_spec, pl.BlockSpec((1, tile, LANES), idx_cur,
                                           memory_space=pltpu.VMEM))
        out_shape = (out_shape, jax.ShapeDtypeStruct((bsz, tp, LANES),
                                                     x.dtype))
    out = pl.pallas_call(
        kernel,
        grid=(bsz, n_tiles),
        in_specs=in_specs,
        out_specs=out_spec,
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.VMEM((ext, LANES), jnp.float32),               # xb
            pltpu.VMEM((ext, LANES), chain_act_dtype),           # act
            pltpu.VMEM((ext, LANES), jnp.float32),               # xt
            pltpu.VMEM((tile + 2 * pad, LANES), jnp.float32),    # acc
            pltpu.VMEM((ext, LANES), jnp.float32),               # xup
            pltpu.VMEM((ext + 2 * hup, LANES), up_act_dtype),    # actin
        ],
        interpret=(jax.default_backend() == "cpu" if interpret is None
                   else interpret),
    )(*operands)
    if post_qs:
        lvl, wavp = out
        return (lvl.reshape(bsz, t_in * stride, c_out), wavp)
    return out.reshape(bsz, t_in * stride, c_out)
