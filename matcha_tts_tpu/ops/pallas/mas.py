"""Pallas TPU kernel: Monotonic Alignment Search, batch-in-sublanes.

The portable MAS (ops/mas.py) runs the column recurrence as a 768-step
`lax.scan` whose per-step work is a (B, T_x) vector op — the while-loop
step overhead dominates and the whole DP costs ~5 ms at (32, 256, 768)
on v5e (benchmarks/mas_bench.py).  This kernel runs the same recurrence
VMEM-resident with the batch laid across sublanes and T_x across lanes:

* the value table is streamed column-chunk by column-chunk through the
  Pallas pipeline in (chunk, B, T_x) blocks;
* the true Glow-TTS recurrence (see ops/mas.py's module docstring — the
  reference's own rewrite is degenerate and is deliberately NOT
  reproduced) reads only column y-1:

      dp[x, y] = v[x, y] + max(dp[x, y-1] | x < y,  dp[x-1, y-1])

  so each column is ONE lane shift + max — fully elementwise, no
  intra-column scan;
* the carry column persists in VMEM scratch across grid steps (the TPU
  grid is sequential);
* the forward kernel also emits the backtrack decision bits
  down[x, y] = (x == y) | (dp[x-1, y-1] > dp[x, y-1])  (it holds column
  y-1 in registers when processing column y), so the reverse kernel is a
  pure vectorized index walk — no dp re-read, no shifted block specs.

Asserted against the scalar NumPy oracle in tests/test_mas.py and by an
optimality regression (the returned path must beat the degenerate
first-token path the broken recurrence produced).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG = -1e30  # python float: jnp scalars would be captured as constants
_CHUNK = 64  # max columns streamed per grid step (see _pick_chunk)

# The forward pallas_call keeps 6 chunk-blocks resident in scoped VMEM —
# the value input plus the two outputs (dp column + backtrack bits), each
# double-buffered by the Mosaic pipeline — plus the (B, T_x) carry-column
# scratch.  Keep their sum under the 16 MB scoped-VMEM limit with margin
# (measured: batch 64 x T_x 256 with chunk 64 allocates 24.06 MB and
# fails AOT compilation; chunk 32 fits).
_VMEM_BUDGET = 14 * 1024 * 1024
_PIPELINE_BLOCKS = 6
_MIN_CHUNK = 8  # floor shared by _pick_chunk and the mas_pallas_ok gate


def _col_bytes(b: int, t_x: int) -> int:
    """Bytes of one padded (B, T_x) float32 column."""
    bp = -(-b // 8) * 8
    xp = -(-t_x // 128) * 128
    return bp * xp * 4


def _pick_chunk(b: int, t_x: int) -> int:
    """Largest power-of-two chunk (<= _CHUNK) whose pipeline fits VMEM."""
    col = _col_bytes(b, t_x)
    chunk = _CHUNK
    while (chunk > _MIN_CHUNK
           and _PIPELINE_BLOCKS * chunk * col + col > _VMEM_BUDGET):
        chunk //= 2
    return chunk


def _shift_right(arr, s, fill):
    """Lane-axis right shift by s with fill; arr (B, T_x)."""
    b = arr.shape[0]
    pad = jnp.full((b, s), fill, arr.dtype)
    return jnp.concatenate([pad, arr[:, :-s]], axis=1)


def _fwd_kernel(value_ref, t_x_ref, t_y_ref, col_out_ref, down_ref, p_ref,
                *, chunk: int, t_x_size: int):
    """Grid step: process `chunk` columns; carry column in p_ref scratch."""
    step = pl.program_id(0)
    b = value_ref.shape[1]
    # Mosaic's tpu.iota only produces integers — build int32 and cast
    # (a float32 broadcasted_iota fails lowering verification on TPU).
    xs = jax.lax.broadcasted_iota(jnp.int32, (b, t_x_size), 1).astype(
        jnp.float32)
    t_x = t_x_ref[...]  # (B, 1) float32
    t_y = t_y_ref[...]

    @pl.when(step == 0)
    def _init():
        p_ref[...] = jnp.full_like(p_ref, _NEG)

    def column(j, _):
        y = (step * chunk + j).astype(jnp.float32)
        v = value_ref[j]  # (B, T_x)
        p_prev = p_ref[...]
        shifted = _shift_right(p_prev, 1, _NEG)  # dp[x-1, y-1]

        # backtrack decision for THIS y compares column y-1 (= p_prev);
        # x == y forces the step down (token index cannot exceed frame
        # index on a valid path)
        down = ((xs == y) | (shifted > p_prev)).astype(jnp.float32)
        down_ref[j] = down

        band_lo = jnp.maximum(0.0, t_x + y - t_y)  # (B, 1)
        band_hi = jnp.minimum(t_x, y + 1.0)
        in_band = (xs >= band_lo) & (xs < band_hi)

        # stay on token x (invalid at x == y: x was out of band at y-1;
        # out-of-band carry cells already hold _NEG)
        stay = jnp.where(xs < y, p_prev, _NEG)
        # step down from x-1; x == 0 starts the path at y == 0
        down_v = jnp.where((xs == 0) & (y == 0), 0.0,
                           jnp.where(xs == 0, _NEG, shifted))
        col = v + jnp.maximum(stay, down_v)
        col = jnp.where(in_band, col, _NEG)
        col_out_ref[j] = col
        p_ref[...] = col
        return 0

    jax.lax.fori_loop(0, chunk, column, 0)


def _bwd_kernel(down_ref, t_x_ref, t_y_ref, path_ref, idx_ref,
                *, chunk: int, t_x_size: int, n_chunks: int):
    """Reversed grid: emit the one-hot path walking the decision bits."""
    step = pl.program_id(0)
    b = down_ref.shape[1]
    xs = jax.lax.broadcasted_iota(jnp.int32, (b, t_x_size), 1).astype(
        jnp.float32)
    t_y = t_y_ref[...]

    @pl.when(step == 0)
    def _init():
        idx_ref[...] = t_x_ref[...] - 1.0

    def column(jj, _):
        j = chunk - 1 - jj
        y = ((n_chunks - 1 - step) * chunk + j).astype(jnp.float32)
        index = idx_ref[...]  # (B, 1) float32
        active = (y < t_y).astype(jnp.float32)  # (B, 1)
        onehot = (xs == index).astype(jnp.float32)
        path_ref[j] = active * onehot
        down_at = jnp.sum(down_ref[j] * onehot, axis=1, keepdims=True)
        dec = (active > 0) & (index > 0) & (down_at > 0.5)
        idx_ref[...] = jnp.where(dec, index - 1.0, index)
        return 0

    jax.lax.fori_loop(0, chunk, column, 0)


def mas_pallas_ok(b: int, t_x: int, t_y: int) -> bool:
    """Shape gate: even the smallest chunk's pipeline buffers must fit the
    scoped-VMEM budget (see _pick_chunk), and the band must be valid."""
    col = _col_bytes(b, t_x)
    return (_PIPELINE_BLOCKS * _MIN_CHUNK * col + col <= _VMEM_BUDGET
            and t_y >= t_x)


@functools.partial(jax.jit, static_argnames=("interpret",))
def maximum_path_pallas(neg_cent: jnp.ndarray, mask: jnp.ndarray,
                        interpret: bool | None = None) -> jnp.ndarray:
    """Drop-in for ops.mas.maximum_path on TPU.

    neg_cent: (B, T_x, T_y) log-prior; mask: attention-domain mask.
    Returns the one-hot monotonic path, same dtype as neg_cent.
    """
    dtype = neg_cent.dtype
    b, t_x, t_y = neg_cent.shape
    m = mask.astype(jnp.float32)
    t_xs = jnp.sum(m[:, :, 0], axis=1)  # (B,) float
    t_ys = jnp.sum(m[:, 0, :], axis=1)

    bp = -(-b // 8) * 8
    xp = -(-t_x // 128) * 128
    chunk = _pick_chunk(b, t_x)
    yp = -(-t_y // chunk) * chunk
    value = neg_cent.astype(jnp.float32)
    value = jnp.pad(value, ((0, bp - b), (0, xp - t_x), (0, yp - t_y)))
    # padded items: t_x=1, t_y=1 keeps their band trivially consistent
    t_xs = jnp.pad(t_xs, (0, bp - b), constant_values=1.0)[:, None]
    t_ys = jnp.pad(t_ys, (0, bp - b), constant_values=1.0)[:, None]

    # None = auto: interpret on the CPU backend.  Explicit False forces
    # Mosaic lowering (used by the TPU cross-lowering regression tests).
    if interpret is None:
        interpret = jax.default_backend() == "cpu"

    vt = value.transpose(2, 0, 1)  # (T_y, B, T_x): columns stream in chunks
    n_chunks = yp // chunk

    grid = (n_chunks,)
    col_spec = pl.BlockSpec((chunk, bp, xp), lambda i: (i, 0, 0))
    len_spec = pl.BlockSpec((bp, 1), lambda i: (0, 0))

    _, down = pl.pallas_call(
        functools.partial(_fwd_kernel, chunk=chunk, t_x_size=xp),
        grid=grid,
        in_specs=[col_spec, len_spec, len_spec],
        out_specs=[col_spec, col_spec],
        out_shape=[jax.ShapeDtypeStruct((yp, bp, xp), jnp.float32),
                   jax.ShapeDtypeStruct((yp, bp, xp), jnp.float32)],
        scratch_shapes=[pltpu.VMEM((bp, xp), jnp.float32)],
        interpret=interpret,
    )(vt, t_xs, t_ys)

    rev_spec = pl.BlockSpec((chunk, bp, xp), lambda i: (n_chunks - 1 - i, 0, 0))
    path = pl.pallas_call(
        functools.partial(_bwd_kernel, chunk=chunk, t_x_size=xp,
                          n_chunks=n_chunks),
        grid=grid,
        in_specs=[rev_spec, len_spec, len_spec],
        out_specs=rev_spec,
        out_shape=jax.ShapeDtypeStruct((yp, bp, xp), jnp.float32),
        scratch_shapes=[pltpu.VMEM((bp, 1), jnp.float32)],
        interpret=interpret,
    )(down, t_xs, t_ys)

    out = path.transpose(1, 2, 0)[:b, :t_x, :t_y]
    return out.astype(dtype)
