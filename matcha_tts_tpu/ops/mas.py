"""Monotonic Alignment Search (MAS) — on-device, batch-parallel.

The reference computes MAS on the host: it copies the log-prior to CPU,
runs a Numba-JIT scalar DP + backtrack per batch item, and copies the
one-hot path back (reference: /root/reference/train_standalone.py:239-325).
That device->host->device round trip serializes training.

DELIBERATE DEVIATION — the reference's own MAS rewrite is broken.  Its
recurrence reads `max(path[x-1, y], path[x, y-1])`
(train_standalone.py:263-266): `path[x-1, y]` is the CURRENT column,
just written by the same x-loop, and the correctly-computed `v_cur`
from column y-1 is assigned and never used (dead code at :252-256).
That "max over the prefix of the current column" DP makes the first
token's score dominate every later cell, so the returned path
degenerates to "token 1 absorbs nearly all frames" — measured here on
an ideal-conditioning probe where the true path scores -30.6k against
the degenerate path's -45.5k, yet the reference recurrence returns the
degenerate one.  A model trained against it never learns alignment
(the reference's shipped 0.91%-WER checkpoint was necessarily trained
with the correct upstream Glow-TTS MAS, not with this file's rewrite).
This module therefore implements the TRUE Glow-TTS/Matcha recurrence
the reference's code descends from:

    dp[x, y] = value[x, y] + max(dp[x, y-1]   if x <  y else -inf,
                                 dp[x-1, y-1] if x >  0 else
                                 (0 if y == 0 else -inf))

Both reads come from column y-1, so each column is a purely elementwise
shift+max — no intra-column scan at all:

* A `lax.scan` walks the T_y columns; a reverse `lax.scan` backtracks
  (stepping down on `index == y` or a strictly-better down-neighbor,
  the upstream tie-break).
* `jax.vmap` batches over items with per-item (t_x, t_y) lengths.

`maximum_path_numpy` is a scalar clean-room implementation of the same
(correct) semantics used as the parity oracle (and mirrored by the
native C++ kernel in matcha_tts_tpu/native).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

_NEG = jnp.float32(-1e30)


def _forward_dp(value: jnp.ndarray, t_x: jnp.ndarray, t_y: jnp.ndarray,
                unroll: int = 1) -> jnp.ndarray:
    """Banded DP over one (T_x, T_y) lattice; returns the DP matrix.

    value: (T_x, T_y) log-prior; t_x, t_y: scalar valid lengths.
    Both DP reads come from the previous column (see module docstring),
    so each column is one elementwise shift+max over the x axis.
    `unroll` trades loop-bookkeeping overhead for code size: the T_y-step
    column scan is inherently sequential, so at large T_y the per-iteration
    while-loop overhead dominates the (tiny) per-column vector work.
    """
    t_x_size, _ = value.shape
    xs = jnp.arange(t_x_size, dtype=jnp.int32)

    def column_step(prev_col, inputs):
        y, v = inputs  # v: (T_x,) column of value
        band_lo = jnp.maximum(0, t_x + y - t_y)
        band_hi = jnp.minimum(t_x, y + 1)
        in_band = (xs >= band_lo) & (xs < band_hi)

        # stay on token x: only reachable if x was in band at y-1 (x < y)
        stay = jnp.where(xs < y, prev_col, _NEG)
        # step down from token x-1; x == 0 starts the path at y == 0
        first = jnp.where(y == 0, jnp.float32(0.0), _NEG)
        down = jnp.concatenate([first[None], prev_col[:-1]])
        col = v + jnp.maximum(stay, down)
        col = jnp.where(in_band, col, _NEG)
        return col, col

    ys = jnp.arange(value.shape[1], dtype=jnp.int32)
    init = jnp.full((t_x_size,), _NEG, value.dtype)
    _, cols = jax.lax.scan(column_step, init, (ys, value.T), unroll=unroll)
    return cols.T  # (T_x, T_y)


def _backtrack(dp: jnp.ndarray, t_x: jnp.ndarray, t_y: jnp.ndarray,
               unroll: int = 1) -> jnp.ndarray:
    """Reverse scan emitting the one-hot path: step down when the path
    must (index == y — token index cannot exceed the frame index) or when
    the down-neighbor's DP score is strictly better (the upstream
    Glow-TTS tie-break)."""
    t_x_size, t_y_size = dp.shape
    xs = jnp.arange(t_x_size, dtype=jnp.int32)

    # prev_cols[:, y] = dp[:, y-1]; y = 0 wraps (the decision at y == 0 is
    # discarded anyway).
    prev_cols = jnp.roll(dp, 1, axis=1)

    def step(index, inputs):
        y, prev_col = inputs
        active = y < t_y
        col = jnp.where(active & (xs == index), 1.0, 0.0)
        down = (index == y) | (
            prev_col[jnp.maximum(index - 1, 0)] > prev_col[index])
        new_index = jnp.where(active & (index > 0) & down, index - 1, index)
        return new_index, col

    ys = jnp.arange(t_y_size - 1, -1, -1, dtype=jnp.int32)
    _, cols = jax.lax.scan(step, t_x - 1, (ys, prev_cols[:, ys].T),
                           unroll=unroll)
    return cols[::-1].T.astype(dp.dtype)  # (T_x, T_y)


def _maximum_path_single(value, t_x, t_y, unroll: int = 1):
    dp = _forward_dp(value, t_x, t_y, unroll)
    return _backtrack(dp, t_x, t_y, unroll)


def maximum_path(neg_cent: jnp.ndarray, mask: jnp.ndarray,
                 unroll: int = 16, impl: str = "auto") -> jnp.ndarray:
    """Batched on-device MAS.

    neg_cent: (B, T_x, T_y) Gaussian log-prior
    mask:     (B, T_x, T_y) attention-domain mask (x-mask x y-mask outer)
    returns:  (B, T_x, T_y) one-hot monotonic path (same dtype as neg_cent)

    Public semantics match `maximum_path` (train_standalone.py:280-325),
    with lengths recovered from the mask exactly as the reference does.
    `unroll` only changes codegen (benchmarks/mas_bench.py: 9.4 -> 8.5 ms
    at (32, 256, 768) on v5e with unroll=16); results are identical.

    `impl`: "scan" (portable lax.scan DP), "pallas" (VMEM-resident TPU
    kernel, ops/pallas/mas.py), or "auto" (pallas on the TPU backend
    where the shape gate passes).
    """
    if impl != "scan":
        from matcha_tts_tpu.ops.pallas.mas import (
            mas_pallas_ok,
            maximum_path_pallas,
        )

        b, t_x, t_y = neg_cent.shape
        on_tpu = jax.default_backend() == "tpu"
        if (impl == "pallas" or on_tpu) and mas_pallas_ok(b, t_x, t_y):
            return maximum_path_pallas(neg_cent, mask)
    dtype = neg_cent.dtype
    value = neg_cent.astype(jnp.float32)
    m = mask.astype(jnp.float32)
    # t_x = number of valid x at y=0; t_y = valid y at x=0
    # (train_standalone.py:290-291)
    t_xs = jnp.sum(m[:, :, 0], axis=1).astype(jnp.int32)
    t_ys = jnp.sum(m[:, 0, :], axis=1).astype(jnp.int32)
    path = jax.vmap(_maximum_path_single, in_axes=(0, 0, 0, None))(
        value, t_xs, t_ys, unroll)
    return path.astype(dtype)


# ---------------------------------------------------------------------------
# Scalar NumPy oracle (host) — parity reference for tests and for the C++
# kernel.  Clean-room re-implementation of the algorithm described above.
# ---------------------------------------------------------------------------


def maximum_path_numpy(neg_cent: np.ndarray, mask: np.ndarray) -> np.ndarray:
    """Host scalar MAS with the TRUE Glow-TTS semantics (see module
    docstring: the reference's in-place rewrite at
    train_standalone.py:241-325 is degenerate; this is the recurrence its
    shipped checkpoints were actually trained with)."""
    value_all = neg_cent.astype(np.float32)
    mask = np.asarray(mask)
    b = value_all.shape[0]
    t_xs = mask.sum(axis=1)[:, 0].astype(np.int32)
    t_ys = mask.sum(axis=2)[:, 0].astype(np.int32)
    paths = np.zeros_like(value_all, dtype=np.float32)
    neg = -1e30

    for i in range(b):
        t_x, t_y = int(t_xs[i]), int(t_ys[i])
        path = paths[i, :t_x, :t_y]
        value = value_all[i, :t_x, :t_y]
        dp = np.full((t_x, t_y), neg, np.float32)

        for y in range(t_y):
            for x in range(max(0, t_x + y - t_y), min(t_x, y + 1)):
                v_cur = neg if x == y else dp[x, y - 1]
                if x == 0:
                    v_prev = 0.0 if y == 0 else neg
                else:
                    v_prev = dp[x - 1, y - 1]
                dp[x, y] = max(v_prev, v_cur) + value[x, y]

        index = t_x - 1
        for y in range(t_y - 1, -1, -1):
            path[index, y] = 1.0
            if index > 0 and (index == y or dp[index - 1, y - 1] > dp[index, y - 1]):
                index -= 1

    return paths
