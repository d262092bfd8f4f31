"""Mask and alignment-path utilities (jittable, static shapes).

Mirrors the reference helpers at /root/reference/model.py:42-76 but with
static `max_length` everywhere: the reference's `length.max()` /
`fix_len_compatibility(...).item()` host syncs (model.py:49-55,1278-1281)
become bucket-padded static shapes chosen on host.
"""

from __future__ import annotations

import jax.numpy as jnp


def sequence_mask(lengths: jnp.ndarray, max_length: int) -> jnp.ndarray:
    """(B,) lengths -> (B, max_length) bool mask
    (reference: model.py:42-46, with static max_length)."""
    pos = jnp.arange(max_length, dtype=lengths.dtype)
    return pos[None, :] < lengths[:, None]


def fix_len_compatibility(length: int, num_downsamples: int = 2) -> int:
    """Round up to a multiple of 2**num_downsamples (reference:
    model.py:49-55).  Host-side int math — used when choosing buckets."""
    factor = 2**num_downsamples
    return int(-(-length // factor) * factor)


def generate_path(duration: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """Durations -> binary monotonic alignment path.

    duration: (B, T_x) non-negative integers (float dtype ok)
    mask:     (B, T_x, T_y) attention-domain mask
    returns:  (B, T_x, T_y) 0/1 path, row x covers frames
              [cumdur[x-1], cumdur[x])  (reference: model.py:64-76).
    """
    b, t_x, t_y = mask.shape
    cum_duration = jnp.cumsum(duration, axis=1)  # (B, T_x)
    pos = jnp.arange(t_y, dtype=cum_duration.dtype)
    # path_until[x, y] = 1 if y < cumdur[x]
    path = (pos[None, None, :] < cum_duration[:, :, None]).astype(mask.dtype)
    # subtract the row above -> exactly the frames belonging to token x
    path = path - jnp.pad(path, ((0, 0), (1, 0), (0, 0)))[:, :-1]
    return path * mask
