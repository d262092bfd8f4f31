"""Pod-sharded HiFi-GAN: vocode ONE long utterance across a device mesh.

The reference's only batching axis is the utterance (one GPU per forward);
long-form audio is bounded by a single device's throughput.  Here the mel
TIME axis is sharded over the mesh and each chip vocodes its frame span
with halo frames exchanged over ICI (`lax.ppermute` inside `shard_map`) —
sequence-parallel inference, new capability beyond the reference
(SURVEY.md §2.3: "new design territory").

Exactness: HiFi-GAN's receptive radius is r mel frames
(inference/streaming.py::receptive_radius_frames, =13 for v1), so every
chip needs r true frames of context per side.  Interior chips take an
r-frame halo from each neighbor; the first/last chip instead extend 2r
into their one neighbor so their window is flush with the true sequence
edge — the generator's own zero padding then matches the unsharded pass
and the concatenated output is EXACT everywhere (same contract as the
streaming vocoder, tested on an 8-device mesh).

Requires T % n_devices == 0 (frame buckets are multiples of 64, so any
bucketed mel satisfies this for pod sizes up to 64) and a per-chip span
of at least 2r frames.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
try:  # jax >= 0.4.35 exposes shard_map at top level
    from jax import shard_map
except ImportError:  # pragma: no cover - older jax
    from jax.experimental.shard_map import shard_map
from jax.sharding import NamedSharding, PartitionSpec as P

from matcha_tts_tpu.config import HiFiGANConfig
from matcha_tts_tpu.models import hifigan
from matcha_tts_tpu.inference.streaming import receptive_radius_frames


@functools.partial(jax.jit, static_argnames=("cfg", "mesh", "axis",
                                             "compute_dtype"))
def pod_vocode(params, mel: jnp.ndarray, mesh, cfg: HiFiGANConfig,
               axis: str = "data", compute_dtype: str = "float32"):
    """mel (T, n_mels), T sharded over `axis` -> wav (T * hop,), sharded.

    One jitted program; XLA emits the two ICI ppermutes and keeps each
    chip's generator pass local.
    """
    n = mesh.shape[axis]
    t, _ = mel.shape
    r = receptive_radius_frames(cfg)
    if t % n != 0:
        raise ValueError(f"T={t} must be divisible by mesh size {n}")
    chunk = t // n
    if n > 1 and chunk < 2 * r:
        raise ValueError(
            f"per-chip span {chunk} < 2*radius {2 * r}; use fewer chips")
    hop = cfg.total_upsample

    def shard_fn(mel_local):
        # mel_local: (chunk, C) — this chip's frame span
        if n == 1:
            wav = hifigan.generator(
                params, mel_local[None].astype(jnp.dtype(compute_dtype)), cfg
            )[0]
            return jnp.clip(wav.astype(jnp.float32), -1.0, 1.0)

        idx = jax.lax.axis_index(axis)
        # 2r-frame halos from each neighbor over ICI (zeros at mesh edges)
        to_right = [(i, i + 1) for i in range(n - 1)]
        to_left = [(i + 1, i) for i in range(n - 1)]
        left2r = jax.lax.ppermute(mel_local[-2 * r:], axis, to_right)
        right2r = jax.lax.ppermute(mel_local[: 2 * r], axis, to_left)

        # window (chunk + 2r, C): interior chips r|chunk|r; edge chips are
        # flush with the true sequence edge and extend 2r into the neighbor
        mid = jnp.concatenate([left2r[r:], mel_local, right2r[:r]])
        first = jnp.concatenate([mel_local, right2r])
        last = jnp.concatenate([left2r, mel_local])
        window = jnp.where(idx == 0, first,
                           jnp.where(idx == n - 1, last, mid))

        wav_win = hifigan.generator(
            params, window[None].astype(jnp.dtype(compute_dtype)), cfg)[0]
        wav_win = jnp.clip(wav_win.astype(jnp.float32), -1.0, 1.0)
        # valid span start within the window, in samples
        start = jnp.where(idx == 0, 0,
                          jnp.where(idx == n - 1, 2 * r * hop, r * hop))
        return jax.lax.dynamic_slice(wav_win, (start,), (chunk * hop,))

    try:  # jax.shard_map (>=0.7) renamed check_rep -> check_vma
        fn = shard_map(shard_fn, mesh=mesh,
                       in_specs=P(axis, None), out_specs=P(axis),
                       check_vma=False)
    except TypeError:  # pragma: no cover - older jax
        fn = shard_map(shard_fn, mesh=mesh,
                       in_specs=P(axis, None), out_specs=P(axis),
                       check_rep=False)
    mel = jax.device_put(mel, NamedSharding(mesh, P(axis, None)))
    return fn(mel)
