"""AOT export of the fused synthesis graph (jax.export / StableHLO).

The reference deploys eager PyTorch modules; a production TPU service
wants the opposite: a frozen, serialized program per compiled shape that
reloads in a fresh process without Python model code, retracing, or
recompiling from source.  `jax.export` serializes the lowered StableHLO
together with its calling convention; reloading gives a callable that
feeds straight into XLA's compilation cache.

Artifacts keep the parameters as *call-time arguments* (the serialized
program is a few MB of IR, not a weight dump), so one artifact serves
any checkpoint with the same tree — pair it with the Orbax checkpoint of
your choice at load time.

Layout on disk (`export_bucket_grid`):

    out_dir/
      manifest.json            {"entries": [{"batch":1,"text":128,...}]}
      synth_b1_t128_f512.bin   serialized jax.export.Exported
      ...

Each entry is the packed-PCM serving graph (`_synthesize_packed`
semantics: one flat int16 [pcm | y_lengths] buffer, optional in-graph
denoiser) for one (batch, text-bucket, frame-bucket) shape.
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax import export as jax_export

from matcha_tts_tpu.config import HiFiGANConfig, MatchaConfig
from matcha_tts_tpu.inference import synthesizer as _syn


def _spec_like(tree):
    return jax.tree.map(
        lambda a: jax.ShapeDtypeStruct(jnp.shape(a), jnp.asarray(a).dtype),
        tree)


def export_synthesis(
    matcha_params,
    matcha_cfg: MatchaConfig,
    vocoder_params,
    hifi_cfg: HiFiGANConfig,
    *,
    batch: int = 1,
    text_bucket: int = 128,
    frame_bucket: int = 512,
    n_timesteps: int = 10,
    temperature: float = 0.667,
    length_scale: float = 1.0,
    compute_dtype: str = "bfloat16",
    denoise_strength: float = 0.0,
    bias_spec=None,
    platforms: Optional[Sequence[str]] = None,
) -> bytes:
    """Serialize one (batch, text, frame) packed-synthesis graph.

    The exported callable's signature is
        (matcha_params, vocoder_params, key, x, x_lengths[, bias_spec])
        -> (packed_int16, mel, attn, durations, y_lengths)
    with `x: (batch, text_bucket) int32` and the packed buffer laid out
    as in `_synthesize_packed` (synthesizer.py:104-135).
    """
    has_bias = denoise_strength > 0.0 and bias_spec is not None

    def fn(mp, vp, key, x, x_lengths, *maybe_bias):
        bias = maybe_bias[0] if maybe_bias else None
        packed, out = _syn._synthesize_packed.__wrapped__(
            mp, vp, key, x, x_lengths, matcha_cfg, hifi_cfg, n_timesteps,
            frame_bucket, temperature, length_scale, None, compute_dtype,
            bias, denoise_strength if has_bias else 0.0, None)
        return packed, out.mel, out.attn, out.durations, out.y_lengths

    args = [
        _spec_like(matcha_params),
        _spec_like(vocoder_params),
        jax.ShapeDtypeStruct((2,), jnp.uint32),  # PRNGKey data
        jax.ShapeDtypeStruct((batch, text_bucket), jnp.int32),
        jax.ShapeDtypeStruct((batch,), jnp.int32),
    ]
    if has_bias:
        args.append(_spec_like(bias_spec))

    exported = jax_export.export(jax.jit(fn), platforms=platforms)(*args)
    return exported.serialize()


def load_synthesis(data: bytes):
    """Deserialize an exported graph; returns the callable.

    Call with the same argument structure `export_synthesis` documents;
    the PRNG key argument is raw uint32 key data
    (`jax.random.key_data(jax.random.PRNGKey(seed))`)."""
    return jax_export.deserialize(data).call


def export_bucket_grid(
    matcha_params,
    matcha_cfg: MatchaConfig,
    vocoder_params,
    hifi_cfg: HiFiGANConfig,
    out_dir,
    *,
    batch_buckets: Sequence[int] = (1,),
    text_buckets: Sequence[int] = (128, 256),
    frame_buckets: Sequence[int] = (256, 512, 768),
    n_timesteps: int = 10,
    compute_dtype: str = "bfloat16",
    platforms: Optional[Sequence[str]] = None,
    **kw,
) -> dict:
    """Export a serving grid of graphs + manifest.json; returns the manifest."""
    out = Path(out_dir)
    out.mkdir(parents=True, exist_ok=True)
    entries = []
    for b in batch_buckets:
        for t in text_buckets:
            for f in frame_buckets:
                name = f"synth_b{b}_t{t}_f{f}.bin"
                data = export_synthesis(
                    matcha_params, matcha_cfg, vocoder_params, hifi_cfg,
                    batch=b, text_bucket=t, frame_bucket=f,
                    n_timesteps=n_timesteps, compute_dtype=compute_dtype,
                    platforms=platforms, **kw)
                (out / name).write_bytes(data)
                entries.append({"batch": b, "text": t, "frames": f,
                                "file": name, "n_timesteps": n_timesteps,
                                "compute_dtype": compute_dtype})
    manifest = {
        "format": "matcha-tpu-export-v1",
        "sample_rate": matcha_cfg.audio.sample_rate,
        "hop_length": matcha_cfg.audio.hop_length,
        "entries": entries,
    }
    (out / "manifest.json").write_text(json.dumps(manifest, indent=2))
    return manifest


def load_bucket_grid(out_dir) -> dict:
    """Load a manifest directory into {(batch, text, frames): callable}."""
    out = Path(out_dir)
    manifest = json.loads((out / "manifest.json").read_text())
    table = {}
    for e in manifest["entries"]:
        data = (out / e["file"]).read_bytes()
        table[(e["batch"], e["text"], e["frames"])] = load_synthesis(data)
    return table


def key_data(seed: int) -> jnp.ndarray:
    """Raw uint32 key data for the exported graphs' key argument."""
    return jax.random.key_data(jax.random.PRNGKey(seed))


def unpack_pcm(packed: np.ndarray, batch: int, hop_length: int):
    """Split the flat int16 buffer back into (pcm (B, T_wav), y_lengths)."""
    packed = np.asarray(packed)
    y_lengths = packed[-batch:].astype(np.int32)
    pcm = packed[:-batch].reshape(batch, -1)
    return pcm, y_lengths
