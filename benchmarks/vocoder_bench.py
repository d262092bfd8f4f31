"""Vocoder-only benchmark: batch mel -> wav (+ denoiser) — BASELINE config 2.

Measures HiFi-GAN generator throughput (audio-seconds per second) and the
denoiser pass, using the chained-iteration method (docs/RESULTS.md).

Usage: python benchmarks/vocoder_bench.py [--batch 1] [--frames 768]
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax

jax.config.update("jax_compilation_cache_dir",
                  str(Path(__file__).resolve().parent.parent / ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
import numpy as np

CHAIN = 8


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=1)
    p.add_argument("--frames", type=int, default=768)
    p.add_argument("--denoise", type=float, default=0.00025,
                   help="denoiser strength (reference notebooks use 0.00025)")
    p.add_argument("--mrf", default="xla",
                   choices=("xla", "tap", "packed", "int8", "auto"),
                   help="MRF implementation (HiFiGANConfig.mrf_kernel)")
    p.add_argument("--dtype", default="float32",
                   choices=("float32", "bfloat16"))
    p.add_argument("--family", default="hifigan",
                   choices=("hifigan", "vocos"),
                   help="vocoder family (models/vocoder.py dispatch)")
    args = p.parse_args(argv)

    from matcha_tts_tpu.config import HiFiGANConfig, VocosConfig
    from matcha_tts_tpu.models import vocoder as vocoder_mod
    from matcha_tts_tpu.models.denoiser import (DenoiserState, denoise,
                                                make_denoiser)

    def make_state(bias_spec):
        return DenoiserState(bias_spec)

    if args.family == "vocos":
        hcfg = VocosConfig()
    else:
        hcfg = HiFiGANConfig(mrf_kernel=args.mrf)
    vp = vocoder_mod.init_vocoder(jax.random.PRNGKey(0), hcfg)
    state = make_denoiser(vp, hcfg)
    dtype = jnp.dtype(args.dtype)

    b, t = args.batch, args.frames
    rng = np.random.default_rng(0)
    mel0 = jnp.asarray(rng.standard_normal((b, t, hcfg.num_mels))
                       .astype(np.float32)).astype(dtype)
    sr = hcfg.sampling_rate
    audio_sec = b * t * hcfg.total_upsample / sr

    # params/mel travel as explicit jit arguments: closure-captured device
    # arrays can be inlined as MLIR constants, whose lowering needs a
    # device->host fetch the axon TPU plugin cannot do (UNIMPLEMENTED).
    @jax.jit
    def voc_chain(vp, mel0, key):
        def body(i, carry):
            acc, key = carry
            key = jax.random.fold_in(key, i)
            noise = jax.random.normal(key, mel0.shape, mel0.dtype) * 0.01
            wav = vocoder_mod.generate(vp, mel0 + noise, hcfg)
            return acc + jnp.sum(wav), key
        acc, _ = jax.lax.fori_loop(0, CHAIN, body, (jnp.float32(0), key))
        return acc

    @jax.jit
    def voc_denoise_chain(vp, bias_spec, mel0, key):
        state = make_state(bias_spec)
        def body(i, carry):
            acc, key = carry
            key = jax.random.fold_in(key, i)
            noise = jax.random.normal(key, mel0.shape, mel0.dtype) * 0.01
            wav = vocoder_mod.generate(vp, mel0 + noise, hcfg)
            den = denoise(state, wav, strength=args.denoise)
            return acc + jnp.sum(den), key
        acc, _ = jax.lax.fori_loop(0, CHAIN, body, (jnp.float32(0), key))
        return acc

    def timed(f, *fargs):
        float(f(*fargs, jax.random.PRNGKey(0)))
        ts = []
        for s in range(1, 4):
            t0 = time.perf_counter()
            float(f(*fargs, jax.random.PRNGKey(s)))
            ts.append((time.perf_counter() - t0) / CHAIN)
        return float(np.median(ts))

    t_voc = timed(voc_chain, vp, mel0)
    t_den = timed(voc_denoise_chain, vp, state.bias_spec, mel0)
    rec = {
        "metric": "vocoder_audio_sec_per_sec",
        "family": args.family,
        "batch": b, "frames": t, "audio_sec": audio_sec,
        "vocoder_ms": t_voc * 1e3,
        "vocoder_audio_sec_per_sec": audio_sec / t_voc,
        "vocoder_plus_denoiser_ms": t_den * 1e3,
        "denoiser_overhead_ms": (t_den - t_voc) * 1e3,
    }
    print(json.dumps(rec))
    return rec


if __name__ == "__main__":
    main()
