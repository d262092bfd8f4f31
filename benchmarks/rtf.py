"""RTF benchmark harness with per-stage breakdown (encode / ODE / vocode).

The reference's only perf tooling is wall-clock deltas in notebooks
(MOS_audiou_generator.ipynb cell 12).  This harness measures true DEVICE
time per stage by chaining K dependent iterations inside one jitted
program (`lax.fori_loop`) and fetching a single scalar — naive
`block_until_ready` timing is unreliable on remote-tunnel transports
(docs/RESULTS.md).

Usage:
  python benchmarks/rtf.py [--nfe 10] [--batch 1] [--trace /tmp/trace]
  python benchmarks/rtf.py --sweep        # NFE in {2,4,10,32} (BASELINE cfg 3)
"""

from __future__ import annotations

import argparse
import functools
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

CHAIN = 8  # dependent iterations per timing sample


def chained_time(f, *args, n_samples: int = 3) -> float:
    """Median seconds per iteration of a chained-K jitted callable.

    `f(key, *args)` must internally run CHAIN dependent iterations and
    return a scalar.
    """
    float(f(jax.random.PRNGKey(0), *args))  # compile + warm
    ts = []
    for s in range(1, n_samples + 1):
        t0 = time.perf_counter()
        float(f(jax.random.PRNGKey(s), *args))
        ts.append((time.perf_counter() - t0) / CHAIN)
    return float(np.median(ts))


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--nfe", type=int, default=10)
    p.add_argument("--batch", type=int, default=1)
    p.add_argument("--tokens", type=int, default=256)
    p.add_argument("--frames", type=int, default=768)
    p.add_argument("--sweep", action="store_true")
    p.add_argument("--trace", type=str, default=None)
    p.add_argument("--dtype", default="bfloat16",
                   choices=("float32", "bfloat16"),
                   help="compute dtype (bfloat16 is the idiomatic TPU "
                        "inference dtype; fp32 at large batch can exceed "
                        "HBM on the XLA vocoder path)")
    p.add_argument("--mrf", default=None,
                   choices=("xla", "tap", "packed", "int8", "auto"),
                   help="override HiFiGANConfig.mrf_kernel")
    p.add_argument("--family", default="hifigan",
                   choices=("hifigan", "vocos"),
                   help="vocoder family (models/vocoder.py dispatch)")
    args = p.parse_args(argv)

    from matcha_tts_tpu.config import (HiFiGANConfig, MatchaConfig,
                                       VocosConfig)
    from matcha_tts_tpu.inference.synthesizer import _synthesize_to_wav
    from matcha_tts_tpu.models import vocoder as vocoder_mod
    from matcha_tts_tpu.models.matcha import init_matcha
    from matcha_tts_tpu.models.text_encoder import text_encoder

    cfg = MatchaConfig()
    if args.family == "vocos":
        hcfg = VocosConfig()
    else:
        hcfg = (HiFiGANConfig() if args.mrf is None
                else HiFiGANConfig(mrf_kernel=args.mrf))
    params = init_matcha(jax.random.PRNGKey(0), cfg)
    voc = vocoder_mod.init_vocoder(jax.random.PRNGKey(1), hcfg)

    b, t_x, t_y = args.batch, args.tokens, args.frames
    rng = np.random.default_rng(0)
    x = np.zeros((b, t_x), np.int32)
    for i in range(b):
        x[i, : t_x - 8] = rng.integers(1, cfg.n_vocab, size=t_x - 8)
    xd = jnp.asarray(x)
    xl = jnp.asarray(np.full((b,), t_x - 8, np.int32))
    mel0 = jnp.asarray(rng.standard_normal((b, t_y, cfg.audio.n_mels))
                       .astype(np.float32))

    sr = cfg.audio.sample_rate
    hop = cfg.audio.hop_length
    audio_sec = b * t_y * hop / sr

    @jax.jit
    def enc_chain(key):
        def body(i, carry):
            acc, _ = carry
            mu, logw, m = text_encoder(params["encoder"],
                                       xd + (acc * 0).astype(jnp.int32), xl,
                                       cfg.encoder, cfg.duration_predictor)
            return acc + jnp.sum(mu), key
        acc, _ = jax.lax.fori_loop(0, CHAIN, body, (jnp.float32(0), key))
        return acc

    dt = jnp.dtype(args.dtype)
    voc_c = jax.tree.map(lambda a: a.astype(dt), voc)
    mel0_c = mel0.astype(dt)

    @jax.jit
    def voc_chain(key):
        def body(i, carry):
            acc, key = carry
            key = jax.random.fold_in(key, i)
            noise = jax.random.normal(key, mel0.shape, jnp.float32) * 0.01
            wav = vocoder_mod.generate(voc_c, mel0_c + noise.astype(dt),
                                       hcfg)
            return acc + jnp.sum(wav.astype(jnp.float32)), key
        acc, _ = jax.lax.fori_loop(0, CHAIN, body, (jnp.float32(0), key))
        return acc

    def full_chain(nfe):
        @jax.jit
        def f(key):
            def body(i, carry):
                acc, key = carry
                key = jax.random.fold_in(key, i)
                out, wav = _synthesize_to_wav.__wrapped__(
                    params, voc, key, xd, xl, cfg, hcfg, nfe, t_y,
                    0.667, 1.0, None, args.dtype)
                return acc + jnp.sum(wav), key
            acc, _ = jax.lax.fori_loop(0, CHAIN, body, (jnp.float32(0), key))
            return acc
        return f

    t_enc = chained_time(enc_chain)
    t_voc = chained_time(voc_chain)

    nfes = (2, 4, 10, 32) if args.sweep else (args.nfe,)
    results = []
    for nfe in nfes:
        t_full = chained_time(full_chain(nfe))
        rec = {
            "nfe": nfe, "batch": b, "tokens": t_x, "frames": t_y,
            "family": args.family,
            "dtype": args.dtype,
            "encode_ms": t_enc * 1e3,
            "vocode_ms": t_voc * 1e3,
            "full_graph_ms": t_full * 1e3,
            "audio_sec": audio_sec,
            "device_rtf": t_full / audio_sec,
            "mel_frames_per_sec": t_y * b / max(t_full - t_voc, 1e-9),
            "vocoder_audio_sec_per_sec": audio_sec / t_voc,
        }
        results.append(rec)
        print(json.dumps(rec))

    if args.trace:
        f = full_chain(args.nfe)
        with jax.profiler.trace(args.trace):
            float(f(jax.random.PRNGKey(99)))
        print(f"trace written to {args.trace}")

    return results


if __name__ == "__main__":
    main()
