"""RTF benchmark harness with per-stage breakdown (encode / ODE / vocode).

The reference's only perf tooling is wall-clock deltas in notebooks
(MOS_audiou_generator.ipynb cell 12).  This harness is a first-class
benchmark: per-stage timers, NFE sweep, batch sweep, optional
`jax.profiler` trace.

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
import jax.numpy as jnp
import numpy as np


def timed(fn, *args, n=5, **kw):
    """Median wall time of a device computation (blocks on result)."""
    out = fn(*args, **kw)
    jax.block_until_ready(out)
    times = []
    for _ in range(n):
        t0 = time.perf_counter()
        out = fn(*args, **kw)
        jax.block_until_ready(out)
        times.append(time.perf_counter() - t0)
    return float(np.median(times)), out


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--nfe", type=int, default=10)
    p.add_argument("--batch", type=int, default=1)
    p.add_argument("--tokens", type=int, default=128)
    p.add_argument("--frames", type=int, default=768)
    p.add_argument("--sweep", action="store_true")
    p.add_argument("--trace", type=str, default=None)
    args = p.parse_args(argv)

    from matcha_tts_tpu.config import HiFiGANConfig, MatchaConfig
    from matcha_tts_tpu.models import hifigan
    from matcha_tts_tpu.models.matcha import init_matcha, synthesize
    from matcha_tts_tpu.models.text_encoder import text_encoder

    cfg = MatchaConfig()
    hcfg = HiFiGANConfig()
    params = init_matcha(jax.random.PRNGKey(0), cfg)
    voc = hifigan.init_generator(jax.random.PRNGKey(1), hcfg)

    b, t_x, t_y = args.batch, args.tokens, args.frames
    rng = np.random.default_rng(0)
    x = np.zeros((b, t_x), np.int32)
    for i in range(b):
        x[i, : t_x - 8] = rng.integers(1, 178, size=t_x - 8)
    x_lengths = np.full((b,), t_x - 8, np.int32)
    key = jax.random.PRNGKey(2)

    sr = cfg.audio.sample_rate
    hop = cfg.audio.hop_length

    @functools.partial(jax.jit, static_argnames=())
    def encode_fn(params, x, x_lengths):
        mu, logw, x_mask = text_encoder(params["encoder"], x, x_lengths,
                                        cfg.encoder, cfg.duration_predictor)
        return mu, logw, x_mask

    def synth_fn(nfe):
        def f(params, key, x, x_lengths):
            return synthesize(params, key, x, x_lengths, cfg,
                              n_timesteps=nfe, t_y_max=t_y,
                              temperature=0.667).mel
        return jax.jit(f)

    @jax.jit
    def vocode_fn(voc, mel_btc):
        return hifigan.generator(voc, mel_btc, hcfg)

    nfes = (2, 4, 10, 32) if args.sweep else (args.nfe,)
    results = []
    for nfe in nfes:
        sf = synth_fn(nfe)
        t_enc, _ = timed(encode_fn, params, x, x_lengths)
        t_mel, mel = timed(sf, params, key, x, x_lengths)
        mel_btc = jnp.transpose(mel, (0, 2, 1))
        t_voc, wav = timed(vocode_fn, voc, mel_btc)

        audio_sec = t_y * hop / sr * b
        e2e = t_mel + t_voc
        rec = {
            "nfe": nfe, "batch": b, "tokens": t_x, "frames": t_y,
            "encode_ms": t_enc * 1e3,
            "mel_ms": t_mel * 1e3,
            "vocode_ms": t_voc * 1e3,
            "e2e_ms": e2e * 1e3,
            "audio_sec": audio_sec,
            "rtf": e2e / audio_sec,
            "mel_frames_per_sec": t_y * b / t_mel,
            "vocoder_audio_sec_per_sec": audio_sec / t_voc,
        }
        results.append(rec)
        print(json.dumps(rec))

    if args.trace:
        with jax.profiler.trace(args.trace):
            sf = synth_fn(args.nfe)
            mel = sf(params, key, x, x_lengths)
            wav = vocode_fn(voc, jnp.transpose(mel, (0, 2, 1)))
            jax.block_until_ready(wav)
        print(f"trace written to {args.trace}")

    return results


if __name__ == "__main__":
    main()
