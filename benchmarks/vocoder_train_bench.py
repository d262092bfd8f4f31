"""Vocoder GAN training-step throughput (both families).

Measures seconds per (disc step + gen step) pair and audio-seconds/sec of
training throughput on synthetic audio at the vendored recipe's segment
size — the reference defines the GAN stack but never trains it
(hifigan/models.py:209-368), so these are first-party numbers.

Usage:
  python benchmarks/vocoder_train_bench.py [--family hifigan|vocos]
      [--batch 16] [--segment 8192] [--steps 20]
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


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--family", default="hifigan",
                   choices=("hifigan", "vocos"))
    p.add_argument("--discriminators", type=str, default=None)
    p.add_argument("--batch", type=int, default=16)
    p.add_argument("--segment", type=int, default=8192)
    p.add_argument("--steps", type=int, default=20)
    args = p.parse_args(argv)

    from matcha_tts_tpu.config import AudioConfig, HiFiGANConfig, VocosConfig
    from matcha_tts_tpu.train.vocoder import (create_gan_state, gan_disc_step,
                                              gan_gen_step)

    acfg = AudioConfig()
    if args.family == "vocos":
        hcfg, discs = VocosConfig(), ("mpd", "mrd")
    else:
        hcfg, discs = HiFiGANConfig(), ("mpd", "msd")
    if args.discriminators:
        discs = tuple(args.discriminators.split(","))

    state = create_gan_state(jax.random.PRNGKey(0), hcfg,
                             discriminators=discs)
    rng = np.random.default_rng(0)
    audio = jnp.asarray(rng.standard_normal(
        (args.batch, args.segment)).astype(np.float32) * 0.1)

    # compile both steps; time N chained pairs ended by a scalar FETCH
    # (block_until_ready under-reports on the tunneled backend, CLAUDE.md)
    state, d = gan_disc_step(state, audio, hcfg, acfg)
    state, m = gan_gen_step(state, audio, hcfg, acfg)
    float(m["gen_loss"])

    t0 = time.perf_counter()
    for _ in range(args.steps):
        state, d = gan_disc_step(state, audio, hcfg, acfg)
        state, m = gan_gen_step(state, audio, hcfg, acfg)
    float(m["gen_loss"])
    dt = (time.perf_counter() - t0) / args.steps

    audio_sec = args.batch * args.segment / acfg.sample_rate
    rec = {
        "metric": "gan_train_sec_per_step_pair",
        "family": args.family, "discriminators": list(discs),
        "batch": args.batch, "segment": args.segment,
        "sec_per_step_pair": dt,
        "train_audio_sec_per_sec": audio_sec / dt,
        "disc_loss": float(d), "gen_loss": float(m["gen_loss"]),
        "mel_l1": float(m["mel_l1"]),
    }
    print(json.dumps(rec))
    return rec


if __name__ == "__main__":
    main()
