"""End-to-end vocoder GAN convergence proof on TPU (either family).

Trains the full-size generator + its paper discriminator recipe from
scratch on a synthetic harmonic-speech corpus (the distill_e2e corpus
generator) and reports the mel-L1 / SNR trajectory plus wav-domain quality
of the trained generator against ground-truth audio — proving the GAN
recipe actually CONVERGES on hardware, not just that the steps run.
The reference never trains its vendored GAN stack (hifigan/models.py:209+).

Usage:
  python benchmarks/vocoder_gan_e2e.py [--family vocos] [--steps 600]
      [--batch 16] [--segment 8192]
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
    ap = argparse.ArgumentParser()
    ap.add_argument("--family", default="vocos", choices=("hifigan", "vocos"))
    ap.add_argument("--steps", type=int, default=600)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--segment", type=int, default=8192)
    ap.add_argument("--data-root", default="/tmp/vocgan_corpus")
    ap.add_argument("--report-every", type=int, default=100)
    args = ap.parse_args(argv)

    from benchmarks.distill_e2e import make_corpus
    from matcha_tts_tpu.config import AudioConfig, HiFiGANConfig, VocosConfig
    from matcha_tts_tpu.data.dataset import load_wav, parse_filelist
    from matcha_tts_tpu.ops.stft import log_mel_spectrogram
    from matcha_tts_tpu.train.vocoder import (create_gan_state, gan_disc_step,
                                              gan_gen_step, random_segment_np)

    root = Path(args.data_root)
    make_corpus(root)
    wavs = [load_wav(root / "wavs" / f"{p[0]}.wav")[0]
            for p in parse_filelist(root / "metadata.csv")]
    eval_src, wavs = wavs[-1], wavs[:-1]  # hold the eval clip OUT of training

    acfg = AudioConfig()
    if args.family == "vocos":
        hcfg, discs = VocosConfig(), ("mpd", "mrd")
    else:
        hcfg, discs = HiFiGANConfig(), ("mpd", "msd")

    state = create_gan_state(jax.random.PRNGKey(0), hcfg,
                             discriminators=discs)
    rng = np.random.default_rng(0)

    def batch():
        return jnp.asarray(np.stack([
            random_segment_np(rng, wavs[int(i)], args.segment,
                              acfg.hop_length)
            for i in rng.integers(0, len(wavs), size=args.batch)]))

    # held-out evaluation clip (never seen by training)
    eval_wav = jnp.asarray(eval_src[: args.segment][None])
    eval_mel = log_mel_spectrogram(eval_wav, acfg.sample_rate, acfg.n_fft,
                                   acfg.n_mels, acfg.hop_length,
                                   acfg.win_length, acfg.f_min, acfg.f_max)

    @jax.jit
    def eval_quality(gen_params):
        from matcha_tts_tpu.models import vocoder as vocoder_mod

        fake = vocoder_mod.generate(gen_params, eval_mel.transpose(0, 2, 1),
                                    hcfg)
        n = min(eval_wav.shape[-1], fake.shape[-1])
        mel_f = log_mel_spectrogram(fake[..., :n], acfg.sample_rate,
                                    acfg.n_fft, acfg.n_mels, acfg.hop_length,
                                    acfg.win_length, acfg.f_min, acfg.f_max)
        mel_r = log_mel_spectrogram(eval_wav[..., :n], acfg.sample_rate,
                                    acfg.n_fft, acfg.n_mels, acfg.hop_length,
                                    acfg.win_length, acfg.f_min, acfg.f_max)
        mel_l1 = jnp.mean(jnp.abs(mel_f - mel_r))
        err = fake[..., :n] - eval_wav[..., :n]
        snr = 10.0 * jnp.log10(jnp.mean(eval_wav[..., :n] ** 2)
                               / jnp.maximum(jnp.mean(err ** 2), 1e-30))
        return mel_l1, snr

    traj = []
    m0, s0 = eval_quality(state.gen_params)
    traj.append({"step": 0, "eval_mel_l1": float(m0), "eval_snr_db": float(s0)})
    print(json.dumps(traj[-1]), file=sys.stderr)

    t0 = time.perf_counter()
    for step in range(args.steps):
        audio = batch()
        state, d_loss = gan_disc_step(state, audio, hcfg, acfg)
        state, metrics = gan_gen_step(state, audio, hcfg, acfg)
        if (step + 1) % args.report_every == 0:
            m, s = eval_quality(state.gen_params)
            traj.append({"step": step + 1, "eval_mel_l1": float(m),
                         "eval_snr_db": float(s),
                         "train_mel_l1": float(metrics["mel_l1"]),
                         "disc_loss": float(d_loss)})
            print(json.dumps(traj[-1]), file=sys.stderr)
    wall = time.perf_counter() - t0

    rec = {
        "metric": "vocoder_gan_e2e",
        "family": args.family, "discriminators": list(discs),
        "steps": args.steps, "batch": args.batch, "segment": args.segment,
        "train_wall_sec": wall,
        "eval_mel_l1_start": traj[0]["eval_mel_l1"],
        "eval_mel_l1_end": traj[-1]["eval_mel_l1"],
        "eval_snr_db_start": traj[0]["eval_snr_db"],
        "eval_snr_db_end": traj[-1]["eval_snr_db"],
        "trajectory": traj,
    }
    print(json.dumps(rec))
    return rec


if __name__ == "__main__":
    main()
