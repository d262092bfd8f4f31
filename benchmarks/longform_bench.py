"""Long-form + multi-speaker synthesis benchmark (BASELINE config 5).

The reference handles long-form input only as a hard-coded `|`-separated
pair (main.py:158) and has no streaming or multi-speaker path exercised;
this harness measures the rebuild's versions on real hardware:

  * long-form paragraph -> synthesize_long (chunk, synthesize, join):
    wall time and RTF over the full paragraph;
  * streaming: stream_samples time-to-first-audio and steady chunk cadence;
  * multi-speaker (n_spks=10 config, spk embedding concat per
    model.py:527-528): per-utterance synthesis with distinct speaker ids.

Usage: python benchmarks/longform_bench.py [--nfe 10] [--dtype bfloat16]
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
import numpy as np

PARAGRAPH = (
    "The birch canoe slid on the smooth planks. "
    "Glue the sheet to the dark blue background. "
    "It is easy to tell the depth of a well, these days. "
    "These days a chicken leg is a rare dish to find. "
    "Rice is very often served in large round bowls. "
    "The juice of lemons makes fine punch for everyone. "
    "The box was thrown beside the parked truck yesterday. "
    "The hogs were fed with chopped corn and garbage. "
    "Four hours of steady work faced us that morning. "
    "A large size in stockings is hard to sell anywhere."
)


def _rss_mb(key: str = "VmRSS") -> float:
    for line in open("/proc/self/status"):
        if line.startswith(key):
            return int(line.split()[1]) / 1024.0
    return -1.0


def _book_run(args, syn, sr, kw):
    """Book-scale long-form: hundreds of chunks, memory growth, joins.

    The paragraph rows prove ~40 s of audio; BASELINE config 5 is
    long-form chunked streaming at production scale, so this run holds
    RTF and RSS flat over ~args.book_seconds of audio (the reference's
    long-form story is one hard-coded '|' pair, main.py:158)."""
    base = syn.split_text(PARAGRAPH)
    # estimate per-sentence audio from the warm paragraph pass, then
    # build a deterministic book of the right length
    probe = syn.synthesize_long(PARAGRAPH, **kw)
    per_sentence = len(probe.wav) / sr / len(base)
    n_sent = max(1, int(args.book_seconds / per_sentence))
    book = " ".join(base[i % len(base)] for i in range(n_sent))

    # warm the BOOK's bucket compositions (batch-32 groups the paragraph
    # never reaches): a cold fused-kernel compile inside the timed loop
    # costs minutes and is one-time by design (persistent cache)
    warm = " ".join(base[i % len(base)] for i in range(min(n_sent, 64)))
    syn.synthesize_long(warm, keep_aux=False, **kw)

    rss0, hwm0 = _rss_mb(), _rss_mb("VmHWM")
    t0 = time.perf_counter()
    r = syn.synthesize_long(book, keep_aux=False, **kw)
    wall = time.perf_counter() - t0
    audio_s = len(r.wav) / sr
    assert np.isfinite(r.wav).all()
    rec = {
        "metric": "book_longform", "family": args.family,
        "sentences": n_sent, "audio_s": round(audio_s, 1),
        "wall_s": round(wall, 2), "rtf": round(wall / audio_s, 5),
        "rss_mb": round(_rss_mb(), 1), "rss_growth_mb":
            round(_rss_mb() - rss0, 1),
        "peak_rss_mb": round(_rss_mb("VmHWM"), 1),
    }
    print(json.dumps(rec))

    # streaming over the same book: TTFA must stay sentence-scale and
    # memory flat (chunks are yielded, not accumulated on device)
    t0 = time.perf_counter()
    first, n_samples, n_chunks = None, 0, 0
    for chunk in syn.stream_samples(book, **kw):
        if first is None:
            first = time.perf_counter() - t0
        assert np.isfinite(chunk).all()
        n_samples += len(chunk)
        n_chunks += 1
    wall = time.perf_counter() - t0
    rec_s = {
        "metric": "book_stream", "family": args.family,
        "audio_s": round(n_samples / sr, 1), "chunks": n_chunks,
        "time_to_first_audio_s": round(first, 3),
        "wall_s": round(wall, 2),
        "rtf": round(wall / (n_samples / sr), 5),
        "rss_growth_mb": round(_rss_mb() - rss0, 1),
        "peak_rss_mb": round(_rss_mb("VmHWM"), 1),
    }
    print(json.dumps(rec_s))
    return rec, rec_s


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--nfe", type=int, default=10)
    p.add_argument("--dtype", default="bfloat16",
                   choices=("float32", "bfloat16"))
    p.add_argument("--length-scale", type=float, default=3.0,
                   help="3.0 reproduces trained-model duration statistics "
                        "on random weights (see bench.py)")
    p.add_argument("--family", default="hifigan",
                   choices=("hifigan", "vocos"),
                   help="vocoder family (streaming TTFA is per-family: "
                        "Vocos chunks run exact chunked iSTFT)")
    p.add_argument("--book-seconds", type=float, default=0.0,
                   help="> 0: book-scale run — repeat the sentence pool "
                        "until ~this much audio, measure synthesize_long "
                        "+ stream_samples wall/RTF/peak-RSS over hundreds "
                        "of chunks (BASELINE config 5 at minutes-hours "
                        "scale), then exit")
    args = p.parse_args(argv)

    from matcha_tts_tpu.config import (HiFiGANConfig, MatchaConfig,
                                       VocosConfig)
    from matcha_tts_tpu.inference.synthesizer import Synthesizer
    from matcha_tts_tpu.models import vocoder as vocoder_mod
    from matcha_tts_tpu.models.matcha import init_matcha

    hcfg = VocosConfig() if args.family == "vocos" else HiFiGANConfig()
    voc = vocoder_mod.init_vocoder(jax.random.PRNGKey(1), hcfg)

    # -- long-form + streaming (single-speaker config) ---------------------
    cfg = MatchaConfig()
    syn = Synthesizer(init_matcha(jax.random.PRNGKey(0), cfg), cfg, voc,
                      hcfg, compute_dtype=args.dtype,
                      denoise_strength=0.00025)
    sr = cfg.audio.sample_rate
    kw = dict(n_timesteps=args.nfe, length_scale=args.length_scale)

    # warm both paths (compiles + adaptive buckets)
    syn.synthesize_long(PARAGRAPH, **kw)
    for _ in syn.stream_samples(PARAGRAPH, **kw):
        pass

    if args.book_seconds > 0:
        return _book_run(args, syn, sr, kw)

    t0 = time.perf_counter()
    r = syn.synthesize_long(PARAGRAPH, **kw)
    wall = time.perf_counter() - t0
    audio_s = len(r.wav) / sr
    rec_long = {
        "metric": "longform", "family": args.family,
        "sentences": len(syn.split_text(PARAGRAPH)),
        "audio_s": round(audio_s, 2), "wall_s": round(wall, 3),
        "rtf": round(wall / audio_s, 5),
    }
    print(json.dumps(rec_long))

    t0 = time.perf_counter()
    first = None
    n_samples = 0
    for chunk in syn.stream_samples(PARAGRAPH, **kw):
        if first is None:
            first = time.perf_counter() - t0
        n_samples += len(chunk)
    wall = time.perf_counter() - t0
    rec_stream = {
        "metric": "longform_stream", "family": args.family,
        "audio_s": round(n_samples / sr, 2),
        "time_to_first_audio_s": round(first, 3),
        "wall_s": round(wall, 3),
        "rtf": round(wall / (n_samples / sr), 5),
    }
    print(json.dumps(rec_stream))

    # -- multi-speaker (n_spks=10, spk_emb_dim=64 like Matcha's VCTK cfg) --
    mcfg = MatchaConfig(n_spks=10, spk_emb_dim=64)
    msyn = Synthesizer(init_matcha(jax.random.PRNGKey(2), mcfg), mcfg, voc,
                       hcfg, compute_dtype=args.dtype,
                       denoise_strength=0.00025)
    text = "The juice of lemons makes fine punch."
    # warm every speaker: each random spk embedding shifts the predicted
    # duration, which can land in a different (adaptive) frame bucket
    for spk in range(4):
        msyn.synthesize(text, spk=spk, **kw)
    wavs, t0 = [], time.perf_counter()
    for spk in range(4):
        wavs.append(msyn.synthesize(text, spk=spk, **kw).wav)
    wall = time.perf_counter() - t0
    audio_s = sum(len(w) for w in wavs) / sr
    distinct = len({np.abs(w).sum().round(4) for w in wavs})
    rec_spk = {
        "metric": "multispeaker", "n_spks": 4,
        "audio_s": round(audio_s, 2), "wall_s": round(wall, 3),
        "rtf": round(wall / audio_s, 5), "distinct_outputs": distinct,
    }
    print(json.dumps(rec_spk))
    return rec_long, rec_stream, rec_spk


if __name__ == "__main__":
    main()
