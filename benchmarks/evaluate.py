"""Evaluation harness: RTF + (optional) WER, the reference notebooks' job
(MOS_audiou_generator.ipynb cells 11-14, evaluation.ipynb cells 9-13).

RTF: synthesize N sentences at NFE=10, temperature 0.667, batch 1, report
per-sentence and mean RTF (text->wav wall time / audio duration).

WER: if a local Whisper model is available via `transformers`
(no network egress here, so this requires pre-downloaded weights), run ASR
on the synthesized audio and compute word error rate with a self-contained
Levenshtein implementation (no `jiwer` dependency).

Usage:
  python benchmarks/evaluate.py [--checkpoint ...] [--vocoder ...]
  python benchmarks/evaluate.py --whisper /path/to/whisper-medium
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np

# The 10 LJSpeech-style validation sentences used by bench.py (matched in
# length distribution to the reference's RTF set).
from bench import SENTENCES
# Metric plumbing lives in the package (matcha_tts_tpu/eval/wer.py); these
# re-exports keep this module's historical surface.
from matcha_tts_tpu.eval.wer import (evaluate_wer, normalize_for_wer,
                                     resample_to_16k, word_error_rate)


def load_whisper_asr(model_path: str):
    """Build an `asr` callable from a local Whisper checkpoint via
    transformers (no egress here — weights must be pre-downloaded)."""
    import torch
    from transformers import (WhisperForConditionalGeneration,
                              WhisperProcessor)

    proc = WhisperProcessor.from_pretrained(model_path)
    model = WhisperForConditionalGeneration.from_pretrained(model_path)

    def asr(wav16k: np.ndarray) -> str:
        inputs = proc(wav16k, sampling_rate=16000, return_tensors="pt")
        with torch.no_grad():
            ids = model.generate(inputs.input_features)
        return proc.batch_decode(ids, skip_special_tokens=True)[0]

    return asr


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--checkpoint", type=str, default=None)
    p.add_argument("--vocoder", type=str, default=None)
    p.add_argument("--nfe", type=int, default=10)
    p.add_argument("--whisper", type=str, default=None,
                   help="local path to a Whisper model for WER")
    p.add_argument("--ctc-asr", type=str, default=None,
                   help="path to a trained in-repo CTC judge (.npz, saved "
                        "by benchmarks/wer_e2e.py) for WER without Whisper")
    p.add_argument("--out_dir", type=str, default=None,
                   help="write synthesized WAVs here")
    args = p.parse_args(argv)

    import jax

    jax.config.update(
        "jax_compilation_cache_dir",
        str(Path(__file__).resolve().parent.parent / ".jax_cache"),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from matcha_tts_tpu.config import HiFiGANConfig, MatchaConfig
    from matcha_tts_tpu.inference.synthesizer import Synthesizer
    from matcha_tts_tpu.models import hifigan
    from matcha_tts_tpu.models.matcha import init_matcha
    from matcha_tts_tpu.params.convert import (
        convert_hifigan,
        convert_matcha,
        load_torch_state_dict,
    )
    from matcha_tts_tpu.utils.wav import write_wav

    cfg, hcfg = MatchaConfig(), HiFiGANConfig()
    if args.checkpoint:
        mp = convert_matcha(load_torch_state_dict(args.checkpoint), cfg)
    else:
        mp = init_matcha(jax.random.PRNGKey(0), cfg)
    if args.vocoder:
        vp = convert_hifigan(load_torch_state_dict(args.vocoder), hcfg)
    else:
        vp = hifigan.init_generator(jax.random.PRNGKey(1), hcfg)

    syn = Synthesizer(mp, cfg, vp, hcfg)
    sr = cfg.audio.sample_rate

    # warmup compiles
    for s in SENTENCES:
        syn.synthesize(s, n_timesteps=args.nfe, seed=0)

    records = []
    wavs = []
    for i, s in enumerate(SENTENCES):
        t0 = time.perf_counter()
        r = syn.synthesize(s, n_timesteps=args.nfe, temperature=0.667, seed=i)
        dt = time.perf_counter() - t0
        audio_sec = len(r.wav) / sr
        records.append({"i": i, "wall_s": dt, "audio_s": audio_sec,
                        "rtf": dt / audio_sec})
        wavs.append(r.wav)
        if args.out_dir:
            Path(args.out_dir).mkdir(parents=True, exist_ok=True)
            write_wav(Path(args.out_dir) / f"sent{i}.wav", r.wav, sr)
        print(json.dumps(records[-1]))

    rtfs = [r["rtf"] for r in records]
    summary = {"mean_rtf": float(np.mean(rtfs)),
               "min_rtf": float(np.min(rtfs)),
               "max_rtf": float(np.max(rtfs)),
               "nfe": args.nfe}

    if args.whisper:
        try:
            wer = evaluate_wer(SENTENCES, wavs, sr,
                               load_whisper_asr(args.whisper))
            summary["mean_wer"] = wer["mean_wer"]
        except Exception as e:  # pragma: no cover
            summary["wer_error"] = str(e)[:200]
    elif args.ctc_asr:
        from matcha_tts_tpu.eval.ctc_asr import load_ctc_asr, \
            wav_asr_callable

        jp, jcfg = load_ctc_asr(args.ctc_asr)
        max_frames = max(len(w) for w in wavs) // cfg.audio.hop_length + 2
        bucket = ((max_frames + 63) // 64) * 64
        wer = evaluate_wer(SENTENCES, wavs, sr,
                           wav_asr_callable(jp, jcfg, cfg.audio, bucket))
        summary["mean_wer"] = wer["mean_wer"]

    print(json.dumps(summary))
    return summary


if __name__ == "__main__":
    main()
