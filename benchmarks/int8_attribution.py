"""Attribute the int8 vocoder WER gap per quantized level (VERDICT r4 #5).

Round 4's high-resolution judge resolved the opt-in int8 serving mode at
2.3 % held-out WER vs bf16's 1.0 % — real intelligibility damage that the
35 dB SNR bound in tests/test_mrf_int8.py evidently does not bound.  This
benchmark decomposes the gap level-by-level using the
`HiFiGANConfig.int8_levels` gate: at the v1 config + bf16 inputs, int8
quantizes upsample level 1 (C=128 plain packed chain) and level 2 (C=64
fused-up chain); level 3 keeps the exact bf16 kernel by prior
measurement and level 0 (C=256) is XLA in every mode.

Chains judged (same surfaces as the quality loop; reference methodology
MOS_audiou_generator.ipynb cells 12-14): text -> teacher mel -> HiFi-GAN
(mode) -> denoiser -> wav -> 16 kHz -> CTC judge, plus ground-truth-mel
resynthesis.  Modes: exact packed bf16 baseline, int8@{()}, int8@{1},
int8@{2}, int8 full.

Usage (after a wer_e2e run with --vocoder-steps > 0):
  python benchmarks/int8_attribution.py --work-dir /tmp/wer_e2e
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import pickle
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir",
                  str(Path(__file__).resolve().parent.parent / ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from matcha_tts_tpu.config import HiFiGANConfig
from matcha_tts_tpu.eval.ctc_asr import load_ctc_asr

from benchmarks.distill_judge import TEXT_BUCKET, FRAME_BUCKET, load_teacher
from benchmarks.tone_corpus import HELD_OUT_TEXTS, n_words
from benchmarks.wer_e2e import (featurize_texts, make_asr_callable,
                                synth_wer, vocoded_wer)


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--work-dir", default="/tmp/wer_e2e")
    ap.add_argument("--gen-pkl", default=None,
                    help="trained HiFi-GAN generator pickle (default: "
                         "<work-dir>/hifigan_gen.pkl)")
    ap.add_argument("--nfe", type=int, default=10)
    ap.add_argument("--temperature", type=float, default=0.667)
    ap.add_argument("--denoise-strength", type=float, default=2.5e-4)
    args = ap.parse_args(argv)

    work = Path(args.work_dir)
    teacher, cfg = load_teacher(work)
    asr_params, asr_cfg = load_ctc_asr(work / "ctc_judge.npz")
    a = cfg.audio
    with open(args.gen_pkl or work / "hifigan_gen.pkl", "rb") as f:
        gen = pickle.load(f)["gen_params"]

    print("== synthesizing held-out mels with the trained teacher ==")
    hr = synth_wer(teacher, cfg, asr_params, asr_cfg, HELD_OUT_TEXTS,
                   TEXT_BUCKET, FRAME_BUCKET, args.nfe, args.temperature)
    print(f"teacher mel-surface held-out WER: {hr['mean_wer']:.4f} over "
          f"{n_words(HELD_OUT_TEXTS)} words")
    gt_mel, gt_lens = featurize_texts(HELD_OUT_TEXTS, a, FRAME_BUCKET,
                                      noise_seed=2)
    asr_fn = make_asr_callable(asr_params, asr_cfg, a, FRAME_BUCKET)

    base = HiFiGANConfig()
    modes = [
        ("packed_bf16", dataclasses.replace(base, mrf_kernel="packed")),
        ("int8_none", dataclasses.replace(base, mrf_kernel="int8",
                                          int8_levels=())),
        ("int8_level1", dataclasses.replace(base, mrf_kernel="int8",
                                            int8_levels=(1,))),
        ("int8_level2", dataclasses.replace(base, mrf_kernel="int8",
                                            int8_levels=(2,))),
        ("int8_full", dataclasses.replace(base, mrf_kernel="int8")),
    ]
    results = {"teacher_mel_wer": hr["mean_wer"],
               "n_heldout_words": n_words(HELD_OUT_TEXTS)}
    for name, vcfg in modes:
        w_syn = vocoded_wer(hr["mel_btc"], hr["lens"], HELD_OUT_TEXTS, gen,
                            vcfg, a, asr_fn,
                            denoise_strength=args.denoise_strength,
                            dtype=jnp.bfloat16)
        w_gt = vocoded_wer(gt_mel, gt_lens, HELD_OUT_TEXTS, gen, vcfg, a,
                           asr_fn, denoise_strength=args.denoise_strength,
                           dtype=jnp.bfloat16)
        results[f"wer_synth_{name}"] = w_syn["mean_wer"]
        results[f"wer_gtmel_{name}"] = w_gt["mean_wer"]
        print(f"{name}: synth {w_syn['mean_wer']:.4f}  "
              f"gtmel {w_gt['mean_wer']:.4f}")
        if name != "packed_bf16":
            for t, h in zip(HELD_OUT_TEXTS, w_syn["hypotheses"]):
                pass  # hypotheses kept in results consumers via JSON below

    print(json.dumps(results))
    with open(work / "int8_attribution.json", "w") as f:
        json.dump(results, f, indent=2)
    return results


if __name__ == "__main__":
    main()
