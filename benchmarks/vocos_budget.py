"""Vocoder GAN quality vs training budget (VERDICT r4 #3).

Round 4 left a split verdict: Vocos holds the serving records (107 req/s
sustained, TTFA 118 ms) but at the only executed budget (2000 GAN steps)
its held-out synthesized WER was 3.8 % vs HiFi-GAN's 1.0 %.  "Needs more
GAN steps" was a hypothesis; this benchmark turns it into a curve.

It reuses a trained quality-loop work dir (`benchmarks/wer_e2e.py`:
`matcha_trained.pkl` teacher + `ctc_judge.npz` zero-floor judge), then
GAN-trains each requested family ONCE up to max(eval_steps), pausing at
every checkpoint to judge the full production chain (text -> teacher mel
-> vocoder [-> denoiser] -> wav -> 16 kHz -> CTC judge) plus the
ground-truth-mel resynthesis chain that isolates vocoder-only damage.
The reference never trains its vendored GAN stack (hifigan/models.py:209+
ships pretrained weights); the recipe here is the same vendored one
(Adam(0.8, 0.99), LS-GAN + FM + 45x mel-L1).

Usage (after a wer_e2e run):
  python benchmarks/vocos_budget.py --work-dir /tmp/wer_e2e \
      --families vocos,hifigan --eval-steps 2000,4000,8000,16000
"""

from __future__ import annotations

import argparse
import json
import pickle
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir",
                  str(Path(__file__).resolve().parent.parent / ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from matcha_tts_tpu.config import HiFiGANConfig, VocosConfig
from matcha_tts_tpu.data.dataset import load_wav, parse_filelist
from matcha_tts_tpu.eval.ctc_asr import load_ctc_asr

from benchmarks.distill_judge import TEXT_BUCKET, FRAME_BUCKET, load_teacher
from benchmarks.tone_corpus import HELD_OUT_TEXTS, n_words
from benchmarks.wer_e2e import (featurize_texts, make_asr_callable,
                                synth_wer, vocoded_wer)


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--work-dir", default="/tmp/wer_e2e")
    ap.add_argument("--data-root", default=None,
                    help="tone-corpus root from the wer_e2e run (default: "
                         "<work-dir>/../wer_corpus fallbacks to rebuilding)")
    ap.add_argument("--families", default="vocos")
    ap.add_argument("--eval-steps", default="2000,4000,8000,16000")
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--segment", type=int, default=8192)
    ap.add_argument("--lr", type=float, default=2e-4)
    ap.add_argument("--gan-grad-clip", type=float, default=10.0)
    ap.add_argument("--denoise-strength", type=float, default=2.5e-4)
    ap.add_argument("--nfe", type=int, default=10)
    ap.add_argument("--temperature", type=float, default=0.667)
    args = ap.parse_args(argv)

    work = Path(args.work_dir)
    teacher, cfg = load_teacher(work)
    asr_params, asr_cfg = load_ctc_asr(work / "ctc_judge.npz")
    a = cfg.audio
    eval_steps = sorted(int(s) for s in args.eval_steps.split(","))

    # training audio: the same corpus the teacher trained on
    from benchmarks.tone_corpus import TRAIN_TEXTS, make_tone_corpus

    root = Path(args.data_root) if args.data_root else (
        work / "vocos_budget_corpus")
    if not (root / "metadata.csv").exists():
        make_tone_corpus(root, TRAIN_TEXTS)
    from matcha_tts_tpu.data.dataset import create_filelists

    train_fl, _ = create_filelists(root, val_fraction=0.1)
    train_wavs = [load_wav(p[0])[0] for p in parse_filelist(train_fl)]

    # judge inputs, computed once: held-out synth mels + ground-truth mels
    print("== synthesizing held-out mels with the trained teacher ==")
    hr = synth_wer(teacher, cfg, asr_params, asr_cfg, HELD_OUT_TEXTS,
                   TEXT_BUCKET, FRAME_BUCKET, args.nfe, args.temperature)
    print(f"teacher mel-surface held-out WER: {hr['mean_wer']:.4f} over "
          f"{n_words(HELD_OUT_TEXTS)} words")
    gt_mel, gt_lens = featurize_texts(HELD_OUT_TEXTS, a, FRAME_BUCKET,
                                      noise_seed=2)
    asr_fn = make_asr_callable(asr_params, asr_cfg, a, FRAME_BUCKET)

    from matcha_tts_tpu.train.vocoder import (create_gan_state, gan_disc_step,
                                              gan_gen_step, random_segment_np)

    clip = args.gan_grad_clip or None
    results = {"teacher_mel_wer": hr["mean_wer"],
               "eval_steps": eval_steps, "curves": {}}
    for family in args.families.split(","):
        family = family.strip()
        if family == "vocos":
            vcfg, discs, dstr = VocosConfig(), ("mpd", "mrd"), 0.0
        else:
            vcfg, discs, dstr = (HiFiGANConfig(), ("mpd", "msd"),
                                 args.denoise_strength)
        print(f"== {family}: GAN training to {eval_steps[-1]} steps, "
              f"judging at {eval_steps} ==")
        state = create_gan_state(jax.random.PRNGKey(0), vcfg,
                                 learning_rate=args.lr,
                                 discriminators=discs, grad_clip=clip)
        rng = np.random.default_rng(0)
        curve = []
        t0 = time.time()
        for step in range(eval_steps[-1]):
            audio = jnp.asarray(np.stack([
                random_segment_np(rng, train_wavs[int(i)], args.segment,
                                  a.hop_length)
                for i in rng.integers(0, len(train_wavs),
                                      size=args.batch)]))
            state, d_loss = gan_disc_step(state, audio, vcfg, a,
                                          lr=args.lr, grad_clip=clip)
            state, metrics = gan_gen_step(state, audio, vcfg, a,
                                          lr=args.lr, grad_clip=clip)
            done = step + 1
            if done % 500 == 0:
                m = float(metrics["mel_l1"])
                print(f"  {family} step {done}: mel_l1 {m:.4f} "
                      f"({time.time() - t0:.0f}s)")
                leaf = jax.tree_util.tree_leaves(state.gen_params)[0]
                if not bool(jnp.isfinite(leaf).all()):
                    raise FloatingPointError(
                        f"{family} diverged by step {done}")
            if done in eval_steps:
                gen = jax.device_get(state.gen_params)
                w_syn = vocoded_wer(hr["mel_btc"], hr["lens"],
                                    HELD_OUT_TEXTS, gen, vcfg, a, asr_fn,
                                    denoise_strength=dstr,
                                    dtype=jnp.bfloat16)
                w_gt = vocoded_wer(gt_mel, gt_lens, HELD_OUT_TEXTS, gen,
                                   vcfg, a, asr_fn, denoise_strength=dstr,
                                   dtype=jnp.bfloat16)
                point = {"steps": done,
                         "wer_heldout_synth": w_syn["mean_wer"],
                         "wer_gtmel_resynth": w_gt["mean_wer"],
                         "mel_l1": float(metrics["mel_l1"]),
                         "wall_s": round(time.time() - t0, 1)}
                curve.append(point)
                print(f"  >> {family}@{done}: synth WER "
                      f"{w_syn['mean_wer']:.4f}, gtmel WER "
                      f"{w_gt['mean_wer']:.4f}")
                with open(work / f"{family}_gen_{done}.pkl", "wb") as f:
                    pickle.dump({"gen_params": gen, "family": family}, f)
        results["curves"][family] = curve

    print(json.dumps(results))
    with open(work / "vocos_budget.json", "w") as f:
        json.dump(results, f, indent=2)
    return results


if __name__ == "__main__":
    main()
