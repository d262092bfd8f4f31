"""End-to-end few-step distillation: train a real teacher, distill, measure.

Closes the roadmap item "run distillation against a real trained teacher"
(docs/ROADMAP.md) to the extent this environment allows: no LJSpeech or
pretrained checkpoint is available (zero egress), so the teacher is
trained from scratch on a synthetic harmonic-speech corpus — REAL
training (on-device log-mel -> MAS -> dur/prior/CFM losses -> Adam, the
train_standalone.py:623-685 semantics) producing a genuinely converged
flow field + duration model, not random weights.

Pipeline (all on the attached TPU chip):
  1. generate a 32-utterance corpus (harmonic stacks, text-correlated
     durations) in LJSpeech layout;
  2. `fit()` the full-size (18M) model on it;
  3. reflow-distill an NFE-2 student from the trained teacher
     (train/distill.py, text-only driver);
  4. report endpoint MSE vs the teacher's NFE-10 trajectories and masked
     mel L1 on held-out texts for: teacher@{1,2} (naive few-step
     controls) vs student@{1,2} — the number that justifies shipping
     NFE=2 (~5x lower acoustic cost per request).

Usage:
  python benchmarks/distill_e2e.py --teacher-steps 300 --distill-steps 300
"""

from __future__ import annotations

import argparse
import functools
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

from matcha_tts_tpu.config import MatchaConfig, TrainConfig
from matcha_tts_tpu.data.dataset import create_filelists
from matcha_tts_tpu.models.matcha import synthesize
from matcha_tts_tpu.ops.masking import sequence_mask
from matcha_tts_tpu.train.distill import (DistillConfig, distill_eval,
                                          distill_fit)
from matcha_tts_tpu.train.loop import fit
from matcha_tts_tpu.utils.wav import write_wav

CORPUS = [
    "the quick brown fox jumps over the lazy dog",
    "she sells sea shells by the sea shore all day",
    "a stitch in time saves nine they always say",
    "the rain in spain falls mainly on the plain",
    "how much wood would a woodchuck chuck today",
    "peter piper picked a peck of pickled peppers",
    "all that glitters is not gold my friend",
    "the early bird catches the worm every morning",
    "actions speak much louder than words ever could",
    "practice makes perfect in all things we do",
    "every cloud has a silver lining somewhere",
    "a journey of a thousand miles begins here",
    "better late than never but never late is better",
    "birds of a feather flock together in autumn",
    "do not count your chickens before they hatch",
    "an apple a day keeps the doctor away",
    "the pen is mightier than the sword in time",
    "when in rome do as the romans always do",
    "the grass is always greener on the other side",
    "two wrongs do not make a right they say",
    "absence makes the heart grow fonder with time",
    "a picture is worth a thousand words at least",
    "beggars cannot be choosers in this busy world",
    "curiosity killed the cat but satisfaction returned",
    "do not put all your eggs in one basket",
    "fortune favors the bold and the brave alike",
    "honesty is the best policy in every case",
    "if it is not broken then do not fix it",
    "knowledge is power and power brings duty",
    "laughter is truly the best medicine of all",
    "necessity is the mother of all invention",
    "no news is good news for the patient sailor",
]

HELD_OUT = [
    "the lighthouse keeper watched the storm roll in",
    "fresh vegetables make every meal taste better",
    "the orchestra performed a beautiful symphony tonight",
    "children laughed and played in the autumn park",
]

SR = 22050
HOP = 256


def make_corpus(root: Path, seed: int = 0) -> None:
    """Harmonic 'speech': per-utterance f0, slow amplitude envelope,
    mild noise; duration tracks text length so the duration predictor
    has real statistics to learn."""
    root.mkdir(parents=True, exist_ok=True)
    (root / "wavs").mkdir(exist_ok=True)
    rng = np.random.default_rng(seed)
    lines = []
    for i, text in enumerate(CORPUS):
        dur = 0.6 + 0.055 * len(text)  # 2.6-3.5 s -> 225-300 frames
        t = np.arange(int(SR * dur)) / SR
        f0 = 110.0 + 12.0 * (i % 8) + 8.0 * np.sin(2 * np.pi * 1.3 * t)
        phase = 2 * np.pi * np.cumsum(f0) / SR
        wav = np.zeros_like(t, np.float64)
        for h, amp in enumerate((1.0, 0.5, 0.3, 0.2, 0.1), start=1):
            wav += amp * np.sin(h * phase)
        env = 0.5 + 0.5 * np.sin(2 * np.pi * 2.1 * t + i)
        wav = 0.22 * env * wav + 0.01 * rng.standard_normal(len(t))
        write_wav(root / "wavs" / f"utt{i:02d}.wav",
                  wav.astype(np.float32), SR)
        lines.append(f"utt{i:02d}|{text}|{text}")
    (root / "metadata.csv").write_text("\n".join(lines) + "\n")


@functools.partial(jax.jit, static_argnames=("cfg", "dcfg", "t_y_max",
                                             "nfe_student"))
def _endpoint_mse(student_params, teacher_params, key, x, x_lengths, cfg,
                  dcfg, t_y_max, nfe_student):
    return distill_eval(student_params, teacher_params, key, x, x_lengths,
                        cfg, dcfg, t_y_max, nfe_student=nfe_student)


@functools.partial(jax.jit, static_argnames=("cfg", "nfe_a", "nfe_b", "t_y"))
def _mel_l1(params_a, params_b, key, x, x_lengths, cfg, nfe_a, nfe_b, t_y):
    """Masked mel L1 between two samplers from identical noise; the
    encoder/duration path is shared, so frames align exactly."""
    oa = synthesize(params_a, key, x, x_lengths, cfg, n_timesteps=nfe_a,
                    t_y_max=t_y, temperature=0.667)
    ob = synthesize(params_b, key, x, x_lengths, cfg, n_timesteps=nfe_b,
                    t_y_max=t_y, temperature=0.667)
    mask = sequence_mask(oa.y_lengths, t_y).astype(jnp.float32)[:, None, :]
    diff = jnp.abs(oa.mel - ob.mel) * mask
    return jnp.sum(diff) / (jnp.sum(mask) * oa.mel.shape[1])


def _tokens(texts, text_bucket: int):
    from matcha_tts_tpu.text.tokenizer import encode_text

    x = np.zeros((len(texts), text_bucket), np.int32)
    xl = np.ones((len(texts),), np.int32)
    for r, t in enumerate(texts):
        ids = np.asarray(encode_text(t, add_blank=True))[:text_bucket]
        x[r, : len(ids)] = ids
        xl[r] = len(ids)
    return jnp.asarray(x), jnp.asarray(xl)


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--data-root", default="/tmp/distill_corpus")
    ap.add_argument("--work-dir", default="/tmp/distill_e2e")
    ap.add_argument("--teacher-steps", type=int, default=300)
    ap.add_argument("--distill-steps", type=int, default=300)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--nfe-teacher", type=int, default=10)
    ap.add_argument("--preset", choices=("full", "tiny"), default="full",
                    help="tiny = CPU smoke config; full = 18M LJSpeech")
    args = ap.parse_args(argv)

    root = Path(args.data_root)
    make_corpus(root)
    train_fl, val_fl = create_filelists(root, val_fraction=0.1)

    if args.preset == "tiny":
        from matcha_tts_tpu.config import (DecoderConfig,
                                           DurationPredictorConfig,
                                           EncoderConfig)

        cfg = MatchaConfig(
            encoder=EncoderConfig(n_feats=80, n_channels=32,
                                  filter_channels=64, n_heads=2, n_layers=1),
            duration_predictor=DurationPredictorConfig(filter_channels_dp=32),
            decoder=DecoderConfig(channels=(16, 16), attention_head_dim=8,
                                  num_heads=2, n_blocks=1, num_mid_blocks=1),
        )
    else:
        cfg = MatchaConfig()  # full-size 18M LJSpeech config
    tcfg = TrainConfig(batch_size=args.batch, text_buckets=(128,),
                       frame_buckets=(384,), log_every_n_steps=20,
                       ckpt_every_n_steps=10**9)
    t0 = time.time()
    state = fit(cfg, tcfg, train_fl, val_fl,
                work_dir=f"{args.work_dir}/teacher",
                max_steps=args.teacher_steps, resume=False)
    teacher = jax.device_get(state.params)
    print(f"teacher trained: {args.teacher_steps} steps "
          f"in {time.time() - t0:.0f}s")

    dcfg = DistillConfig(loss="reflow", nfe_teacher=args.nfe_teacher,
                         nfe_student=2)
    t0 = time.time()
    dstate = distill_fit(teacher, cfg, dcfg, CORPUS,
                         steps=args.distill_steps, batch_size=args.batch,
                         text_bucket=128, frame_bucket=384, log_every=20)
    student = jax.device_get(dstate.params)
    print(f"distilled: {args.distill_steps} steps in {time.time() - t0:.0f}s")

    x, xl = _tokens(HELD_OUT, 128)
    key = jax.random.PRNGKey(123)
    print(f"\nendpoint MSE vs teacher@{args.nfe_teacher} "
          f"(held-out texts, lower is better):")
    results = {}
    for label, params in (("teacher", teacher), ("student", student)):
        for nfe in (1, 2):
            mse = float(_endpoint_mse(params, teacher, key, x, xl, cfg,
                                      dcfg, 384, nfe))
            results[f"{label}@{nfe}"] = mse
            print(f"  {label}@NFE={nfe}: {mse:.5f}")

    print(f"\nmasked mel L1 vs teacher@{args.nfe_teacher} sampler:")
    mel_results = {}
    for label, params in (("teacher", teacher), ("student", student)):
        for nfe in (1, 2):
            l1 = float(_mel_l1(params, teacher, key, x, xl, cfg, nfe,
                               args.nfe_teacher, 384))
            mel_results[f"{label}@{nfe}"] = l1
            print(f"  {label}@NFE={nfe}: {l1:.5f}")

    # the claim that justifies the NFE=2 student
    assert results["student@2"] < results["teacher@2"], (
        "distilled student should beat the naive few-step teacher")
    print("\nOK: student@2 beats naive teacher@2 on endpoint MSE "
          f"({results['student@2']:.5f} < {results['teacher@2']:.5f})")
    return results, mel_results


if __name__ == "__main__":
    main()
