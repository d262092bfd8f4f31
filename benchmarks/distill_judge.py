"""Few-step distillation through the intelligibility judge (VERDICT r4 #2).

`benchmarks/distill_e2e.py` proves the distillation MACHINERY (endpoint
MSE vs teacher trajectories); this benchmark proves the thing that
matters for the NFE=2 serving point: the distilled student's SPEECH is
still intelligible.  It reuses a trained quality-loop artifact set
(`benchmarks/wer_e2e.py --work-dir ...`: `matcha_trained.pkl` teacher +
`ctc_judge.npz` with a proven 0.000 ground-truth floor), distills a
student, and reports held-out WER for teacher@{10,2,1} vs student@{2,1}
through the same surfaces the reference's 0.91 % measures
(/root/reference/MOS_audiou_generator.ipynb cells 12-14; the Euler-loop
NFE shortcut being distilled is model.py:1089-1094):

  * mel surface: text -> {teacher,student} mels -> CTC judge;
  * wav surface (when the work dir holds a GAN-trained `*_gen.pkl`):
    text -> mels -> vocoder (bf16 serving kernels, + denoiser for
    HiFi-GAN) -> wav -> 16 kHz -> judge.

Usage (after a wer_e2e run):
  python benchmarks/distill_judge.py --work-dir /tmp/wer_e2e \
      --distill-steps 2000 [--loss reflow|consistency] \
      [--save-artifacts tests/golden/trained]
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
import numpy as np

jax.config.update("jax_compilation_cache_dir",
                  str(Path(__file__).resolve().parent.parent / ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from matcha_tts_tpu.config import MatchaConfig, config_from_dict
from matcha_tts_tpu.eval.ctc_asr import load_ctc_asr
from matcha_tts_tpu.train.distill import DistillConfig, distill_fit

from benchmarks.tone_corpus import HELD_OUT_TEXTS, TRAIN_TEXTS, n_words
from benchmarks.wer_e2e import make_asr_callable, synth_wer, vocoded_wer

TEXT_BUCKET, FRAME_BUCKET = 128, 512


def load_teacher(work_dir: Path):
    with open(work_dir / "matcha_trained.pkl", "rb") as f:
        blob = pickle.load(f)
    cfg = config_from_dict(MatchaConfig, json.loads(blob["cfg_json"]))
    return blob["params"], cfg


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--work-dir", default="/tmp/wer_e2e",
                    help="a wer_e2e work dir holding matcha_trained.pkl "
                         "and ctc_judge.npz (and optionally *_gen.pkl)")
    ap.add_argument("--distill-steps", type=int, default=2000)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--loss", choices=("reflow", "consistency"),
                    default="reflow")
    ap.add_argument("--nfe-teacher", type=int, default=10)
    ap.add_argument("--temperature", type=float, default=0.667)
    ap.add_argument("--denoise-strength", type=float, default=2.5e-4)
    ap.add_argument("--save-artifacts", default=None,
                    help="directory for student_tone.ckpt + student "
                         "quality stats (regression anchors)")
    args = ap.parse_args(argv)

    work = Path(args.work_dir)
    teacher, cfg = load_teacher(work)
    asr_params, asr_cfg = load_ctc_asr(work / "ctc_judge.npz")
    a = cfg.audio

    results = {"n_heldout_words": n_words(HELD_OUT_TEXTS)}

    def judge_mel(params, nfe, label):
        r = synth_wer(params, cfg, asr_params, asr_cfg, HELD_OUT_TEXTS,
                      TEXT_BUCKET, FRAME_BUCKET, nfe, args.temperature)
        results[f"wer_mel_{label}_nfe{nfe}"] = r["mean_wer"]
        print(f"wer_mel_{label}_nfe{nfe}: {r['mean_wer']:.4f}")
        return r

    print("== teacher baselines (held-out mel-surface WER) ==")
    teacher_runs = {nfe: judge_mel(teacher, nfe, "teacher")
                    for nfe in (args.nfe_teacher, 2, 1)}

    print(f"== distilling ({args.loss}, {args.distill_steps} steps) ==")
    dcfg = DistillConfig(loss=args.loss, nfe_teacher=args.nfe_teacher,
                         nfe_student=2, temperature=args.temperature)
    t0 = time.time()
    dstate = distill_fit(teacher, cfg, dcfg, list(TRAIN_TEXTS),
                         steps=args.distill_steps, batch_size=args.batch,
                         text_bucket=TEXT_BUCKET, frame_bucket=FRAME_BUCKET,
                         log_every=100)
    student = jax.device_get(
        dstate.ema_params if args.loss == "consistency" else dstate.params)
    print(f"distilled in {time.time() - t0:.0f}s")

    student_runs = {nfe: judge_mel(student, nfe, "student")
                    for nfe in (2, 1)}

    # wav surface through every GAN-trained vocoder present in the work dir
    import jax.numpy as jnp

    from matcha_tts_tpu.config import HiFiGANConfig, VocosConfig

    for pkl in sorted(work.glob("*_gen.pkl")):
        with open(pkl, "rb") as f:
            blob = pickle.load(f)
        family = blob["family"]
        vcfg = VocosConfig() if family == "vocos" else HiFiGANConfig()
        dstr = args.denoise_strength if family == "hifigan" else 0.0
        asr_fn = make_asr_callable(asr_params, asr_cfg, a, FRAME_BUCKET)
        for label, run in (("teacher_nfe10", teacher_runs[args.nfe_teacher]),
                           ("student_nfe2", student_runs[2])):
            w = vocoded_wer(run["mel_btc"], run["lens"], HELD_OUT_TEXTS,
                            blob["gen_params"], vcfg, a, asr_fn,
                            denoise_strength=dstr, dtype=jnp.bfloat16)
            key = f"wer_wav_{family}_bf16_{label}"
            results[key] = w["mean_wer"]
            print(f"{key}: {w['mean_wer']:.4f}")

    if args.save_artifacts:
        import torch

        from matcha_tts_tpu.config import config_to_json
        from matcha_tts_tpu.params.convert import export_matcha

        out = Path(args.save_artifacts)
        out.mkdir(parents=True, exist_ok=True)
        sd = export_matcha(student, cfg)
        torch.save({
            "state_dict": {
                f"model.{k}": torch.from_numpy(np.ascontiguousarray(v))
                for k, v in sd.items()},
            "hyper_parameters": json.loads(config_to_json(cfg)),
            "epoch": 0,
            "global_step": args.distill_steps,
        }, out / "student_tone.ckpt")
        np.savez_compressed(
            out / "student_stats.npz",
            loss=np.array(args.loss),
            distill_steps=np.int32(args.distill_steps),
            nfe_teacher=np.int32(args.nfe_teacher),
            temperature=np.float32(args.temperature),
            text_bucket=np.int32(TEXT_BUCKET),
            frame_bucket=np.int32(FRAME_BUCKET),
            wer_mel_student_nfe2=np.float32(
                results["wer_mel_student_nfe2"]),
            wer_mel_student_nfe1=np.float32(
                results["wer_mel_student_nfe1"]),
            wer_mel_teacher_nfe2=np.float32(
                results["wer_mel_teacher_nfe2"]),
            wer_mel_teacher_nfe10=np.float32(
                results[f"wer_mel_teacher_nfe{args.nfe_teacher}"]))
        print(f"artifacts written to {out}")

    print(json.dumps(results))
    return results


if __name__ == "__main__":
    main()
