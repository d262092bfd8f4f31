"""Distilled-student quality regression — files to intelligible speech
at NFE=2 (VERDICT r4 #2).

`tests/golden/trained/` additionally holds artifacts from ONE real TPU
run of `benchmarks/distill_judge.py --save-artifacts ...`:

  student_tone.ckpt — the NFE-2 distilled student (reflow, trained
                      against the committed teacher's trajectories),
                      saved Lightning-style like matcha_tone.ckpt.
  student_stats.npz — the creation run's judged WER numbers.

The tests prove from files alone that the few-step serving point keeps
intelligibility: student ckpt -> converter -> synthesize at NFE=2 ->
committed CTC judge -> text, on held-out sentences.  (The Euler-loop
shortcut being distilled: /root/reference/model.py:1089-1094.)
"""

from __future__ import annotations

from pathlib import Path

import numpy as np
import pytest

ART = Path(__file__).parent / "golden" / "trained"

pytestmark = pytest.mark.skipif(
    not (ART / "student_tone.ckpt").exists(),
    reason="distilled artifacts not generated "
           "(benchmarks/distill_judge.py --save-artifacts)")


@pytest.fixture(scope="module")
def loaded():
    from matcha_tts_tpu.eval.ctc_asr import load_ctc_asr
    from matcha_tts_tpu.inference.cli import load_models

    params, cfg, _, _ = load_models(
        checkpoint=str(ART / "student_tone.ckpt"))
    asr_params, asr_cfg = load_ctc_asr(ART / "ctc_judge.npz")
    stats = dict(np.load(ART / "student_stats.npz"))
    return params, cfg, asr_params, asr_cfg, stats


def test_creation_run_student_stats(loaded):
    """The recorded evidence must show the distilled student holding
    intelligibility at NFE=2 (within judge resolution of the teacher's
    many-step WER)."""
    *_, stats = loaded
    s2 = float(stats["wer_mel_student_nfe2"])
    t10 = float(stats["wer_mel_teacher_nfe10"])
    assert s2 <= t10 + 0.05, (s2, t10)


def test_student_nfe2_intelligible_from_files(loaded):
    """Synthesize held-out sentences with the student at NFE=2 and judge
    with the committed CTC ASR; bound against the creation run."""
    import jax
    import jax.numpy as jnp

    from benchmarks.tone_corpus import HELD_OUT_TEXTS
    from matcha_tts_tpu.eval.ctc_asr import MEL_PAD_VALUE, transcribe_mels
    from matcha_tts_tpu.eval.wer import normalize_for_wer, word_error_rate
    from matcha_tts_tpu.models.matcha import synthesize
    from matcha_tts_tpu.text.tokenizer import encode_text

    params, cfg, asr_params, asr_cfg, stats = loaded
    text_bucket = int(stats["text_bucket"])
    frame_bucket = int(stats["frame_bucket"])
    texts = HELD_OUT_TEXTS[:12]
    x = np.zeros((len(texts), text_bucket), np.int32)
    xl = np.ones((len(texts),), np.int32)
    for r, t in enumerate(texts):
        ids = np.asarray(encode_text(t, add_blank=True))[:text_bucket]
        x[r, : len(ids)] = ids
        xl[r] = len(ids)
    out = synthesize(params, jax.random.PRNGKey(7), jnp.asarray(x),
                     jnp.asarray(xl), cfg, n_timesteps=2,
                     t_y_max=frame_bucket,
                     temperature=float(stats["temperature"]))
    mel = np.asarray(out.mel, np.float32).transpose(0, 2, 1).copy()
    lens = np.asarray(out.y_lengths, np.int32)
    for i, l in enumerate(lens):
        mel[i, l:] = MEL_PAD_VALUE
    hyps = transcribe_mels(asr_params, mel, lens, asr_cfg)
    wers = [word_error_rate(normalize_for_wer(t), normalize_for_wer(h))
            for t, h in zip(texts, hyps)]
    mean_wer = float(np.mean(wers))
    recorded = float(stats["wer_mel_student_nfe2"])
    # 12-sentence subset + cross-backend drift headroom
    assert mean_wer <= recorded + 0.15, (mean_wer, recorded, hyps)
