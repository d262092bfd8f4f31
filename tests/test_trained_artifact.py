"""Trained-checkpoint quality regression — files to intelligible speech.

`tests/golden/trained/` holds artifacts produced by ONE real TPU training
run of `benchmarks/wer_e2e.py --preset small --save-artifacts ...`:

  matcha_tone.ckpt  — Matcha trained on the character-coded tone corpus,
                      saved as a Lightning-style torch .ckpt (`model.`
                      prefixes + full nested hyper_parameters), so loading
                      it exercises the reference's inference-loader surface
                      (/root/reference/main.py:94-129) with REAL trained
                      weights rather than the synthetic random trees the
                      other converter tests use.
  ctc_judge.npz     — the in-repo CTC ASR judge, trained only on
                      ground-truth mels of the TRAIN split.
  goldens.npz       — held-out-text synth mels from the creation run
                      (fixed seed), plus the WER it measured.

The tests prove, inside the suite and from files alone, the reference's
quality claim executed end to end: checkpoint file -> converter ->
synthesize -> ASR -> text, on sentences the acoustic model never saw.
"""

from __future__ import annotations

from pathlib import Path

import numpy as np
import pytest

ART = Path(__file__).parent / "golden" / "trained"

pytestmark = pytest.mark.skipif(
    not (ART / "matcha_tone.ckpt").exists(),
    reason="trained artifacts not generated (benchmarks/wer_e2e.py "
           "--save-artifacts)")

def _buckets(goldens):
    """Creation-run buckets: stored in goldens.npz since the round-4
    variable-duration corpus (earlier artifacts used 128/384)."""
    return (int(goldens.get("text_bucket", 128)),
            int(goldens.get("frame_bucket", 384)))


@pytest.fixture(scope="module")
def loaded():
    """Checkpoint + judge + goldens, loaded through the public surfaces."""
    from matcha_tts_tpu.eval.ctc_asr import load_ctc_asr
    from matcha_tts_tpu.inference.cli import load_models

    matcha_params, cfg, _, _ = load_models(
        checkpoint=str(ART / "matcha_tone.ckpt"))
    asr_params, asr_cfg = load_ctc_asr(ART / "ctc_judge.npz")
    goldens = dict(np.load(ART / "goldens.npz"))
    return matcha_params, cfg, asr_params, asr_cfg, goldens


def _synth_heldout(matcha_params, cfg, goldens):
    import jax
    import jax.numpy as jnp

    from matcha_tts_tpu.models.matcha import synthesize
    from matcha_tts_tpu.text.tokenizer import encode_text

    text_bucket, frame_bucket = _buckets(goldens)
    texts = [str(t) for t in goldens["texts"]]
    x = np.zeros((len(texts), text_bucket), np.int32)
    xl = np.ones((len(texts),), np.int32)
    for r, t in enumerate(texts):
        ids = np.asarray(encode_text(t, add_blank=True))[:text_bucket]
        x[r, : len(ids)] = ids
        xl[r] = len(ids)
    out = synthesize(matcha_params, jax.random.PRNGKey(7), jnp.asarray(x),
                     jnp.asarray(xl), cfg, n_timesteps=int(goldens["nfe"]),
                     t_y_max=frame_bucket,
                     temperature=float(goldens["temperature"]))
    return texts, np.asarray(out.mel, np.float32), np.asarray(
        out.y_lengths, np.int32)


def test_config_reconstructed_from_hyper_parameters(loaded):
    """The small-preset config must come from the ckpt file itself —
    load_models was given no cfg."""
    from matcha_tts_tpu.config import MatchaConfig

    _, cfg, _, _, _ = loaded
    assert cfg != MatchaConfig()  # not the default 18M preset
    assert cfg.encoder.n_feats == 80


def test_trained_synth_matches_golden_mels(loaded):
    """Same ckpt + same seed must reproduce the creation run's held-out
    mels within cross-platform numeric drift (goldens were made on TPU,
    the suite runs on CPU)."""
    matcha_params, cfg, _, _, goldens = loaded
    _, mel, y_lengths = _synth_heldout(matcha_params, cfg, goldens)

    g_mel = goldens["mel"]
    g_len = goldens["y_lengths"]
    # durations are ceil(exp(logw)): a prediction sitting on an integer
    # edge can round differently across backends (goldens made on TPU,
    # suite on CPU) — tolerate one frame per sentence, compare overlap
    assert np.abs(y_lengths.astype(int) - g_len.astype(int)).max() <= 1, (
        y_lengths, g_len)
    assert mel.shape == g_mel.shape
    diffs = []
    for i, l in enumerate(np.minimum(y_lengths, g_len)):
        d = np.abs(mel[i, :, :l] - g_mel[i, :, :l])
        diffs.append(float(d.mean()))
    # mel values span ~[-11, 2] log-mel units; ODE integration over NFE
    # steps amplifies backend conv/matmul rounding differences, so this is
    # a drift bound, not bit equality (bit equality per backend is covered
    # by test_regression.py).
    assert max(diffs) < 0.35, diffs


def test_creation_run_quality_stats(loaded):
    """The creation run's recorded evidence must meet the quality bar:
    judge floor exactly 0 on ground-truth held-out audio (so synthesized
    errors are model damage, not judge damage) and duration modeling
    that tracks the corpus's variable per-character durations.

    Sentence-total correlation is bounded by the crc32 speaking rate a
    char-level predictor cannot see (ceiling 0.74 on this split;
    measured 0.64).  Token-level attribution is additionally laundered
    by MAS blank-wobble, so the per-character check runs on the AUDIO
    surface below (test_audible_durations_track_intrinsic_table)."""
    *_, goldens = loaded
    if "wer_groundtruth_heldout" not in goldens:
        pytest.skip("artifacts predate the variable-duration corpus")
    assert float(goldens["wer_groundtruth_heldout"]) == 0.0
    assert float(goldens["duration_corr_sentence"]) > 0.5


def test_audible_durations_track_intrinsic_table(loaded):
    """Segment the golden synthesized mels into tone runs: ≥3/4 of the
    sentences must produce exactly one audible tone per character, and
    the audible run lengths must correlate with the corpus's intrinsic
    per-character duration table (the model can't see rate/jitter, so
    intrinsic is its learnable target; measured r=0.906 at creation)."""
    *_, goldens = loaded
    if "wer_groundtruth_heldout" not in goldens:
        pytest.skip("artifacts predate the variable-duration corpus")
    from benchmarks.tone_corpus import audible_duration_stats

    texts = [str(t) for t in goldens["texts"]]
    stats = audible_duration_stats(goldens["mel"], goldens["y_lengths"],
                                   texts)
    assert stats["match_rate"] >= 0.75, stats
    assert stats["r_intrinsic"] > 0.8, stats


def test_trained_model_is_intelligible_on_heldout_texts(loaded):
    """The executed quality metric: synthesize texts the model never saw,
    transcribe with the committed judge, and bound the WER against the
    creation run's measurement."""
    from matcha_tts_tpu.eval.ctc_asr import MEL_PAD_VALUE, transcribe_mels
    from matcha_tts_tpu.eval.wer import normalize_for_wer, word_error_rate

    matcha_params, cfg, asr_params, asr_cfg, goldens = loaded
    texts, mel, y_lengths = _synth_heldout(matcha_params, cfg, goldens)

    mel_tc = mel.transpose(0, 2, 1).copy()
    for i, l in enumerate(y_lengths):
        mel_tc[i, l:] = MEL_PAD_VALUE
    hyps = transcribe_mels(asr_params, mel_tc, y_lengths, asr_cfg)
    wers = [word_error_rate(normalize_for_wer(t), normalize_for_wer(h))
            for t, h in zip(texts, hyps)]
    mean_wer = float(np.mean(wers))
    recorded = float(goldens["wer_synth_heldout"])
    assert mean_wer <= recorded + 0.15, (mean_wer, recorded, hyps)
