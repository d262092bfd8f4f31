"""The in-repo intelligibility judge: CTC ASR + the WER loop.

Covers the executed-quality-metric surface (the reference's
MOS_audiou_generator.ipynb cells 13-14 evaluate with Whisper + jiwer;
matcha_tts_tpu/eval provides the same loop with an in-repo judge):
  - character codec round trip;
  - the CTC ASR learns a toy task to exact decode;
  - the tone-corpus ground-truth path end to end THROUGH `evaluate_wer`
    (wav -> 16 kHz resample -> log-mel -> CTC decode), generalizing to
    held-out sentences — the plumbing benchmarks/wer_e2e.py runs at
    full size on hardware.
"""

import sys
from pathlib import Path

import jax
import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from matcha_tts_tpu.config import MatchaConfig
from matcha_tts_tpu.eval.ctc_asr import (CTCASRConfig, MEL_PAD_VALUE,
                                         decode_chars, encode_chars,
                                         train_ctc_asr, transcribe_mels)
from matcha_tts_tpu.eval.wer import evaluate_wer

from benchmarks.wer_e2e import (SR, char_tones, featurize_texts,
                                make_asr_callable, pack_labels, render_text)


def test_train_split_covers_vocabulary():
    """Every word-bank word must occur in TRAIN (v3.1): the judge floor
    failures were all on held-out words whose glide contexts were never
    seen at judge-training time ("june" -> "junhe"), and the module
    docstring promises LJSpeech-val-like word coverage."""
    from benchmarks.tone_corpus import vocab_coverage_gaps

    assert vocab_coverage_gaps() == []


def test_ensemble_vote_prefers_majority():
    """The medoid vote must return the hypothesis shared by a majority
    and suppress a single member's seed-dependent artifact."""
    from matcha_tts_tpu.eval.ctc_asr import vote_hypotheses

    hyps = [["the fox", "a dog"],      # member 0 (clean)
            ["the fox", "a ddog"],     # member 1 (artifact on row 1)
            ["the ffox", "a dog"]]     # member 2 (artifact on row 0)
    assert vote_hypotheses(hyps) == ["the fox", "a dog"]


def test_char_codec_round_trip():
    text = "the quick brown fox jumps over the lazy dog"
    assert decode_chars(encode_chars(text)) == text
    # punctuation/digits are dropped, case folded
    assert decode_chars(encode_chars("Hello, World! 123")) == "hello world "


def test_char_tones_unique_and_in_band():
    seen = set()
    for k in range(26):
        pair = char_tones(chr(ord("a") + k))
        assert pair not in seen
        seen.add(pair)
        assert 0 < pair[0] < 8000 and 0 < pair[1] < 8000  # acoustic mel band
    assert char_tones(" ") not in seen and char_tones(" ") is not None
    assert char_tones("!") is None


def test_ctc_asr_learns_toy_task_to_exact_decode():
    cfg = CTCASRConfig(n_mels=8, hidden=32, dilations=(1, 2))
    texts = ["abc", "cab", "bca", "cba", "bac", "acb", "bab", "cbc"]
    seg = 6
    mels, mlens = [], []
    for text in texts:
        m = np.full((32, 8), MEL_PAD_VALUE, np.float32)
        pos = 0
        for ch in text:
            k = ord(ch) - ord("a")
            pat = np.full((seg, 8), -8.0, np.float32)
            pat[:, 2 * k : 2 * k + 2] = -1.0
            m[pos : pos + seg] = pat
            pos += seg + 1
        mels.append(m)
        mlens.append(pos - 1)
    mels = np.stack(mels)
    mlens = np.asarray(mlens, np.int32)
    labels, llens = pack_labels(texts)
    params = train_ctc_asr(jax.random.PRNGKey(0), mels, mlens, labels, llens,
                           cfg, steps=300, lr=3e-3)
    assert transcribe_mels(params, mels, mlens, cfg) == texts

    # persistence round trip: a saved judge transcribes identically
    from matcha_tts_tpu.eval.ctc_asr import load_ctc_asr, save_ctc_asr
    import tempfile

    with tempfile.TemporaryDirectory() as d:
        save_ctc_asr(Path(d) / "judge.npz", params, cfg)
        p2, cfg2 = load_ctc_asr(Path(d) / "judge.npz")
    assert cfg2 == cfg
    assert transcribe_mels(p2, mels, mlens, cfg2) == texts


def test_tone_corpus_wer_loop_generalizes_to_held_out():
    """GT audio -> evaluate_wer (16 kHz resample surface) -> low WER on
    sentences the judge never saw: the full wer_e2e judge path."""
    train_texts = ["call me now", "send the cat", "go home fast",
                   "we are done", "take the red box", "run to me",
                   "see you soon", "make it so"]
    held_out = ["call the cat", "go see the box"]
    a = MatchaConfig().audio
    from benchmarks.tone_corpus import max_frames

    # characters have variable durations now; pick the bucket from the
    # renderer's own bound (wer_e2e does the same at full size)
    # headroom for the 1.1x augmented renderings below
    frame_bucket = max(128, int(max_frames(train_texts + held_out) * 1.12) + 2)
    # stride=1 is the judge configuration wer_e2e ships: stride 2 merges
    # repeated letters ('see'/'soon') across the inter-char gaps
    cfg = CTCASRConfig(n_mels=a.n_mels, hidden=96, dilations=(1, 2),
                       stride=1)
    # rate-scale augmentation: held-out sentences carry their own
    # speaking rates, so the judge must see characters at several rates
    scales = (0.9, 1.0, 1.1)
    gt_mel, gt_lens = featurize_texts(train_texts, a, frame_bucket,
                                      noise_seed=3, rate_scales=scales)
    labels, llens = pack_labels([t for t in train_texts for _ in scales])
    params = train_ctc_asr(jax.random.PRNGKey(1), gt_mel, gt_lens, labels,
                           llens, cfg, steps=700, lr=2e-3)

    rng = np.random.default_rng(4)
    wavs = [render_text(t, rng) for t in held_out]
    out = evaluate_wer(held_out, wavs, SR,
                       make_asr_callable(params, cfg, a, frame_bucket))
    assert out["mean_wer"] <= 0.25, out


def test_tone_corpus_v3_prosody_properties():
    """Corpus v3 (round 5): spectra must be time-varying like speech —
    onset glides from the previous character, row-tone declination across
    the sentence — while every character's steady portion stays decodable
    at its (row, col) chord (the judge-floor precondition)."""
    from benchmarks.tone_corpus import (DECLINATION, char_segments,
                                        char_tones)

    def peak_freq(seg, lo=100.0, hi=9000.0):
        f = np.fft.rfftfreq(len(seg), 1 / SR)
        mag = np.abs(np.fft.rfft(seg * np.hanning(len(seg))))
        band = (f >= lo) & (f <= hi)
        return f[band][int(np.argmax(mag[band]))]

    text = "pack my box with five dozen liquor jugs"
    wav = render_text(text)
    segs = char_segments(text)

    # (a) decodability: each char's steady portion has dominant energy at
    # both chord targets (within the declination/vibrato budget)
    pos = 0
    row_first, row_last = None, None
    for idx, (ch, nt, ng) in enumerate(segs):
        tones = char_tones(ch)
        if tones and len(tones) == 2:
            steady = wav[pos + int(nt * 0.4) : pos + nt]
            for tgt in tones:
                f = np.fft.rfftfreq(len(steady), 1 / SR)
                mag = np.abs(np.fft.rfft(steady * np.hanning(len(steady))))
                sel = (f >= tgt * 0.93) & (f <= tgt * 1.07)
                out = (f < tgt * 0.85) | (f > tgt * 1.15)
                assert mag[sel].max() > 0.5 * mag[out].max(), (ch, tgt)
            # (b) row declination: measure the row tone precisely around
            # its target at sentence start vs end
            rf = peak_freq(steady, tones[0] * 0.9, tones[0] * 1.1)
            ratio = rf / tones[0]
            if row_first is None:
                row_first = ratio
            row_last = ratio
        pos += nt + ng
    assert row_first is not None and row_last is not None
    # declination: early chars render sharp (+), late chars flat (-)
    assert row_first - row_last > DECLINATION * 0.8, (row_first, row_last)

    # (c) coarticulation: the onset of a char following a DIFFERENT chord
    # starts near the previous char's frequencies, not its own
    prev_tones, pos = None, 0
    checked = 0
    for ch, nt, ng in segs:
        tones = char_tones(ch)
        if (tones and len(tones) == 2 and prev_tones is not None
                and len(prev_tones) == 2
                and abs(prev_tones[1] - tones[1]) > 800.0):
            # first ~37 % of the glide: blend <= smoothstep(0.375) ~ 0.32,
            # so frequencies are still near the previous char's
            from benchmarks.tone_corpus import GLIDE_SEC
            onset = wav[pos : pos + int(SR * GLIDE_SEC * 0.375)]
            f_on = peak_freq(onset, 2000.0, 9000.0)  # col-tone region
            # onset col peak is closer to the previous char's col tone
            assert (abs(f_on - prev_tones[1])
                    < abs(f_on - tones[1])), (ch, f_on, prev_tones, tones)
            checked += 1
        if tones:
            prev_tones = tones
        pos += nt + ng
    assert checked >= 2  # the pangram has several large col jumps
