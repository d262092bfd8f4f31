"""Character-coded tone corpus with VARIABLE per-character durations.

The quality loop (benchmarks/wer_e2e.py) needs a corpus whose audio
provably encodes its text (zero egress: no LJSpeech, no Whisper).  Round
3's corpus gave every character a fixed 60 ms chord + 30 ms gap, so the
duration predictor's target was a constant and MAS paths were
near-uniform — the reference's central training difficulty (variable
phone durations, /root/reference/train_standalone.py:390-430) was
untouched, and 4 held-out sentences quantized WER at 1/24.

This module fixes both statistical power and duration realism:

* 64 train / 40 held-out sentences (~270 held-out words -> WER
  resolution ~0.4 %, vs the reference's 10-sentence / 0.91 % loop);
* every character has a deterministic INTRINSIC duration (45-95 ms,
  spread by a fixed per-letter table), scaled by a per-sentence
  speaking RATE (0.85-1.10, crc32 of the text) and a per-position
  JITTER (0.9-1.1, seeded per sentence) — so MAS must find genuinely
  nonuniform monotonic paths and the duration predictor must learn
  per-character statistics (its predictions are checked against the
  intrinsic table by `benchmarks/wer_e2e.py`'s correlation report);
* inter-character gaps are 40 ms (rate-scaled): >= 2.9 mel frames of
  true silence between repeated letters, which together with the
  stride-1 CTC judge drives the judge's ground-truth floor to 0.000
  (round 3's 30 ms gaps + stride-2 stem merged "keeper" -> "keper").

Everything is deterministic from the text alone — no global state, so
train-time rendering, judge-time rendering, and truth extraction for
the duration-correlation report always agree.

v3 (round 5) additionally makes the spectra TIME-VARYING the way real
speech is — sentence-level F0 declination, coarticulatory onset glides
from the previous character's tones, and col-tone vibrato (see the
"prosody / coarticulation" constants below) — so the encoder/attention/
MAS stack cannot reduce a character to a stationary template; chord
identity (and hence decodability, and the judge's 0.000 floor) is
preserved by keeping every modulation well inside the chord grid's
frequency separation.
"""

from __future__ import annotations

import zlib
from pathlib import Path
from typing import List, Tuple

import numpy as np

SR = 22050
HOP = 256

# -- acoustics ---------------------------------------------------------------
# a-z -> (row, col) dual-tone chord; space -> a lone low tone (a silent
# space would be confusable with inter-character gaps).  Frequencies sit
# inside the 0-8 kHz acoustic mel band and below the 16 kHz-surface
# Nyquist.  Col tones spaced GEOMETRICALLY (x1.25): the mel filterbank is
# log-spaced above ~1 kHz and linear 400 Hz spacing left adjacent cols
# 2.5-3.6 mel bins apart — below the trained generator's spectral
# resolution (measured 2026-08-20: 'lazy' -> 'hasy' substitutions).
ROW_HZ = (400.0, 800.0, 1200.0, 1600.0, 2000.0)
COL_HZ = (2400.0, 3000.0, 3750.0, 4700.0, 5900.0, 7300.0)
SPACE_HZ = 250.0

# -- duration model ----------------------------------------------------------
# intrinsic per-character durations: 45-95 ms spread over the alphabet by
# a fixed decorrelating table (k*7 mod 26 walks the range so alphabet
# neighbors get distant durations)
DUR_MIN_MS, DUR_SPAN_MS = 45.0, 50.0
SPACE_MS = 60.0
GAP_MS = 40.0      # inter-character silence (rate-scaled)
RAMP_SEC = 0.005   # attack/release to avoid clicks
RATE_MIN, RATE_SPAN = 0.85, 0.25
JITTER_MIN, JITTER_SPAN = 0.90, 0.20

# -- prosody / coarticulation (corpus v3, round 5) ---------------------------
# Round 4's corpus had variable durations but STATIONARY per-character
# spectra — the encoder's job was close to a lookup table (VERDICT r4
# weak #6).  v3 makes every character's spectrum time-varying the way
# variable speech is, while keeping chord identity (and hence text
# decodability) intact:
#   * sentence-level F0 declination: the row tone is scaled by a contour
#     that falls ~+3 % -> -3 % across the sentence with a per-sentence
#     phrase wiggle (deterministic from the text) — like pitch
#     declination over an utterance;
#   * coarticulatory glides: each character's tones START at the previous
#     character's frequencies and glide to their own targets over the
#     first ~18 ms (smoothstep), like formant transitions — adjacent
#     context now changes a character's onset spectrum.  Two guards keep
#     the sweep from decoding as a spurious character (v3.1: the first
#     v3 run measured a 0.95 % ground-truth judge floor from exactly
#     this — "june" -> "junhe", where (800, 4700) is the n->e glide's
#     midpoint chord): (1) pauses break coarticulation — a space is
#     rendered at its own tone and resets the glide source, as real
#     coarticulation does not cross a silent pause (a post-space glide
#     swept the row tone from 250 Hz through EVERY row band); (2) the
#     amplitude attack envelope follows the glide (smoothstep from 0),
#     so mid-sweep frames — the ones whose instantaneous chord is some
#     OTHER character's — are also the quietest, like the reduced
#     energy of real consonant transitions;
#   * vibrato: ~5.5 Hz, +-0.4 % on the col tone, so even the steady
#     portion is not a fixed DFT line.
# Magnitudes are chosen well inside the chord grid's separability: rows
# are >= 25 % apart and cols x1.25 apart, vs <= +-3.5 % of modulation.
DECLINATION = 0.03      # +3 % start -> -3 % end on the row tone
PHRASE_WIGGLE = 0.012   # extra slow sinusoidal phrase curve on the row
GLIDE_SEC = 0.018       # onset glide from the previous char's tones
# Shortening the glide does NOT help the judge floor (measured: 8 ms
# was WORSE than 18 ms, 1.5 % vs 0.7 %): a faster chirp has wider
# instantaneous bandwidth inside the 46 ms (n_fft 1024) analysis
# window, smearing onset energy across foreign chord bands.  The floor
# is recovered on the judge side instead — jitter-seed augmentation
# (see wer_e2e.JUDGE_AUG) diversifies the transition contexts so the
# CTC judge learns glide spectra are not characters.
VIBRATO_HZ, VIBRATO_DEPTH = 5.5, 0.002  # col-tone vibrato
# depth 0.2 % (v3.1, was 0.4 %): the judge-floor ablation localized the
# 0.7 % ground-truth floor to the GLIDE x VIBRATO interaction — with
# either feature alone the floor is 0.0000, together at 0.4 % the
# vibrato smear widens the judge's col-tone acceptance enough that
# glide sweeps fire spurious emissions ("june" -> "junhe").  0.2 %
# keeps the steady portion time-varying and restores the 0.0000 floor.


def char_tones(ch: str):
    """'a'..'z' -> (f_row, f_col); space -> (SPACE_HZ,); else None."""
    if "a" <= ch <= "z":
        k = ord(ch) - ord("a")
        return ROW_HZ[k // len(COL_HZ)], COL_HZ[k % len(COL_HZ)]
    if ch == " ":
        return (SPACE_HZ,)
    return None


def char_duration_ms(ch: str) -> float:
    """Intrinsic (rate-1, jitter-1) duration of a character's chord."""
    if ch == " ":
        return SPACE_MS
    k = ord(ch) - ord("a")
    return DUR_MIN_MS + DUR_SPAN_MS * ((k * 7) % 26) / 25.0


def sentence_rate(text: str) -> float:
    """Deterministic per-sentence speaking rate in [0.85, 1.10]."""
    h = zlib.crc32(text.encode("utf-8"))
    return RATE_MIN + RATE_SPAN * ((h >> 8) % 4096) / 4095.0


def _jitters(text: str, jitter_seed: int = 0) -> np.ndarray:
    """Per-position duration jitter in [0.9, 1.1], seeded by the text.

    `jitter_seed` != 0 re-draws the per-position pattern — ONLY for
    judge-training augmentation; the corpus itself always uses 0 so
    rendering stays deterministic from the text alone."""
    rng = np.random.default_rng(
        zlib.crc32(text.encode("utf-8")) + jitter_seed)
    return JITTER_MIN + JITTER_SPAN * rng.random(len(text))


def char_segments(text: str, rate_scale: float = 1.0,
                  jitter_seed: int = 0) -> List[Tuple[str, int, int]]:
    """Per character: (ch, n_tone_samples, n_gap_samples) — the exact
    segment lengths `render_text` uses, exposed so truth extraction for
    duration evaluation can never drift from the renderer.

    `rate_scale` multiplies the sentence rate and `jitter_seed` re-draws
    the per-position jitter — BOTH only for judge-training augmentation
    (the ASR must recognize characters at rates/contexts it never saw);
    the corpus the acoustic model trains on always uses (1.0, 0) so
    rendering stays deterministic from the text alone."""
    text = text.lower()
    rate = sentence_rate(text) * rate_scale
    jit = _jitters(text, jitter_seed)
    n_gap = int(SR * (GAP_MS / 1000.0) * rate)
    out = []
    for i, ch in enumerate(text):
        n_tone = int(SR * (char_duration_ms(ch) / 1000.0) * rate * jit[i])
        out.append((ch, n_tone, n_gap))
    return out


def char_frames(text: str) -> np.ndarray:
    """True mel frames per character (tone + its trailing gap) — the
    duration-predictor truth, in the same units as the model's per-token
    durations (frames at hop 256)."""
    segs = char_segments(text)
    frames = [(nt + ng) / HOP for _, nt, ng in segs]
    frames[-1] -= segs[-1][2] / HOP  # no trailing gap after the last char
    return np.asarray(frames, np.float64)


def _row_contour(text: str, pos_frac: np.ndarray) -> np.ndarray:
    """Sentence-level F0 declination on the row tone: +DECLINATION at the
    sentence start falling to -DECLINATION at the end, plus a slow
    per-sentence phrase wiggle.  `pos_frac` is the 0..1 position of each
    sample within the sentence; everything is deterministic from the
    text (phase seeded by crc32)."""
    h = zlib.crc32(text.encode("utf-8"))
    phase = 2 * np.pi * ((h >> 4) % 997) / 997.0
    cycles = 1.0 + ((h >> 14) % 3) * 0.5  # 1, 1.5 or 2 phrase cycles
    return (1.0 + DECLINATION * (1.0 - 2.0 * pos_frac)
            + PHRASE_WIGGLE * np.sin(2 * np.pi * cycles * pos_frac + phase))


def render_text(text: str, noise_rng=None, rate_scale: float = 1.0,
                jitter_seed: int = 0) -> np.ndarray:
    """Text -> float32 waveform in which each character is audible, with
    per-character variable durations AND time-varying spectra (v3: F0
    declination + coarticulatory onset glides + vibrato; see module
    docstring).  Frequency trajectories are integrated into phase
    (2*pi*cumsum(f)/SR) so glides are true chirps, not phase jumps."""
    n_ramp = int(SR * RAMP_SEC)
    segs = char_segments(text.lower(), rate_scale, jitter_seed)
    total = sum(nt + ng for _, nt, ng in segs) - segs[-1][2]
    pieces = []
    pos = 0          # running sample position (for the sentence contour)
    prev_tones = None
    for ch, n_tone, n_gap in segs:
        tones = char_tones(ch)
        if tones is None:
            pieces.append(np.zeros(n_tone, np.float64))
            prev_tones = None
        else:
            t = np.arange(n_tone) / SR
            pos_frac = (pos + np.arange(n_tone)) / max(total - 1, 1)
            env = np.ones(n_tone, np.float64)
            env[:n_ramp] = np.linspace(0.0, 1.0, n_ramp)
            env[-n_ramp:] = np.linspace(1.0, 0.0, n_ramp)
            # onset glide source: previous LETTER's tones (index-matched).
            # Glides only occur letter->letter: a pause (space) resets the
            # source, and the space's own lone tone never glides — real
            # coarticulation does not cross a silent pause, and a glide
            # from/to the 250 Hz space tone would sweep through every row
            # band (v3.1; see module docstring).
            glide_src = prev_tones if len(tones) == 2 else None
            n_glide = min(int(SR * GLIDE_SEC), max(n_tone // 3, 1))
            blend = np.ones(n_tone, np.float64)
            blend[:n_glide] = np.linspace(0.0, 1.0, n_glide)
            blend[:n_glide] = blend[:n_glide] ** 2 * (
                3.0 - 2.0 * blend[:n_glide])  # smoothstep
            chord = np.zeros(n_tone, np.float64)
            for j, f in enumerate(tones):
                f_target = np.full(n_tone, f, np.float64)
                if j == 0:
                    f_target *= _row_contour(text, pos_frac)
                else:
                    f_target *= 1.0 + VIBRATO_DEPTH * np.sin(
                        2 * np.pi * VIBRATO_HZ * t)
                f_src = (glide_src[j] if glide_src is not None
                         and j < len(glide_src) else None)
                if f_src is not None:
                    f_traj = f_src + (f_target - f_src) * blend
                else:
                    f_traj = f_target
                phase = 2 * np.pi * np.cumsum(f_traj) / SR
                chord += np.sin(phase)
            if glide_src is not None:
                # the attack follows the glide: mid-sweep samples (whose
                # instantaneous chord may match a DIFFERENT character)
                # are the quietest — transition energy dip (v3.1)
                env[:n_glide] = np.minimum(env[:n_glide], blend[:n_glide])
            pieces.append(env * 0.18 * chord)
            prev_tones = tones if len(tones) == 2 else None
        pieces.append(np.zeros(n_gap, np.float64))
        pos += n_tone + n_gap
    wav = np.concatenate(pieces[:-1])  # no trailing gap
    if noise_rng is not None:
        wav = wav + 0.002 * noise_rng.standard_normal(len(wav))
    return wav.astype(np.float32)


# -- text material -----------------------------------------------------------
# Sentences are composed deterministically from a word bank via fixed
# templates.  Rules: lowercase a-z + space only, <= 44 characters (so the
# longest rendered sentence fits the 640-frame bucket at the slowest
# rate), every letter of the alphabet present in the train split, and
# the held-out split disjoint from the train split as SENTENCES (chars
# and most words are seen in training — like LJSpeech val).

_ADJ = ["quick", "brown", "lazy", "bright", "fresh", "early", "silver",
        "busy", "calm", "bold", "quiet", "warm", "wise", "young", "proud",
        "gentle", "happy", "vivid", "plain", "sharp"]
_NOUN = ["fox", "dog", "bird", "storm", "river", "keeper", "garden",
         "doctor", "wizard", "basket", "cloud", "meadow", "puzzle",
         "jacket", "valley", "summer", "window", "harbor", "melody",
         "voyage", "zephyr", "quartz", "sphinx", "lamp", "piano", "maple"]
_VERB = ["jumps over", "watches", "follows", "carries", "builds",
         "paints", "guards", "crosses", "finds", "mixes", "sings to",
         "visits", "repairs", "explores", "observes", "welcomes"]
_TAIL = ["at dawn", "all day", "in june", "with joy", "by the bay",
         "at night", "in spring", "with care", "by the sea", "in town"]

_TEMPLATES = [
    "the {adj} {noun} {verb} the {noun2}",
    "a {adj} {noun} {verb} the {noun2} {tail}",
    "the {noun} {verb} a {adj} {noun2}",
    "every {adj} {noun} {verb} the {noun2}",
    "the {adj} {noun} {verb} us {tail}",
]


def _compose(rng: np.random.Generator) -> str:
    tpl = _TEMPLATES[int(rng.integers(len(_TEMPLATES)))]
    for _ in range(64):
        s = tpl.format(
            adj=_ADJ[int(rng.integers(len(_ADJ)))],
            noun=_NOUN[int(rng.integers(len(_NOUN)))],
            noun2=_NOUN[int(rng.integers(len(_NOUN)))],
            verb=_VERB[int(rng.integers(len(_VERB)))],
            tail=_TAIL[int(rng.integers(len(_TAIL)))],
        )
        if len(s) <= 44:
            return s
        tpl = _TEMPLATES[int(rng.integers(len(_TEMPLATES)))]
    raise RuntimeError("could not compose a <=44-char sentence")


def _build_texts(n: int, seed: int, exclude=()) -> List[str]:
    rng = np.random.default_rng(seed)
    out: List[str] = []
    seen = set(exclude)
    while len(out) < n:
        s = _compose(rng)
        if s not in seen:
            seen.add(s)
            out.append(s)
    return out


# hand-written anchors guarantee full alphabet coverage in training
_ANCHORS = [
    "the quick brown fox jumps over the lazy dog",
    "a wizard quickly jinxed the gnome before",
    "pack my box with five dozen liquor jugs",
    "how quickly daft jumping zebras vex us",
]

# word-coverage anchors (v3.1): the module docstring promises "chars and
# most words are seen in training — like LJSpeech val", but the sampled
# 60 sentences left 8 word-bank words unseen in TRAIN ("june", "sea",
# "all", "day", "bay", "by", "night", "harbor") — and EVERY measured
# judge-floor failure was on exactly those words (their v3 glide
# contexts were novel at judge-training time: "june" -> "junhe"/"jne",
# "sea" -> "ssea", "all day" -> "ll day").  These anchors close the gap;
# `vocab_coverage_gaps` below keeps it closed.
_WORD_ANCHORS = [
    "the harbor keeps us all day and all night",
    "we sail by the bay in june",
    "a bold voyage starts in june by the sea",
]

TRAIN_TEXTS: List[str] = _ANCHORS + _WORD_ANCHORS + _build_texts(
    60, seed=101, exclude=_ANCHORS + _WORD_ANCHORS)


def vocab_coverage_gaps() -> List[str]:
    """Word-bank words that never occur in TRAIN_TEXTS (must be [])."""
    blob = " " + " ".join(TRAIN_TEXTS) + " "
    vocab = set(_ADJ + _NOUN) | {
        w for v in _VERB + _TAIL for w in v.split()}
    return sorted(w for w in vocab if f" {w} " not in blob)
HELD_OUT_TEXTS: List[str] = _build_texts(40, seed=202, exclude=TRAIN_TEXTS)


def n_words(texts) -> int:
    return sum(len(t.split()) for t in texts)


def max_frames(texts) -> int:
    """Upper bound on rendered mel frames across `texts` (hop 256)."""
    return int(max(float(np.sum(char_frames(t))) for t in texts)) + 4


def make_tone_corpus(root: Path, sentences, seed: int = 0) -> None:
    """Write the character-coded corpus in LJSpeech layout."""
    from matcha_tts_tpu.utils.wav import write_wav

    root = Path(root)
    root.mkdir(parents=True, exist_ok=True)
    (root / "wavs").mkdir(exist_ok=True)
    rng = np.random.default_rng(seed)
    lines = []
    for i, text in enumerate(sentences):
        write_wav(root / "wavs" / f"utt{i:02d}.wav", render_text(text, rng),
                  SR)
        lines.append(f"utt{i:02d}|{text}|{text}")
    (root / "metadata.csv").write_text("\n".join(lines) + "\n")


if __name__ == "__main__":
    tr, ho = TRAIN_TEXTS, HELD_OUT_TEXTS
    print(f"train: {len(tr)} sentences, {n_words(tr)} words, "
          f"max {max(len(t) for t in tr)} chars, "
          f"max {max_frames(tr)} frames")
    print(f"heldout: {len(ho)} sentences, {n_words(ho)} words, "
          f"max {max(len(t) for t in ho)} chars, "
          f"max {max_frames(ho)} frames")
    letters = set("".join(tr)) - {" "}
    assert letters == set("abcdefghijklmnopqrstuvwxyz"), letters
    assert not (set(ho) & set(tr))
    rates = [sentence_rate(t) for t in tr + ho]
    print(f"rates: {min(rates):.3f}-{max(rates):.3f}")
    for t in ho[:5]:
        print(" ", t)


def tone_runs(mel_ct: np.ndarray, n_frames: int) -> List[Tuple[int, int]]:
    """Segment a log-mel (n_mels, T) into audible tone runs.

    Thresholds per-frame peak log-energy at the midpoint between the
    utterance's loudest and quietest frame; the inter-character gaps are
    true silence, so each character's chord becomes one run.  This is the
    duration-evaluation surface that cannot be laundered by MAS token
    attribution: it measures what the listener hears (used by
    benchmarks/wer_e2e.py's audible-duration report and
    tests/test_trained_artifact.py)."""
    e = mel_ct[:, :n_frames].max(axis=0)
    thr = (float(e.max()) + float(e.min())) / 2.0
    on = e > thr
    runs, start = [], None
    for i, v in enumerate(on):
        if v and start is None:
            start = i
        if not v and start is not None:
            runs.append((start, i))
            start = None
    if start is not None:
        runs.append((start, int(n_frames)))
    return runs


def audible_duration_stats(mel_bct: np.ndarray, lens, texts):
    """Per-character duration realism measured ON THE AUDIO SURFACE.

    For every sentence whose synthesized mel segments into exactly
    len(text) tone runs, correlate run lengths against (a) the intrinsic
    per-character duration table (what a text-deterministic model can
    learn) and (b) the rendered ground-truth frames (which include the
    rate/jitter the model cannot see; its ceiling is the intrinsic-vs-
    rendered correlation, ~0.81 on the held-out split).

    Returns dict(match_rate, r_intrinsic, r_rendered, n_chars)."""
    rp, ri, rr = [], [], []
    ok = 0
    for b, t in enumerate(texts):
        runs = tone_runs(np.asarray(mel_bct[b]), int(lens[b]))
        if len(runs) != len(t):
            continue
        ok += 1
        tf = char_frames(t)
        for i, (s, e) in enumerate(runs):
            rp.append(e - s)
            ri.append(char_duration_ms(t[i]))
            rr.append(tf[i])
    out = {"match_rate": ok / max(len(texts), 1), "n_chars": len(rp)}
    if len(rp) >= 2:
        out["r_intrinsic"] = float(np.corrcoef(rp, ri)[0, 1])
        out["r_rendered"] = float(np.corrcoef(rp, rr)[0, 1])
    return out
