"""End-to-end intelligibility (WER): the reference's quality metric, executed.

The reference's headline quality number is 0.91 % WER: synthesize
sentences, transcribe with Whisper-medium, score with jiwer
(MOS_audiou_generator.ipynb cells 13-14).  Whisper weights cannot be
downloaded here (zero egress), so this benchmark runs the SAME loop with
an in-repo judge on a corpus whose audio provably encodes its text:

  1. character-coded corpus (benchmarks/tone_corpus.py): every character
     is a unique dual-tone chord with a VARIABLE duration — intrinsic
     per-character length (45-95 ms) x per-sentence speaking rate x
     per-position jitter — so MAS must find nonuniform monotonic paths
     and the duration predictor must learn per-character statistics
     (checked by an explicit predicted-vs-rendered correlation report);
     64 train / 40 held-out sentences (~270 held-out words -> WER
     resolution ~0.4 %);
  2. `fit()` the full-size (18M) Matcha model on it — real training
     (on-device log-mel -> MAS -> dur/prior/CFM losses -> Adam, the
     train_standalone.py:623-685 semantics);
  3. train the in-repo CTC ASR (matcha_tts_tpu/eval/ctc_asr.py) on the
     ground-truth log-mels of the TRAIN split only — with a STRIDE-1
     stem: the stride-2 default merged repeated letters across the old
     30 ms gaps ("keeper" -> "keper"), putting a 4 % floor under every
     measurement; stride 1 + 40 ms gaps drive the floor to 0.000;
  4. judge sanity: WER on held-out GROUND-TRUTH audio through the full
     `evaluate_wer` surface (wav -> 16 kHz resample -> ASR callable),
     proving the judge generalizes to utterances it never saw
     (required: 0.000, so every synthesized error is model damage);
  5. synthesize train + held-out texts with the trained model and report
     WER — memorization and generalization intelligibility;
  6. (--vocoder-steps > 0) GAN-train each vocoder family on the TRAIN
     split's audio and judge the FULL production chain the reference's
     0.91 % measures (MOS_audiou_generator.ipynb cells 12-14): text ->
     mel -> vocoder (-> denoiser for HiFi-GAN, hifigan/denoiser.py:62-68)
     -> wav -> 16 kHz resample -> ASR, per kernel mode (fp32 / bf16
     serving / int8).

Usage:
  python benchmarks/wer_e2e.py --train-steps 600 --asr-steps 600
"""

from __future__ import annotations

import argparse
import functools
import json
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
from matcha_tts_tpu.eval.ctc_asr import (CTCASRConfig, MEL_PAD_VALUE,
                                         encode_chars, save_ctc_asr,
                                         train_ctc_asr, transcribe_mels,
                                         wav_asr_callable)
from matcha_tts_tpu.eval.wer import evaluate_wer, normalize_for_wer, \
    word_error_rate
from matcha_tts_tpu.models.matcha import synthesize
from matcha_tts_tpu.ops.stft import log_mel_spectrogram
from matcha_tts_tpu.train.loop import fit

from benchmarks.distill_e2e import _tokens
from benchmarks.tone_corpus import (HELD_OUT_TEXTS, HOP, SR, TRAIN_TEXTS,
                                    char_frames, char_tones,
                                    make_tone_corpus, max_frames, n_words,
                                    render_text)


# judge-training augmentation (see main()): TRAIN texts rendered at
# these (speaking-rate multiple, jitter re-seed) variants so the ASR
# generalizes to held-out rates AND to unseen transition contexts — the
# v3 coarticulatory glides put transition spectra between characters,
# and a judge trained on a single jitter realization per text memorizes
# the exact window alignments instead of learning "glides are not
# characters" (measured: 3 rate scales alone left a 0.7 % floor;
# jitter re-seeds restore 0.000)
JUDGE_AUG = ((0.9, 0), (1.0, 0), (1.1, 0),
             (0.95, 1), (1.05, 2), (1.0, 3),
             (0.9, 4), (1.1, 5), (1.0, 6))
JUDGE_RATE_SCALES = tuple(r for r, _ in JUDGE_AUG)  # back-compat


def _n_frames(wav_len: int, a) -> int:
    pad = int((a.n_fft - a.hop_length) / 2)
    return 1 + (wav_len + 2 * pad - a.n_fft) // a.hop_length


@functools.partial(jax.jit, static_argnames=("sample_rate", "n_fft",
                                             "n_mels", "hop", "win",
                                             "f_min", "f_max"))
def _gt_logmel(audio, sample_rate, n_fft, n_mels, hop, win, f_min, f_max):
    return log_mel_spectrogram(audio, sample_rate, n_fft, n_mels, hop, win,
                               f_min, f_max)


def featurize_texts(texts, a, frame_bucket: int, noise_seed=None,
                    rate_scales=(1.0,), aug=None):
    """Render + log-mel a list of texts -> (B, frame_bucket, n_mels) fp32
    padded with the mel floor, plus true frame lengths.

    `aug` (a sequence of (rate_scale, jitter_seed) pairs; defaults to
    `[(r, 0) for r in rate_scales]`) with more than one entry is
    judge-training augmentation: each text rendered at several
    speaking-rate multiples and jitter re-seeds (rows ordered
    text-major: all variants of text 0, then text 1, ...) so the ASR
    generalizes to held-out sentences' unseen rates and transition
    contexts."""
    if aug is None:
        aug = tuple((rs, 0) for rs in rate_scales)
    rng = (np.random.default_rng(noise_seed)
           if noise_seed is not None else None)
    wav_bucket = (frame_bucket - 1) * a.hop_length + a.n_fft - 2 * int(
        (a.n_fft - a.hop_length) / 2)
    n = len(texts) * len(aug)
    audio = np.zeros((n, wav_bucket), np.float32)
    lens = np.zeros((n,), np.int32)
    i = 0
    for text in texts:
        for rs, js in aug:
            w = render_text(text, rng, rate_scale=rs,
                            jitter_seed=js)[:wav_bucket]
            audio[i, : len(w)] = w
            lens[i] = min(_n_frames(len(w), a), frame_bucket)
            i += 1
    mel = np.array(_gt_logmel(jnp.asarray(audio), a.sample_rate, a.n_fft,
                              a.n_mels, a.hop_length, a.win_length,
                              a.f_min, a.f_max)).transpose(0, 2, 1)
    # beyond the true length the STFT saw zero padding, force the mel floor
    for i, l in enumerate(lens):
        mel[i, l:] = MEL_PAD_VALUE
    return mel.astype(np.float32), lens


def pack_labels(texts):
    ids = [encode_chars(t) for t in texts]
    t_max = max(len(i) for i in ids)
    labels = np.zeros((len(ids), t_max), np.int32)
    lens = np.zeros((len(ids),), np.int32)
    for r, i in enumerate(ids):
        labels[r, : len(i)] = i
        lens[r] = len(i)
    return labels, lens


def make_asr_callable(asr_params, asr_cfg, a, frame_bucket: int):
    """wav16k -> hypothesis string (matcha_tts_tpu.eval.ctc_asr surface)."""
    return wav_asr_callable(asr_params, asr_cfg, a, frame_bucket)


@functools.partial(jax.jit,
                   static_argnames=("cfg", "nfe", "t_y", "temperature"))
def _synth(params, key, x, x_lengths, cfg, nfe, t_y, temperature=0.667):
    return synthesize(params, key, x, x_lengths, cfg, n_timesteps=nfe,
                      t_y_max=t_y, temperature=temperature)


def synth_wer(params, cfg, asr_params, asr_cfg, texts, text_bucket: int,
              frame_bucket: int, nfe: int, temperature: float = 0.667):
    """Synthesize texts -> transcribe the model's mels -> WER stats."""
    x, xl = _tokens(texts, text_bucket)
    out = _synth(params, jax.random.PRNGKey(7), x, xl, cfg, nfe,
                 frame_bucket, temperature)
    mel = np.asarray(out.mel).transpose(0, 2, 1).astype(np.float32)
    lens = np.asarray(out.y_lengths, np.int32)
    for i, l in enumerate(lens):
        mel[i, l:] = MEL_PAD_VALUE
    hyps = transcribe_mels(asr_params, mel, lens, asr_cfg)
    wers = [word_error_rate(normalize_for_wer(t), normalize_for_wer(h))
            for t, h in zip(texts, hyps)]
    return {"mean_wer": float(np.mean(wers)),
            "per_sentence_wer": [float(w) for w in wers],
            "hypotheses": hyps, "mel_btc": mel, "lens": lens,
            "durations": np.asarray(out.durations, np.int32),
            "n_words": n_words(texts)}


def duration_report(durations: np.ndarray, texts):
    """Duration-predictor-vs-truth correlations.

    `durations`: (B, T_x) integer per-token frames from `synthesize`
    (ceil(exp(logw)), length_scale=1) over the 2n+1 blank-interspersed
    token layout — char i's token sits at 2i+1 and its trailing gap
    aligns to the following blank at 2i+2.

    Returns (r_char, r_sentence):
      r_char     — Pearson r between predicted frames per character
                   (char token + following blank) and the renderer's
                   true segment frames (`tone_corpus.char_frames`);
                   bounded below 1.0 by the rate/jitter variance the
                   text-deterministic predictor cannot see;
      r_sentence — Pearson r between predicted and true TOTAL frames
                   per sentence.
    """
    pred_char, true_char, pred_tot, true_tot = [], [], [], []
    for b, t in enumerate(texts):
        tf = char_frames(t)
        d = np.asarray(durations[b], np.float64)
        for i in range(len(t)):
            pred_char.append(d[2 * i + 1] + d[2 * i + 2])
            true_char.append(tf[i])
        pred_tot.append(float(d.sum()))
        true_tot.append(float(tf.sum()))
    r_char = float(np.corrcoef(pred_char, true_char)[0, 1])
    r_sent = float(np.corrcoef(pred_tot, true_tot)[0, 1])
    return r_char, r_sent


def train_vocoder_gan(family: str, train_wavs, acfg, steps: int,
                      batch: int = 16, segment: int = 8192, seed: int = 0,
                      report_every: int = 200, lr: float = 2e-4, hcfg=None,
                      grad_clip=None):
    """GAN-train one vocoder family from scratch on raw training audio.

    Returns (gen_params on host, family config).  Same recipe as
    benchmarks/vocoder_gan_e2e.py (paper discriminators per family); the
    reference itself never trains its vendored GAN stack
    (hifigan/models.py:209+), it ships pretrained weights — here the
    corpus is in-repo so the weights must be earned on hardware.
    """
    from matcha_tts_tpu.config import HiFiGANConfig, VocosConfig
    from matcha_tts_tpu.train.vocoder import (create_gan_state, gan_disc_step,
                                              gan_gen_step, random_segment_np)

    if family == "vocos":
        hcfg, discs = hcfg or VocosConfig(), ("mpd", "mrd")
    else:
        hcfg, discs = hcfg or HiFiGANConfig(), ("mpd", "msd")
    state = create_gan_state(jax.random.PRNGKey(seed), hcfg,
                             learning_rate=lr, discriminators=discs,
                             grad_clip=grad_clip)
    rng = np.random.default_rng(seed)
    for step in range(steps):
        audio = jnp.asarray(np.stack([
            random_segment_np(rng, train_wavs[int(i)], segment,
                              acfg.hop_length)
            for i in rng.integers(0, len(train_wavs), size=batch)]))
        state, d_loss = gan_disc_step(state, audio, hcfg, acfg,
                                      grad_clip=grad_clip)
        state, metrics = gan_gen_step(state, audio, hcfg, acfg,
                                      grad_clip=grad_clip)
        if report_every and (step + 1) % report_every == 0:
            m, d = float(metrics["mel_l1"]), float(d_loss)
            print(f"  {family} gan step {step + 1}: "
                  f"mel_l1 {m:.4f} disc {d:.4f}")
            # fail loudly on PARAMETER divergence instead of judging NaN
            # audio (a NaN loss on a single step is survivable — with
            # grad_clip the optimizer skips non-finite updates)
            leaf = jax.tree_util.tree_leaves(state.gen_params)[0]
            if not bool(jnp.isfinite(leaf).all()):
                raise FloatingPointError(
                    f"{family} GAN parameters diverged by step "
                    f"{step + 1} (mel_l1={m}, disc={d})")
    return jax.device_get(state.gen_params), hcfg


def vocoded_wer(mel_btc: np.ndarray, lens: np.ndarray, texts, gen_params,
                vcfg, acfg, asr_fn, denoise_strength: float = 0.0,
                dtype=None, chunk: int = 4):
    """Judge mels through the wav surface: vocoder (-> denoiser) -> crop
    -> `evaluate_wer` (16 kHz resample + ASR callable inside).

    mel_btc: (B, T, n_mels) denormalized log-mel, frames beyond `lens`
    at the mel floor.  `dtype` = jnp.bfloat16 reproduces the serving cast
    (params and activations); None keeps fp32.  The batch is vocoded in
    `chunk`-row slices (one compiled shape, last slice padded): fp32
    HiFi-GAN activations at wav rate exceed HBM beyond batch ~16, and
    the round-4 corpus judges 40 held-out sentences at once.
    """
    from matcha_tts_tpu.models import vocoder as vocoder_mod

    dt = dtype or jnp.float32
    params = jax.tree_util.tree_map(lambda a: jnp.asarray(a, dt), gen_params)
    dn = None
    if denoise_strength > 0.0:
        from matcha_tts_tpu.models.denoiser import denoise, make_denoiser

        dn = make_denoiser(gen_params, vcfg)

    @functools.partial(jax.jit, static_argnames=())
    def run(mel):
        wav = vocoder_mod.generate(params, mel.astype(dt),
                                   vcfg).astype(jnp.float32)
        if dn is not None:
            wav = denoise(dn, wav, denoise_strength)
        return wav

    b = mel_btc.shape[0]
    pieces = []
    for i in range(0, b, chunk):
        m = mel_btc[i : i + chunk]
        if m.shape[0] < chunk:  # pad to the compiled shape
            pad = np.full((chunk - m.shape[0],) + m.shape[1:],
                          MEL_PAD_VALUE, m.dtype)
            m = np.concatenate([m, pad], axis=0)
        pieces.append(np.asarray(run(jnp.asarray(m, np.float32))))
    wav = np.concatenate(pieces, axis=0)[:b]
    hop = acfg.hop_length
    wavs = [wav[i, : min(int(l) * hop, wav.shape[1])]
            for i, l in enumerate(lens)]
    return evaluate_wer(texts, wavs, acfg.sample_rate, asr_fn)


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--data-root", default="/tmp/wer_corpus")
    ap.add_argument("--work-dir", default="/tmp/wer_e2e")
    ap.add_argument("--train-steps", type=int, default=600)
    ap.add_argument("--asr-steps", type=int, default=600)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--nfe", type=int, default=10)
    ap.add_argument("--lr", type=float, default=1e-4)
    ap.add_argument("--temperature", type=float, default=0.667)
    ap.add_argument("--vocoder-steps", type=int, default=0,
                    help="> 0: GAN-train the vocoder families on the tone "
                         "corpus and report WAV-surface WER (the chain the "
                         "reference's 0.91%% measures)")
    ap.add_argument("--vocoder-families", default="hifigan,vocos")
    ap.add_argument("--vocoder-batch", type=int, default=16)
    ap.add_argument("--segment", type=int, default=8192)
    ap.add_argument("--denoise-strength", type=float, default=2.5e-4,
                    help="HiFi-GAN denoiser strength (main.py:117)")
    ap.add_argument("--gan-grad-clip", type=float, default=10.0,
                    help="global-norm gradient clip for the vocoder GANs "
                         "(0 disables); without it Vocos+MRD diverges on "
                         "this silence-heavy corpus at step ~1100")
    ap.add_argument("--eval-grid", action="store_true",
                    help="also report held-out WER over an (NFE, "
                         "temperature) grid to separate under-training "
                         "from sampling-noise effects")
    ap.add_argument("--preset", choices=("full", "tiny", "small"),
                    default="full",
                    help="tiny = CPU smoke config; small = ~2M commit-sized "
                         "config; full = 18M LJSpeech")
    ap.add_argument("--ljspeech-stats", action="store_true",
                    help="keep the reference's hardcoded LJSpeech mel "
                         "statistics instead of computing the corpus's own")
    ap.add_argument("--save-artifacts", default=None,
                    help="directory to write release-quality artifacts: the "
                         "trained model as a Lightning-style torch .ckpt "
                         "(exercises the real converter/loader path), the "
                         "CTC judge .npz, and golden held-out synth mels")
    args = ap.parse_args(argv)

    text_bucket, frame_bucket = 128, 512
    assert max_frames(TRAIN_TEXTS + HELD_OUT_TEXTS) <= frame_bucket
    # Judge training renders TRAIN texts at several (rate, jitter-seed)
    # variants; without headroom at the slowest/longest variant, the
    # longest sentence's audio tail would be silently truncated at
    # [:wav_bucket] while its CTC labels keep every character —
    # mislabeled judge rows (ADVICE r4).  Checked EXACTLY over the
    # actual augmentation pairs via the renderer's own segment lengths.
    from benchmarks.tone_corpus import char_segments
    for _t in TRAIN_TEXTS:
        for _rs, _js in JUDGE_AUG:
            _segs = char_segments(_t, _rs, _js)
            _fr = (sum(nt + ng for _, nt, ng in _segs)
                   - _segs[-1][2]) / HOP + 4
            assert _fr <= frame_bucket, (
                f"judge augmentation overflows the bucket: {_t!r} at "
                f"rate {_rs} jitter {_js} needs ~{_fr:.0f} frames")
    root = Path(args.data_root)
    make_tone_corpus(root, TRAIN_TEXTS)
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
    elif args.preset == "small":
        # commit-sized (~2M params, ~8 MB fp32 ckpt): large enough to learn
        # the tone corpus cleanly, small enough to live in tests/golden/.
        from matcha_tts_tpu.config import (DecoderConfig,
                                           DurationPredictorConfig,
                                           EncoderConfig)

        cfg = MatchaConfig(
            encoder=EncoderConfig(n_feats=80, n_channels=96,
                                  filter_channels=256, n_heads=2, n_layers=2),
            duration_predictor=DurationPredictorConfig(filter_channels_dp=96),
            decoder=DecoderConfig(channels=(96, 96), attention_head_dim=48,
                                  num_heads=2, n_blocks=1, num_mid_blocks=1),
        )
    else:
        cfg = MatchaConfig()  # full-size 18M LJSpeech config

    if not args.ljspeech_stats:
        # The reference hardcodes LJSpeech data_statistics
        # (train_standalone.py:802-805); the tone corpus is mostly silence
        # + sparse chords, so those constants put silence ~2.8 sigma from
        # zero.  Compute the corpus's own moments like upstream's
        # generate_data_statistics pass.
        import dataclasses
        from matcha_tts_tpu.data.statistics import compute_mel_statistics

        mean, std = compute_mel_statistics(train_fl, cfg.audio,
                                           frame_buckets=(frame_bucket,))
        print(f"corpus mel statistics: mean={mean:.4f} std={std:.4f} "
              f"(LJSpeech defaults: {cfg.audio.mel_mean:.4f} / "
              f"{cfg.audio.mel_std:.4f})")
        cfg = dataclasses.replace(
            cfg, audio=dataclasses.replace(cfg.audio, mel_mean=mean,
                                           mel_std=std))
    a = cfg.audio

    # 1. judge: CTC ASR trained on TRAIN-split ground-truth mels only.
    #    stride=1: the stride-2 stem halves time resolution, which merged
    #    repeated letters into one CTC emission and floored every WER at
    #    ~4 % (VERDICT r3 weak #3); at stride 1 the >=2.9-frame gaps
    #    always yield a blank between repeats.
    print("== training the CTC ASR judge on ground-truth mels ==")
    # rate + jitter augmentation (train texts only): each character must
    # be recognizable at speaking rates and transition contexts the
    # judge never saw, since held-out sentences carry their own rates
    # and glide alignments
    gt_mel, gt_lens = featurize_texts(TRAIN_TEXTS, a, frame_bucket,
                                      noise_seed=1, aug=JUDGE_AUG)
    labels, label_lens = pack_labels(
        [t for t in TRAIN_TEXTS for _ in JUDGE_AUG])
    t0 = time.time()
    asr_cfg = CTCASRConfig(n_mels=a.n_mels, stride=1)
    # 3-member ensemble (mean log-softmax at decode): spurious glide-
    # frame emissions are seed-dependent — single members left a 0.4-0.7%
    # floor with the residual errors MOVING between seeds; the ensemble
    # suppresses them (measured 0.000)
    asr_params = [
        train_ctc_asr(jax.random.PRNGKey(11 + i), gt_mel, gt_lens,
                      labels, label_lens, asr_cfg,
                      steps=args.asr_steps, lr=1e-3,
                      log_every=(200 if i == 0 else 0))
        for i in range(3)]
    print(f"asr ensemble (3 members) trained in {time.time() - t0:.0f}s")
    Path(args.work_dir).mkdir(parents=True, exist_ok=True)
    judge_path = Path(args.work_dir) / "ctc_judge.npz"
    save_ctc_asr(judge_path, asr_params, asr_cfg)
    print(f"judge saved: {judge_path} "
          f"(usable via benchmarks/evaluate.py --ctc-asr)")

    # 2. judge sanity on held-out GROUND-TRUTH audio, full wav surface.
    #    The floor must be 0.000 — otherwise "vocoder adds no damage" is
    #    indistinguishable from "judge can't see the damage".
    held_wavs = [render_text(t, np.random.default_rng(2))
                 for t in HELD_OUT_TEXTS]
    asr_fn = make_asr_callable(asr_params, asr_cfg, a, frame_bucket)
    gt = evaluate_wer(HELD_OUT_TEXTS, held_wavs, SR, asr_fn)
    print(f"judge WER on held-out ground-truth audio: "
          f"{gt['mean_wer']:.4f} over {n_words(HELD_OUT_TEXTS)} words")
    for t, h in zip(HELD_OUT_TEXTS, gt["hypotheses"]):
        if normalize_for_wer(t) != h:
            print(f"  gt MISS: {normalize_for_wer(t)!r} -> {h!r}")

    # 3. train the acoustic model
    print("== training Matcha ==")
    tcfg = TrainConfig(batch_size=args.batch, text_buckets=(text_bucket,),
                       frame_buckets=(frame_bucket,), log_every_n_steps=50,
                       learning_rate=args.lr, ckpt_every_n_steps=10**9)
    t0 = time.time()
    state = fit(cfg, tcfg, train_fl, val_fl, work_dir=f"{args.work_dir}/tts",
                max_steps=args.train_steps, resume=False)
    params = jax.device_get(state.params)
    print(f"matcha trained: {args.train_steps} steps "
          f"in {time.time() - t0:.0f}s")
    # leave the trained tree on disk so post-hoc analysis (or artifact
    # regeneration) never needs a retrain
    import pickle

    from matcha_tts_tpu.config import config_to_json
    with open(Path(args.work_dir) / "matcha_trained.pkl", "wb") as f:
        pickle.dump({"params": params, "cfg_json": config_to_json(cfg)}, f)

    # 4. intelligibility of the synthesized mels + duration-model report
    results = {"wer_groundtruth_heldout": gt["mean_wer"],
               "n_heldout_words": n_words(HELD_OUT_TEXTS),
               "n_train_words": n_words(TRAIN_TEXTS)}
    synth_sets = {}
    for name, texts in (("train", list(TRAIN_TEXTS[:12])),
                        ("heldout", HELD_OUT_TEXTS)):
        r = synth_wer(params, cfg, asr_params, asr_cfg, texts, text_bucket,
                      frame_bucket, args.nfe, args.temperature)
        synth_sets[name] = (texts, r)
        results[f"wer_synth_{name}"] = r["mean_wer"]
        print(f"synth WER ({name}): {r['mean_wer']:.4f} over "
              f"{r['n_words']} words")
        for t, h in zip(texts, r["hypotheses"]):
            if normalize_for_wer(t) != h:
                print(f"  MISS: {normalize_for_wer(t)!r} -> {h!r}")

    # the duration predictor must have learned per-character statistics:
    # correlate its held-out predictions against the renderer's true
    # segment lengths (the reference's duration realism,
    # train_standalone.py:390-430, made measurable)
    r_char, r_sent = duration_report(synth_sets["heldout"][1]["durations"],
                                     HELD_OUT_TEXTS)
    results["duration_corr_char"] = r_char
    results["duration_corr_sentence"] = r_sent
    print(f"duration predictor vs rendered truth: per-char r={r_char:.3f} "
          f"per-sentence r={r_sent:.3f}")
    # token-level attribution is laundered by MAS blank-wobble (adjacent
    # blank/char tokens trade frames; measured round 4), so the defining
    # metric is on the AUDIO surface: segment the synthesized mel into
    # tone runs and correlate audible per-character durations
    from benchmarks.tone_corpus import audible_duration_stats

    hr = synth_sets["heldout"][1]
    aud = audible_duration_stats(hr["mel_btc"].transpose(0, 2, 1),
                                 hr["lens"], HELD_OUT_TEXTS)
    results["duration_audible_match_rate"] = aud["match_rate"]
    results["duration_audible_r_intrinsic"] = aud.get("r_intrinsic", 0.0)
    results["duration_audible_r_rendered"] = aud.get("r_rendered", 0.0)
    print(f"audible per-char durations: tone-count match "
          f"{aud['match_rate']:.2f}, r_intrinsic "
          f"{aud.get('r_intrinsic', 0):.3f}, r_rendered "
          f"{aud.get('r_rendered', 0):.3f} over {aud['n_chars']} chars")

    # 5. vocoder inside the judged loop: text -> mel -> vocoder
    #    (-> denoiser) -> wav -> 16 kHz -> ASR, the exact chain the
    #    reference's 0.91 % transcribes (MOS_audiou_generator.ipynb 12-14)
    if args.vocoder_steps > 0:
        import dataclasses as _dc

        from matcha_tts_tpu.data.dataset import load_wav, parse_filelist

        train_wavs = [load_wav(p[0])[0] for p in parse_filelist(train_fl)]
        # ground-truth-mel resynthesis set: isolates vocoder damage from
        # acoustic-model damage (same held-out texts, true features)
        gt_mel_held, gt_lens_held = featurize_texts(HELD_OUT_TEXTS, a,
                                                    frame_bucket,
                                                    noise_seed=2)
        on_tpu = jax.default_backend() not in ("cpu",)
        for family in args.vocoder_families.split(","):
            family = family.strip()
            print(f"== GAN-training {family} on the tone corpus ==")
            t0 = time.time()
            gen_params, vcfg = train_vocoder_gan(
                family, train_wavs, a, steps=args.vocoder_steps,
                batch=args.vocoder_batch, segment=args.segment,
                grad_clip=args.gan_grad_clip or None)
            print(f"{family} trained: {args.vocoder_steps} steps in "
                  f"{time.time() - t0:.0f}s")
            with open(Path(args.work_dir) / f"{family}_gen.pkl", "wb") as f:
                pickle.dump({"gen_params": gen_params,
                             "family": family}, f)
            dstr = (args.denoise_strength if family == "hifigan" else 0.0)
            modes = [("fp32", vcfg, None),
                     ("bf16", vcfg, jnp.bfloat16)]
            if family == "hifigan" and on_tpu:
                # int8 weight quantization rides the Pallas kernels; on CPU
                # mrf_kernel falls back to XLA so the mode would silently
                # measure bf16 twice.
                modes.append(("int8",
                              _dc.replace(vcfg, mrf_kernel="int8"),
                              jnp.bfloat16))
            for mode, mcfg, dt in modes:
                for name in ("heldout", "train"):
                    texts, r = synth_sets[name]
                    w = vocoded_wer(r["mel_btc"], r["lens"], texts,
                                    gen_params, mcfg, a, asr_fn,
                                    denoise_strength=dstr, dtype=dt)
                    key = f"wer_wav_{family}_{mode}_{name}"
                    results[key] = w["mean_wer"]
                    print(f"{key}: {w['mean_wer']:.4f}")
                    if name == "heldout":
                        for t, h in zip(texts, w["hypotheses"]):
                            if normalize_for_wer(t) != h:
                                print(f"  MISS: {normalize_for_wer(t)!r} "
                                      f"-> {h!r}")
                # vocoder-only damage: resynthesize ground-truth mels
                w = vocoded_wer(gt_mel_held, gt_lens_held, HELD_OUT_TEXTS,
                                gen_params, mcfg, a, asr_fn,
                                denoise_strength=dstr, dtype=dt)
                results[f"wer_wav_{family}_{mode}_gtmel"] = w["mean_wer"]
                print(f"wer_wav_{family}_{mode}_gtmel: {w['mean_wer']:.4f}")

    if args.eval_grid:
        for nfe in (4, 10, 32):
            for temp in (0.0, 0.3, 0.667):
                r = synth_wer(params, cfg, asr_params, asr_cfg,
                              HELD_OUT_TEXTS, text_bucket, frame_bucket,
                              nfe, temp)
                key = f"wer_heldout_nfe{nfe}_t{temp}"
                results[key] = r["mean_wer"]
                print(f"grid {key}: {r['mean_wer']:.4f}")

    if args.save_artifacts:
        import torch

        from matcha_tts_tpu.config import config_to_json
        from matcha_tts_tpu.params.convert import export_matcha

        out = Path(args.save_artifacts)
        out.mkdir(parents=True, exist_ok=True)
        # Lightning-style .ckpt (model.-prefixed state_dict +
        # hyper_parameters), so loading it exercises the exact surface the
        # reference's inference loader uses (main.py:94-129).
        sd = export_matcha(params, cfg)
        ckpt = {
            "state_dict": {
                f"model.{k}": torch.from_numpy(np.ascontiguousarray(v))
                for k, v in sd.items()},
            "hyper_parameters": json.loads(config_to_json(cfg)),
            "epoch": 0,
            "global_step": args.train_steps,
        }
        torch.save(ckpt, out / "matcha_tone.ckpt")
        save_ctc_asr(out / "ctc_judge.npz", asr_params, asr_cfg)
        # golden held-out synth mels at a fixed seed (regression anchors);
        # a 12-sentence subset keeps the committed artifact small while
        # the WER bound in results covers the full 40
        golden_texts = HELD_OUT_TEXTS[:12]
        x, xl = _tokens(golden_texts, text_bucket)
        g = _synth(params, jax.random.PRNGKey(7), x, xl, cfg, args.nfe,
                   frame_bucket, args.temperature)
        np.savez_compressed(
            out / "goldens.npz",
            mel=np.asarray(g.mel, np.float32),
            y_lengths=np.asarray(g.y_lengths, np.int32),
            texts=np.array(golden_texts), nfe=np.int32(args.nfe),
            temperature=np.float32(args.temperature),
            text_bucket=np.int32(text_bucket),
            frame_bucket=np.int32(frame_bucket),
            wer_synth_heldout=np.float32(results["wer_synth_heldout"]),
            wer_groundtruth_heldout=np.float32(
                results["wer_groundtruth_heldout"]),
            duration_corr_char=np.float32(r_char),
            duration_corr_sentence=np.float32(r_sent),
            duration_audible_r_intrinsic=np.float32(
                results["duration_audible_r_intrinsic"]),
            duration_audible_match_rate=np.float32(
                results["duration_audible_match_rate"]))
        print(f"artifacts written to {out}")

    print(json.dumps(results))
    return results


if __name__ == "__main__":
    main()
