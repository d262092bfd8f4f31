"""End-to-end intelligibility (WER): the reference's quality metric, executed.

The reference's headline quality number is 0.91 % WER: synthesize
sentences, transcribe with Whisper-medium, score with jiwer
(MOS_audiou_generator.ipynb cells 13-14).  Whisper weights cannot be
downloaded here (zero egress), so this benchmark runs the SAME loop with
an in-repo judge on a corpus whose audio provably encodes its text:

  1. character-coded corpus: every character is a unique dual-tone chord
     (DTMF-style row/col frequencies), space is silence, with short
     silence gaps between characters — so a recognizer genuinely has to
     read the text out of the audio;
  2. `fit()` the full-size (18M) Matcha model on it — real training
     (on-device log-mel -> MAS -> dur/prior/CFM losses -> Adam, the
     train_standalone.py:623-685 semantics);
  3. train the in-repo CTC ASR (matcha_tts_tpu/eval/ctc_asr.py) on the
     ground-truth log-mels of the TRAIN split only;
  4. judge sanity: WER on held-out GROUND-TRUTH audio through the full
     `evaluate_wer` surface (wav -> 16 kHz resample -> ASR callable),
     proving the judge generalizes to utterances it never saw;
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
from matcha_tts_tpu.utils.wav import write_wav

from benchmarks.distill_e2e import CORPUS, _tokens

# Held-out texts (unseen char sequences; <=44 chars so the rendered audio
# fits the 384-frame bucket at 90 ms per character).
HELD_OUT = [
    "the lighthouse keeper watched the storm",
    "fresh vegetables make every meal better",
    "children played in the autumn park",
    "a bright symphony filled the night air",
]

SR = 22050
HOP = 256

# Character acoustics: a-z -> (row, col) dual-tone chord, space -> a lone
# low tone (a silent space is confusable with the inter-character gaps).
# Frequencies sit inside the 0-8 kHz acoustic mel band and below the 16 kHz
# Nyquist that `resample_to_16k` (the Whisper-surface resample) imposes.
# Col tones are spaced GEOMETRICALLY (x1.25): the mel filterbank is
# log-spaced above ~1 kHz, so the original linear 400 Hz spacing left
# adjacent cols only 2.5-3.6 mel bins apart — below the trained
# generator's spectral resolution (measured 2026-08-20: a converged
# model substituted same-row / adjacent-col characters, 'lazy'->'hasy').
# Geometric spacing keeps every adjacent pair ~6 mel bins apart, matching
# the rows' measured-learnable ~6.6-bin spacing.
ROW_HZ = (400.0, 800.0, 1200.0, 1600.0, 2000.0)
COL_HZ = (2400.0, 3000.0, 3750.0, 4700.0, 5900.0, 7300.0)
SPACE_HZ = 250.0
TONE_SEC = 0.060   # per-character chord length (~5 mel frames)
GAP_SEC = 0.030    # inter-character silence: ~2.6 frames, so repeated
                   # chars still separate after the ASR's stride-2 stem
RAMP_SEC = 0.005   # attack/release to avoid clicks


def char_tones(ch: str):
    """'a'..'z' -> (f_row, f_col); space -> (SPACE_HZ,); else None."""
    if "a" <= ch <= "z":
        k = ord(ch) - ord("a")
        return ROW_HZ[k // len(COL_HZ)], COL_HZ[k % len(COL_HZ)]
    if ch == " ":
        return (SPACE_HZ,)
    return None


def render_text(text: str, noise_rng=None) -> np.ndarray:
    """Text -> float32 waveform in which each character is audible."""
    n_tone, n_gap = int(SR * TONE_SEC), int(SR * GAP_SEC)
    n_ramp = int(SR * RAMP_SEC)
    env = np.ones(n_tone, np.float64)
    env[:n_ramp] = np.linspace(0.0, 1.0, n_ramp)
    env[-n_ramp:] = np.linspace(1.0, 0.0, n_ramp)
    t = np.arange(n_tone) / SR
    gap = np.zeros(n_gap, np.float64)
    pieces = []
    for ch in text.lower():
        tones = char_tones(ch)
        if tones is None:
            pieces.append(np.zeros(n_tone, np.float64))
        else:
            chord = 0.18 * sum(np.sin(2 * np.pi * f * t) for f in tones)
            pieces.append(env * chord)
        pieces.append(gap)
    wav = np.concatenate(pieces[:-1])  # no trailing gap
    if noise_rng is not None:
        wav = wav + 0.002 * noise_rng.standard_normal(len(wav))
    return wav.astype(np.float32)


def make_tone_corpus(root: Path, sentences, seed: int = 0) -> None:
    """Write the character-coded corpus in LJSpeech layout."""
    root.mkdir(parents=True, exist_ok=True)
    (root / "wavs").mkdir(exist_ok=True)
    rng = np.random.default_rng(seed)
    lines = []
    for i, text in enumerate(sentences):
        write_wav(root / "wavs" / f"utt{i:02d}.wav", render_text(text, rng),
                  SR)
        lines.append(f"utt{i:02d}|{text}|{text}")
    (root / "metadata.csv").write_text("\n".join(lines) + "\n")


def _n_frames(wav_len: int, a) -> int:
    pad = int((a.n_fft - a.hop_length) / 2)
    return 1 + (wav_len + 2 * pad - a.n_fft) // a.hop_length


@functools.partial(jax.jit, static_argnames=("sample_rate", "n_fft",
                                             "n_mels", "hop", "win",
                                             "f_min", "f_max"))
def _gt_logmel(audio, sample_rate, n_fft, n_mels, hop, win, f_min, f_max):
    return log_mel_spectrogram(audio, sample_rate, n_fft, n_mels, hop, win,
                               f_min, f_max)


def featurize_texts(texts, a, frame_bucket: int, noise_seed=None):
    """Render + log-mel a list of texts -> (B, frame_bucket, n_mels) fp32
    padded with the mel floor, plus true frame lengths."""
    rng = (np.random.default_rng(noise_seed)
           if noise_seed is not None else None)
    wav_bucket = (frame_bucket - 1) * a.hop_length + a.n_fft - 2 * int(
        (a.n_fft - a.hop_length) / 2)
    audio = np.zeros((len(texts), wav_bucket), np.float32)
    lens = np.zeros((len(texts),), np.int32)
    for i, text in enumerate(texts):
        w = render_text(text, rng)[:wav_bucket]
        audio[i, : len(w)] = w
        lens[i] = min(_n_frames(len(w), a), frame_bucket)
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
            "hypotheses": hyps, "mel_btc": mel, "lens": lens}


def train_vocoder_gan(family: str, train_wavs, acfg, steps: int,
                      batch: int = 16, segment: int = 8192, seed: int = 0,
                      report_every: int = 200, lr: float = 2e-4, hcfg=None):
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
                             learning_rate=lr, discriminators=discs)
    rng = np.random.default_rng(seed)
    for step in range(steps):
        audio = jnp.asarray(np.stack([
            random_segment_np(rng, train_wavs[int(i)], segment,
                              acfg.hop_length)
            for i in rng.integers(0, len(train_wavs), size=batch)]))
        state, d_loss = gan_disc_step(state, audio, hcfg, acfg)
        state, metrics = gan_gen_step(state, audio, hcfg, acfg)
        if report_every and (step + 1) % report_every == 0:
            print(f"  {family} gan step {step + 1}: "
                  f"mel_l1 {float(metrics['mel_l1']):.4f} "
                  f"disc {float(d_loss):.4f}")
    return jax.device_get(state.gen_params), hcfg


def vocoded_wer(mel_btc: np.ndarray, lens: np.ndarray, texts, gen_params,
                vcfg, acfg, asr_fn, denoise_strength: float = 0.0,
                dtype=None):
    """Judge mels through the wav surface: vocoder (-> denoiser) -> crop
    -> `evaluate_wer` (16 kHz resample + ASR callable inside).

    mel_btc: (B, T, n_mels) denormalized log-mel, frames beyond `lens`
    at the mel floor.  `dtype` = jnp.bfloat16 reproduces the serving cast
    (params and activations); None keeps fp32.
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

    wav = np.asarray(run(jnp.asarray(mel_btc, np.float32)))
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

    text_bucket, frame_bucket = 128, 384
    root = Path(args.data_root)
    make_tone_corpus(root, CORPUS)
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

    # 1. judge: CTC ASR trained on TRAIN-split ground-truth mels only
    print("== training the CTC ASR judge on ground-truth mels ==")
    gt_mel, gt_lens = featurize_texts(CORPUS, a, frame_bucket, noise_seed=1)
    labels, label_lens = pack_labels(CORPUS)
    t0 = time.time()
    asr_cfg = CTCASRConfig(n_mels=a.n_mels)
    asr_params = train_ctc_asr(jax.random.PRNGKey(11), gt_mel, gt_lens,
                               labels, label_lens, asr_cfg,
                               steps=args.asr_steps, lr=1e-3, log_every=100)
    print(f"asr trained in {time.time() - t0:.0f}s")
    Path(args.work_dir).mkdir(parents=True, exist_ok=True)
    judge_path = Path(args.work_dir) / "ctc_judge.npz"
    save_ctc_asr(judge_path, asr_params, asr_cfg)
    print(f"judge saved: {judge_path} "
          f"(usable via benchmarks/evaluate.py --ctc-asr)")

    # 2. judge sanity on held-out GROUND-TRUTH audio, full wav surface
    held_wavs = [render_text(t, np.random.default_rng(2)) for t in HELD_OUT]
    asr_fn = make_asr_callable(asr_params, asr_cfg, a, frame_bucket)
    gt = evaluate_wer(HELD_OUT, held_wavs, SR, asr_fn)
    print(f"judge WER on held-out ground-truth audio: "
          f"{gt['mean_wer']:.4f}")
    for h in gt["hypotheses"]:
        print(f"  gt hyp: {h}")

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

    # 4. intelligibility of the synthesized mels
    results = {"wer_groundtruth_heldout": gt["mean_wer"]}
    synth_sets = {}
    for name, texts in (("train", list(CORPUS[:8])), ("heldout", HELD_OUT)):
        r = synth_wer(params, cfg, asr_params, asr_cfg, texts, text_bucket,
                      frame_bucket, args.nfe, args.temperature)
        synth_sets[name] = (texts, r)
        results[f"wer_synth_{name}"] = r["mean_wer"]
        print(f"synth WER ({name}): {r['mean_wer']:.4f}")
        for t, h in zip(texts, r["hypotheses"]):
            print(f"  ref: {normalize_for_wer(t)}\n  hyp: {h}")

    # 5. vocoder inside the judged loop: text -> mel -> vocoder
    #    (-> denoiser) -> wav -> 16 kHz -> ASR, the exact chain the
    #    reference's 0.91 % transcribes (MOS_audiou_generator.ipynb 12-14)
    if args.vocoder_steps > 0:
        import dataclasses as _dc

        from matcha_tts_tpu.data.dataset import load_wav, parse_filelist

        train_wavs = [load_wav(p[0])[0] for p in parse_filelist(train_fl)]
        # ground-truth-mel resynthesis set: isolates vocoder damage from
        # acoustic-model damage (same held-out texts, true features)
        gt_mel_held, gt_lens_held = featurize_texts(HELD_OUT, a, frame_bucket,
                                                    noise_seed=2)
        on_tpu = jax.default_backend() not in ("cpu",)
        for family in args.vocoder_families.split(","):
            family = family.strip()
            print(f"== GAN-training {family} on the tone corpus ==")
            t0 = time.time()
            gen_params, vcfg = train_vocoder_gan(
                family, train_wavs, a, steps=args.vocoder_steps,
                batch=args.vocoder_batch, segment=args.segment)
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
                        for h in w["hypotheses"]:
                            print(f"  hyp: {h}")
                # vocoder-only damage: resynthesize ground-truth mels
                w = vocoded_wer(gt_mel_held, gt_lens_held, HELD_OUT,
                                gen_params, mcfg, a, asr_fn,
                                denoise_strength=dstr, dtype=dt)
                results[f"wer_wav_{family}_{mode}_gtmel"] = w["mean_wer"]
                print(f"wer_wav_{family}_{mode}_gtmel: {w['mean_wer']:.4f}")

    if args.eval_grid:
        for nfe in (4, 10, 32):
            for temp in (0.0, 0.3, 0.667):
                r = synth_wer(params, cfg, asr_params, asr_cfg, HELD_OUT,
                              text_bucket, frame_bucket, nfe, temp)
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
        # golden held-out synth mels at a fixed seed (regression anchors)
        x, xl = _tokens(HELD_OUT, text_bucket)
        g = _synth(params, jax.random.PRNGKey(7), x, xl, cfg, args.nfe,
                   frame_bucket, args.temperature)
        np.savez_compressed(
            out / "goldens.npz",
            mel=np.asarray(g.mel, np.float32),
            y_lengths=np.asarray(g.y_lengths, np.int32),
            texts=np.array(HELD_OUT), nfe=np.int32(args.nfe),
            temperature=np.float32(args.temperature),
            wer_synth_heldout=np.float32(results["wer_synth_heldout"]))
        print(f"artifacts written to {out}")

    print(json.dumps(results))
    return results


if __name__ == "__main__":
    main()
