"""Multi-speaker training + synthesis, executed end to end on hardware.

The reference supports multi-speaker models via a speaker-embedding
concat (model.py:527-528,977-979) and a `wav|spk|text` filelist format
(train_standalone.py:604-628), but the rebuild had only ever run
multi-speaker code through losses and synthesis unit tests.  This
harness proves the whole path with REAL training:

  1. a 3-speaker tone corpus: the character-coded chords of
     benchmarks/wer_e2e.py, with every frequency scaled per speaker
     (x0.85 / x1.00 / x1.18) — speaker identity is a measurable
     spectral property of the audio;
  2. `fit()` over a `wav|spk|text` filelist with an n_spks=3 config —
     the spk ids flow host batcher -> losses -> spk embedding;
  3. convergence: dur/prior/cfm losses at start vs end;
  4. identity: synthesize the SAME held-out text as each speaker and
     check the mel spectral centroid ORDERS with the speaker's
     frequency scale — the embedding must carry pitch, not noise.

Usage: python benchmarks/multispeaker_e2e.py [--train-steps 1500]
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax

jax.config.update("jax_compilation_cache_dir",
                  str(Path(__file__).resolve().parent.parent / ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
import numpy as np

from benchmarks.distill_e2e import CORPUS, _tokens
from benchmarks.wer_e2e import SR, render_text
from matcha_tts_tpu.config import (DecoderConfig, DurationPredictorConfig,
                                   EncoderConfig, MatchaConfig, TrainConfig)
from matcha_tts_tpu.models.matcha import synthesize
from matcha_tts_tpu.train.loop import fit
from matcha_tts_tpu.utils.wav import write_wav

SPEAKER_SCALES = (0.85, 1.0, 1.18)  # per-speaker frequency multiplier


def render_speaker(text: str, scale: float, rng) -> np.ndarray:
    """Pitch-scaled character chords: resample the base rendering's
    frequency axis by rendering with scaled tone tables."""
    import benchmarks.tone_corpus as w  # the tone tables live here now

    # scale the module's tone tables for this rendering only
    saved = (w.ROW_HZ, w.COL_HZ, w.SPACE_HZ)
    try:
        w.ROW_HZ = tuple(f * scale for f in saved[0])
        w.COL_HZ = tuple(f * scale for f in saved[1])
        w.SPACE_HZ = saved[2] * scale
        return render_text(text, rng)
    finally:
        w.ROW_HZ, w.COL_HZ, w.SPACE_HZ = saved


def make_multispeaker_corpus(root: Path, sentences, seed: int = 0):
    """Write wavs + `wav|spk|text` train/val filelists (the reference's
    multi-speaker filelist format, train_standalone.py:604-628)."""
    root.mkdir(parents=True, exist_ok=True)
    (root / "wavs").mkdir(exist_ok=True)
    rng = np.random.default_rng(seed)
    lines = []
    for spk, scale in enumerate(SPEAKER_SCALES):
        for i, text in enumerate(sentences):
            name = f"spk{spk}_utt{i:02d}.wav"
            write_wav(root / "wavs" / name,
                      render_speaker(text, scale, rng), SR)
            lines.append(f"{root / 'wavs' / name}|{spk}|{text}")
    rng.shuffle(lines)
    n_val = max(1, len(lines) // 10)
    (root / "train.txt").write_text("\n".join(lines[:-n_val]) + "\n")
    (root / "val.txt").write_text("\n".join(lines[-n_val:]) + "\n")
    return root / "train.txt", root / "val.txt"


def spectral_centroid(mel: np.ndarray, n_frames: int) -> float:
    """Energy-weighted mean mel-bin index over valid frames.

    mel: (n_mels, T) log-mel.  Higher speaker frequency scale -> energy
    in higher mel bins -> larger centroid.
    """
    m = np.exp(mel[:, :n_frames])          # back to linear mel energy
    w = m / np.maximum(m.sum(axis=0, keepdims=True), 1e-12)
    bins = np.arange(mel.shape[0], dtype=np.float64)[:, None]
    return float((w * bins).sum(axis=0).mean())


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--data-root", default="/tmp/mspk_corpus")
    ap.add_argument("--work-dir", default="/tmp/mspk_e2e")
    ap.add_argument("--train-steps", type=int, default=1500)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--nfe", type=int, default=10)
    args = ap.parse_args(argv)

    # the tone renderer now gives characters variable durations, so take
    # the frame bound from the renderer itself instead of hardcoding
    from benchmarks.tone_corpus import max_frames

    text_bucket = 128
    frame_bucket = max(384, (max_frames(CORPUS) + 63) // 64 * 64)
    train_fl, val_fl = make_multispeaker_corpus(Path(args.data_root), CORPUS)

    # commit-sized preset (wer_e2e "small") + speaker embedding
    cfg = MatchaConfig(
        n_spks=len(SPEAKER_SCALES), spk_emb_dim=64,
        encoder=EncoderConfig(n_feats=80, n_channels=96,
                              filter_channels=256, n_heads=2, n_layers=2),
        duration_predictor=DurationPredictorConfig(filter_channels_dp=96),
        decoder=DecoderConfig(channels=(96, 96), attention_head_dim=48,
                              num_heads=2, n_blocks=1, num_mid_blocks=1),
    )
    from matcha_tts_tpu.data.statistics import compute_mel_statistics

    mean, std = compute_mel_statistics(train_fl, cfg.audio,
                                       frame_buckets=(frame_bucket,))
    cfg = dataclasses.replace(
        cfg, audio=dataclasses.replace(cfg.audio, mel_mean=mean,
                                       mel_std=std))

    tcfg = TrainConfig(batch_size=args.batch, text_buckets=(text_bucket,),
                       frame_buckets=(frame_bucket,), log_every_n_steps=100,
                       ckpt_every_n_steps=10**9)
    t0 = time.time()
    state = fit(cfg, tcfg, train_fl, val_fl, work_dir=f"{args.work_dir}/tts",
                max_steps=args.train_steps, resume=False)
    wall = time.time() - t0
    params = jax.device_get(state.params)

    # loss trajectory from the JSONL metrics log
    metrics_path = Path(args.work_dir) / "tts" / "metrics.jsonl"
    first = last = None
    if metrics_path.exists():
        for line in metrics_path.read_text().splitlines():
            rec = json.loads(line)
            if rec.get("split") == "train" and "loss" in rec:
                last = rec
                if first is None:
                    first = rec

    # identity check: same held-out text, one synthesis per speaker
    text = "the lighthouse keeper watched the storm"
    x, xl = _tokens([text] * len(SPEAKER_SCALES), text_bucket)
    out = synthesize(params, jax.random.PRNGKey(3), jnp.asarray(x),
                     jnp.asarray(xl), cfg, n_timesteps=args.nfe,
                     t_y_max=frame_bucket,
                     spks=jnp.arange(len(SPEAKER_SCALES), dtype=jnp.int32))
    mel = np.asarray(out.mel, np.float32)
    lens = np.asarray(out.y_lengths, np.int32)
    centroids = [spectral_centroid(mel[i], int(lens[i]))
                 for i in range(len(SPEAKER_SCALES))]
    ordered = bool(centroids[0] < centroids[1] < centroids[2])

    rec = {
        "metric": "multispeaker_e2e",
        "n_spks": len(SPEAKER_SCALES),
        "speaker_scales": list(SPEAKER_SCALES),
        "train_steps": args.train_steps,
        "train_wall_s": round(wall, 1),
        "loss_first": (round(first["loss"], 3) if first else None),
        "loss_last": (round(last["loss"], 3) if last else None),
        "dur_loss_first": (round(first["dur_loss"], 3) if first else None),
        "dur_loss_last": (round(last["dur_loss"], 3) if last else None),
        "spectral_centroids": [round(c, 3) for c in centroids],
        "centroids_ordered_by_speaker_scale": ordered,
    }
    print(json.dumps(rec))
    return rec


if __name__ == "__main__":
    main()
