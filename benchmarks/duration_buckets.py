"""Validate the adaptive frame-bucket heuristic against a TRAINED duration
model (VERDICT r1 weakness: bench.py fakes trained duration statistics with
length_scale=3 on random weights, so the Synthesizer's adaptive
frames-per-token estimate had never met a real duration predictor).

Pipeline (all on the attached TPU chip):
  1. train the full-size (18M) model on the synthetic harmonic corpus for
     --teacher-steps (reusing benchmarks/distill_e2e.py's corpus; the
     duration predictor genuinely converges against MAS alignments —
     docs/RESULTS.md "Training on hardware");
  2. run single-utterance synthesis over held-out texts with the trained
     weights at length_scale=1.0, starting from the cold FRAMES_PER_TOKEN
     prior, and count fused-graph calls vs heuristic undershoot retries
     (Synthesizer.stats);
  3. report the trained frames-per-token ratios, the converged adaptive
     estimate, and per-call frame-bucket utilization (valid frames /
     bucket frames — padding waste).

Pass criteria (asserted): at most one undershoot retry across the whole
run after the first utterance, and every utterance's exact predicted
length (encoder-only graph) fits the bucket the heuristic chose.

Usage:
  python benchmarks/duration_buckets.py [--teacher-steps 300]
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import numpy as np

jax.config.update("jax_compilation_cache_dir",
                  str(Path(__file__).resolve().parent.parent / ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from distill_e2e import CORPUS, HELD_OUT, make_corpus  # noqa: E402

from matcha_tts_tpu.config import HiFiGANConfig, MatchaConfig, TrainConfig
from matcha_tts_tpu.data.dataset import create_filelists
from matcha_tts_tpu.inference.synthesizer import Synthesizer
from matcha_tts_tpu.models import hifigan
from matcha_tts_tpu.train.loop import fit

# Mix of in-domain-length and longer texts: the adaptive estimate must
# carry from short utterances to longer ones without re-tripping.
EVAL_TEXTS = HELD_OUT + CORPUS[:4] + [
    "the museum exhibition featured paintings from the early renaissance "
    "period of italian art history and drew record crowds",
]


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--data-root", default="/tmp/distill_corpus")
    ap.add_argument("--work-dir", default="/tmp/duration_buckets")
    ap.add_argument("--teacher-steps", type=int, default=300)
    ap.add_argument("--batch", type=int, default=8)
    args = ap.parse_args(argv)

    root = Path(args.data_root)
    make_corpus(root)
    train_fl, val_fl = create_filelists(root, val_fraction=0.1)

    cfg = MatchaConfig()
    tcfg = TrainConfig(batch_size=args.batch, text_buckets=(128,),
                       frame_buckets=(384,), log_every_n_steps=50,
                       ckpt_every_n_steps=10**9)
    t0 = time.time()
    state = fit(cfg, tcfg, train_fl, val_fl, work_dir=args.work_dir,
                max_steps=args.teacher_steps, resume=False)
    params = jax.device_get(state.params)
    print(f"trained {args.teacher_steps} steps in {time.time() - t0:.0f}s",
          file=sys.stderr)

    hcfg = HiFiGANConfig()
    voc = hifigan.init_generator(jax.random.PRNGKey(1), hcfg)
    syn = Synthesizer(params, cfg, voc, hcfg, compute_dtype="bfloat16")

    per_text = []
    for i, text in enumerate(EVAL_TEXTS):
        ids = syn.tokenize(text)
        calls0 = syn.stats["calls"]
        retries0 = syn.stats["bucket_retries"]
        r = syn.synthesize(text, n_timesteps=10, seed=i)
        y_len = int(r.y_length)
        # exact predicted length via the encoder-only graph must fit the
        # bucket the packed result used
        import jax.numpy as jnp
        t_x = syn._bucket(len(ids), syn.text_buckets)
        x = np.zeros((1, t_x), np.int32)
        x[0, : len(ids)] = ids
        exact_bucket = syn.predict_frame_bucket(
            jnp.asarray(x), jnp.asarray([len(ids)], np.int32), 1.0)
        used_bucket = syn._bucket(y_len, syn.frame_buckets)
        per_text.append({
            "tokens": int(len(ids)),
            "y_length": y_len,
            "frames_per_token": round(y_len / len(ids), 3),
            "bucket": used_bucket,
            "exact_bucket": exact_bucket,
            "utilization": round(y_len / used_bucket, 3),
            "calls": syn.stats["calls"] - calls0,
            "retries": syn.stats["bucket_retries"] - retries0,
        })
        assert y_len <= used_bucket
        assert exact_bucket <= used_bucket, (
            "heuristic chose a smaller bucket than the exact predictor")

    fpt = [d["frames_per_token"] for d in per_text]
    retries = sum(d["retries"] for d in per_text)
    retries_after_first = sum(d["retries"] for d in per_text[1:])
    assert retries_after_first <= 1, per_text
    out = {
        "metric": "duration_bucket_heuristic",
        "texts": len(EVAL_TEXTS),
        "trained_steps": args.teacher_steps,
        "frames_per_token_min": min(fpt),
        "frames_per_token_max": max(fpt),
        "adaptive_estimate": round(syn._frames_per_token(), 3),
        "initial_prior": Synthesizer.FRAMES_PER_TOKEN,
        "total_retries": retries,
        "retries_after_first_text": retries_after_first,
        "mean_bucket_utilization": round(
            float(np.mean([d["utilization"] for d in per_text])), 3),
        "per_text": per_text,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
