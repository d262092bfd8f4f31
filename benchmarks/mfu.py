"""FLOP accounting + MFU for the inference and training graphs.

BASELINE.md's north star is "batched synthesis saturating the MXU" — this
quantifies it.  FLOPs come from XLA's own cost analysis of the lowered
batch-1 graphs on the CPU backend (which always takes the pure-XLA path:
no Pallas custom calls, whose FLOPs cost analysis cannot see).  FLOPs
scale linearly in batch for every component (the attention T^2 term is in
frames, not batch), so batch-N numbers are batch-1 x N.

Combine with measured device times (benchmarks/rtf.py / train_bench.py)
either via --times-json '{"name": ms, ...}' or the defaults recorded in
docs/RESULTS.md, and report achieved TFLOP/s + MFU against the v5e peak
(197 bf16 TFLOP/s).

Usage:
  python benchmarks/mfu.py                  # FLOPs only (runs on CPU)
  python benchmarks/mfu.py --times-json '{"full_nfe10": 12.9, ...}'
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")

import jax

jax.config.update("jax_platforms", "cpu")  # axon plugin ignores the env var

import jax.numpy as jnp
import numpy as np

V5E_PEAK_BF16 = 197e12  # TFLOP/s, one v5e chip
V5E_HBM_BW = 819e9      # bytes/s, one v5e chip


def graph_costs(fn, *args) -> dict:
    """XLA-estimated FLOPs + bytes accessed of one execution of `fn(*args)`.

    Bytes come from the CPU lowering's cost analysis — an approximation of
    TPU HBM traffic (fusion decisions differ), good enough to say which
    side of the roofline a graph sits on."""
    compiled = jax.jit(fn).lower(*args).compile()
    ca = compiled.cost_analysis()
    if isinstance(ca, (list, tuple)):
        ca = ca[0]
    return {"flops": float(ca["flops"]),
            "bytes": float(ca.get("bytes accessed", 0.0))}



def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--tokens", type=int, default=256)
    p.add_argument("--frames", type=int, default=768)
    p.add_argument("--nfe", type=int, default=10)
    p.add_argument("--times-json", type=str, default=None,
                   help='measured ms per graph, e.g. \'{"full_nfe10": 12.9,'
                        ' "vocoder": 10.8, "train_step_b32": 51.1}\'')
    args = p.parse_args(argv)

    from matcha_tts_tpu.config import HiFiGANConfig, MatchaConfig, TrainConfig
    from matcha_tts_tpu.inference.synthesizer import _synthesize_to_wav
    from matcha_tts_tpu.models import hifigan
    from matcha_tts_tpu.models.matcha import init_matcha
    from matcha_tts_tpu.models.text_encoder import text_encoder
    from matcha_tts_tpu.models.unet import decoder as unet_decoder
    from matcha_tts_tpu.train.train_state import create_train_state, train_step

    cfg, hcfg = MatchaConfig(), HiFiGANConfig()
    params = init_matcha(jax.random.PRNGKey(0), cfg)
    voc = hifigan.init_generator(jax.random.PRNGKey(1), hcfg)

    t_x, t_y, nfe = args.tokens, args.frames, args.nfe
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.integers(1, cfg.n_vocab, size=(1, t_x)), jnp.int32)
    xl = jnp.asarray([t_x - 8], jnp.int32)
    mel = jnp.asarray(rng.standard_normal((1, t_y, cfg.audio.n_mels)),
                      jnp.float32)
    mask = jnp.ones((1, t_y), jnp.float32)
    tt = jnp.asarray([0.5], jnp.float32)

    costs = {}
    costs["encoder"] = graph_costs(
        lambda x, xl: text_encoder(params["encoder"], x, xl, cfg.encoder,
                                   cfg.duration_predictor)[0], x, xl)
    costs["unet_pass"] = graph_costs(
        lambda z, m, mu, t: unet_decoder(
            params["decoder"]["estimator"], z, m, mu, t, cfg.decoder),
        mel, mask, mel, tt)
    costs["vocoder"] = graph_costs(
        lambda m: hifigan.generator(voc, m, hcfg), mel)
    costs[f"full_nfe{nfe}"] = graph_costs(
        lambda key: _synthesize_to_wav.__wrapped__(
            params, voc, key, x, xl, cfg, hcfg, nfe, t_y, 0.667, 1.0,
            None, "bfloat16")[1], jax.random.PRNGKey(0))

    from matcha_tts_tpu.config import VocosConfig
    from matcha_tts_tpu.models import vocos as vocos_mod

    vcfg = VocosConfig()
    vparams = vocos_mod.init_vocos(jax.random.PRNGKey(2), vcfg)
    costs["vocos"] = graph_costs(
        lambda m: vocos_mod.generate(vparams, m, vcfg), mel)

    tcfg = TrainConfig(batch_size=1)
    state = create_train_state(params, tcfg)
    batch = {
        "x": x, "x_lengths": xl,
        "y": mel, "y_lengths": jnp.asarray([t_y], jnp.int32),
    }
    # return the FULL (state, metrics) so XLA cannot dead-code-eliminate
    # the backward pass + optimizer update
    costs["train_step"] = graph_costs(
        lambda s, k, b: train_step(s, k, b, cfg, tcfg),
        state, jax.random.PRNGKey(1), batch)

    out = {"shapes": {"tokens": t_x, "frames": t_y, "batch": 1},
           "gflops": {k: round(v["flops"] / 1e9, 2) for k, v in costs.items()},
           "mbytes": {k: round(v["bytes"] / 1e6, 1) for k, v in costs.items()},
           # FLOPs per HBM byte; the v5e ridge point is peak/bw ≈ 240.
           # Below it a graph is bandwidth-bound even at perfect overlap.
           "arith_intensity": {
               k: round(v["flops"] / v["bytes"], 1)
               for k, v in costs.items() if v["bytes"]}}

    if args.times_json:
        times = json.loads(args.times_json)
        mfu = {}
        for name, ms in times.items():
            batch = 1
            base = name
            if "_b" in name:  # e.g. train_step_b32, full_nfe10_b8
                base, b = name.rsplit("_b", 1)
                batch = int(b)
            if base not in costs:
                continue
            achieved = costs[base]["flops"] * batch / (ms / 1e3)
            bw = costs[base]["bytes"] * batch / (ms / 1e3)
            mfu[name] = {"ms": ms,
                         "tflops_per_s": round(achieved / 1e12, 2),
                         "mfu_vs_bf16_peak": round(achieved / V5E_PEAK_BF16, 4),
                         "hbm_gb_per_s": round(bw / 1e9, 1),
                         "hbm_util": round(bw / V5E_HBM_BW, 4)}
        out["mfu"] = mfu

    print(json.dumps(out))
    return out


if __name__ == "__main__":
    main()
