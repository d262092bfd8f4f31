"""Train-step stage breakdown: where do the 41 ms go?

docs/RESULTS.md puts the full train step at 13.6% MFU (fp32) — far below
the batch-32 inference graph's 47%.  This harness times each stage of the
training forward (reference semantics: train_standalone.py:623-667) with
the chained-iteration method so the MAS scan, the encoder, and the U-Net
fwd+bwd can be attributed separately.

Usage: python benchmarks/train_breakdown.py [--batch 32] [--t-x 256]
       [--t-y 768] [--dtype bfloat16]
"""

from __future__ import annotations

import argparse
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

CHAIN = 8


def chained_time(f, *args, n_samples: int = 3) -> float:
    float(f(jax.random.PRNGKey(0), *args))  # compile + warm
    ts = []
    for s in range(1, n_samples + 1):
        t0 = time.perf_counter()
        float(f(jax.random.PRNGKey(s), *args))
        ts.append((time.perf_counter() - t0) / CHAIN)
    return float(np.median(ts))


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=32)
    p.add_argument("--t-x", type=int, default=256)
    p.add_argument("--t-y", type=int, default=768)
    p.add_argument("--dtype", default="bfloat16",
                   choices=("float32", "bfloat16"))
    args = p.parse_args(argv)

    from matcha_tts_tpu.config import MatchaConfig, TrainConfig
    from matcha_tts_tpu.models import cfm
    from matcha_tts_tpu.models.matcha import estimator_fn, init_matcha
    from matcha_tts_tpu.models.text_encoder import text_encoder
    from matcha_tts_tpu.ops.mas import maximum_path
    from matcha_tts_tpu.ops.masking import sequence_mask
    from matcha_tts_tpu.train.losses import log_gaussian_prior, matcha_losses
    from matcha_tts_tpu.train.train_state import create_train_state, train_step

    cfg = MatchaConfig()
    tcfg = TrainConfig(batch_size=args.batch,
                       mixed_precision=args.dtype == "bfloat16")
    params = init_matcha(jax.random.PRNGKey(0), cfg)

    rng = np.random.default_rng(0)
    b, t_x, t_y = args.batch, args.t_x, args.t_y
    x = jnp.asarray(rng.integers(1, cfg.n_vocab, size=(b, t_x)), jnp.int32)
    xl = jnp.asarray(rng.integers(t_x // 2, t_x + 1, size=(b,)), jnp.int32)
    y = jnp.asarray(rng.standard_normal((b, t_y, cfg.encoder.n_feats)),
                    jnp.float32)
    yl = jnp.asarray(rng.integers(t_y // 2, t_y + 1, size=(b,)), jnp.int32)
    batch = {"x": x, "x_lengths": xl, "y": y, "y_lengths": yl}

    x_mask = sequence_mask(xl, t_x).astype(jnp.float32)
    y_mask = sequence_mask(yl, t_y).astype(jnp.float32)
    attn_mask = x_mask[:, :, None] * y_mask[:, None, :]
    mu_fake = jnp.asarray(
        rng.standard_normal((b, t_x, cfg.encoder.n_feats)), jnp.float32)
    log_prior = log_gaussian_prior(mu_fake, y, cfg.encoder.n_feats)
    log_prior = jax.device_put(log_prior)

    results = {}

    # --- MAS alone ---------------------------------------------------------
    @jax.jit
    def mas_chain(key):
        def body(i, carry):
            acc, _ = carry
            path = maximum_path(log_prior + (acc * 0), attn_mask)
            return acc + jnp.sum(path), key
        acc, _ = jax.lax.fori_loop(0, CHAIN, body, (jnp.float32(0), key))
        return acc

    results["mas_ms"] = chained_time(mas_chain) * 1e3

    # --- log-prior matmuls alone ------------------------------------------
    @jax.jit
    def prior_chain(key):
        def body(i, carry):
            acc, _ = carry
            lp = log_gaussian_prior(mu_fake + (acc * 0), y, cfg.encoder.n_feats)
            return acc + jnp.sum(lp), key
        acc, _ = jax.lax.fori_loop(0, CHAIN, body, (jnp.float32(0), key))
        return acc

    results["log_prior_ms"] = chained_time(prior_chain) * 1e3

    # --- encoder forward ---------------------------------------------------
    cd = jnp.dtype(args.dtype)

    @jax.jit
    def enc_chain(key):
        def body(i, carry):
            acc, _ = carry
            mu, logw, m = text_encoder(params["encoder"],
                                       x + (acc * 0).astype(jnp.int32), xl,
                                       cfg.encoder, cfg.duration_predictor,
                                       compute_dtype=cd)
            return acc + jnp.sum(mu.astype(jnp.float32)), key
        acc, _ = jax.lax.fori_loop(0, CHAIN, body, (jnp.float32(0), key))
        return acc

    results["encoder_fwd_ms"] = chained_time(enc_chain) * 1e3

    # --- U-Net estimator: fwd, and fwd+bwd --------------------------------
    est = estimator_fn(params, cfg)
    z0 = jnp.asarray(rng.standard_normal((b, t_y, cfg.encoder.n_feats)),
                     jnp.float32)
    mu_y = jnp.asarray(rng.standard_normal((b, t_y, cfg.encoder.n_feats)),
                       jnp.float32)

    @jax.jit
    def est_chain(key):
        def body(i, carry):
            acc, _ = carry
            v = est((z0 + acc * 0).astype(cd), y_mask, mu_y.astype(cd),
                    jnp.full((b,), 0.5, cd))
            return acc + jnp.sum(v.astype(jnp.float32)), key
        acc, _ = jax.lax.fori_loop(0, CHAIN, body, (jnp.float32(0), key))
        return acc

    results["estimator_fwd_ms"] = chained_time(est_chain) * 1e3

    def cfm_loss_of(p, z):
        e = estimator_fn(p, cfg)
        loss, _, _, _ = cfm.compute_loss(e, jax.random.PRNGKey(2), y, y_mask,
                                         mu_y + z, sigma_min=cfg.cfm.sigma_min,
                                         compute_dtype=args.dtype)
        return loss

    @jax.jit
    def cfm_grad_chain(key):
        def body(i, carry):
            acc, _ = carry
            # fold the gradient into the accumulator so XLA cannot
            # dead-code-eliminate the backward pass
            loss, g = jax.value_and_grad(cfm_loss_of)(params, acc * 0)
            gsum = sum(jnp.sum(leaf.astype(jnp.float32))
                       for leaf in jax.tree.leaves(g))
            return acc + loss + 0.0 * gsum, key
        acc, _ = jax.lax.fori_loop(0, CHAIN, body, (jnp.float32(0), key))
        return acc

    results["cfm_fwd_bwd_ms"] = chained_time(cfm_grad_chain) * 1e3

    # --- full losses fwd ---------------------------------------------------
    @jax.jit
    def losses_chain(key):
        def body(i, carry):
            acc, _ = carry
            out = matcha_losses(params, jax.random.fold_in(key, i),
                                x + (acc * 0).astype(jnp.int32), xl, y, yl,
                                cfg, train=True, compute_dtype=args.dtype)
            return acc + out.total, key
        acc, _ = jax.lax.fori_loop(0, CHAIN, body, (jnp.float32(0), key))
        return acc

    results["losses_fwd_ms"] = chained_time(losses_chain) * 1e3

    # --- full train step (fwd+bwd+Adam), state-chained --------------------
    state = create_train_state(params, tcfg)
    state, metrics = train_step(state, jax.random.PRNGKey(1), batch, cfg, tcfg)
    # fetch, don't block_until_ready: the tunneled backend returns from
    # block_until_ready before execution finishes (CLAUDE.md hazard)
    float(metrics["loss"])
    ts = []
    for s in range(3):
        t0 = time.perf_counter()
        for _ in range(CHAIN):
            state, metrics = train_step(state, jax.random.PRNGKey(s), batch,
                                        cfg, tcfg)
        float(metrics["loss"])
        ts.append((time.perf_counter() - t0) / CHAIN)
    results["train_step_ms"] = float(np.median(ts)) * 1e3

    out = {"batch": b, "t_x": t_x, "t_y": t_y, "dtype": args.dtype,
           "chain": CHAIN, **{k: round(v, 3) for k, v in results.items()}}
    print(json.dumps(out))
    return out


if __name__ == "__main__":
    main()
