"""Train-step stage breakdown: where do the 41 ms go?

docs/RESULTS.md puts the full train step at 13.6% MFU (fp32) — far below
the batch-32 inference graph's 47%.  This harness times each stage of the
training forward (reference semantics: train_standalone.py:623-667) with
the chained-iteration method so the MAS scan, the encoder, and the U-Net
fwd+bwd can be attributed separately.

`--parts` additionally attributes the opaque "CFM fwd+bwd" number to the
U-Net's components at their real shapes (resnet blocks, transformer
blocks, attention alone, the optimizer) — fwd and fwd+bwd each — with
analytic matmul-FLOP speed-of-light bounds, so the backward pass can be
judged against the v5e bf16 peak instead of hand-waved.

Usage: python benchmarks/train_breakdown.py [--batch 32] [--t-x 256]
       [--t-y 768] [--dtype bfloat16] [--parts]
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


V5E_BF16_PEAK_TFLOPS = 197.0


def _fold_tree(tree):
    return sum(jnp.sum(leaf.astype(jnp.float32))
               for leaf in jax.tree.leaves(tree))


# Per-part work is sub-millisecond at batch 32, so parts chain far more
# iterations than the stage breakdown: at CHAIN=8 the ~28 ms
# dispatch+fetch call floor is ~3.5 ms/iter — bigger than the parts
# themselves (first measurement attempt produced negative bwd/fwd).
PART_CHAIN = 64


def _part_chained_time(f, n_samples: int = 3) -> float:
    float(f(jax.random.PRNGKey(0)))  # compile + warm
    ts = []
    for s in range(1, n_samples + 1):
        t0 = time.perf_counter()
        float(f(jax.random.PRNGKey(s)))
        ts.append((time.perf_counter() - t0) / PART_CHAIN)
    return float(np.median(ts))


def part_times(fn, params, x, *extra, n_samples: int = 3):
    """(fwd_ms, fwd+bwd_ms) for `fn(params, x, *extra)` with the chained
    method; bwd is wrt params (the training direction)."""

    def loss(p, z):
        return jnp.sum(fn(p, x + z, *extra).astype(jnp.float32))

    @jax.jit
    def fwd_chain(key):
        def body(i, acc):
            return acc + loss(params, (acc * 0).astype(x.dtype))
        return jax.lax.fori_loop(0, PART_CHAIN, body, jnp.float32(0))

    @jax.jit
    def fb_chain(key):
        def body(i, acc):
            l, g = jax.value_and_grad(loss)(params,
                                            (acc * 0).astype(x.dtype))
            return acc + l + 0.0 * _fold_tree(g)
        return jax.lax.fori_loop(0, PART_CHAIN, body, jnp.float32(0))

    return (_part_chained_time(fwd_chain, n_samples=n_samples) * 1e3,
            _part_chained_time(fb_chain, n_samples=n_samples) * 1e3)


def run_parts(args, results):
    """Per-component U-Net attribution at training shapes (bf16)."""
    from matcha_tts_tpu.config import MatchaConfig, TrainConfig
    from matcha_tts_tpu.models import unet
    from matcha_tts_tpu.models.text_encoder import text_encoder
    from matcha_tts_tpu.train.train_state import make_optimizer

    cfg = MatchaConfig()
    dc = cfg.decoder
    cd = jnp.dtype(args.dtype)
    b, t_y = args.batch, args.t_y
    c = dc.channels[0]                      # 256
    time_dim = c * 4
    heads, dim_head = dc.num_heads, dc.attention_head_dim
    inner = heads * dim_head
    rng = np.random.default_rng(1)
    key = jax.random.PRNGKey(0)

    def bf(a):
        return jnp.asarray(a, cd)

    def cast(p):
        return jax.tree.map(lambda a: a.astype(cd), p)

    mask768 = jnp.ones((b, t_y), cd)
    mask384 = jnp.ones((b, t_y // 2), cd)
    t_emb = bf(rng.standard_normal((b, time_dim)))

    # trivial-op chain: the per-iteration dispatch+fetch floor to subtract
    @jax.jit
    def trivial_chain(key):
        def body(i, acc):
            return acc + jnp.float32(1.0) + acc * 0
        return jax.lax.fori_loop(0, PART_CHAIN, body, jnp.float32(0))

    floor_ms = _part_chained_time(trivial_chain) * 1e3
    results["parts_dispatch_floor_ms"] = floor_ms

    # FLOP helpers (matmul FLOPs only; norms/activations are bandwidth)
    def conv_f(t, ci, co, k=3):
        return 2 * b * t * k * ci * co

    def lin_f(t, ci, co):
        return 2 * b * t * ci * co

    def resnet_f(t, ci, co):
        return conv_f(t, ci, co) + conv_f(t, co, co) + conv_f(t, ci, co, 1)

    def attn_f(t):
        # q/k/v/out projections + 2 einsums over T^2
        return 3 * lin_f(t, c, inner) + lin_f(t, inner, c) \
            + 4 * b * t * t * inner

    def tb_f(t):
        return attn_f(t) + lin_f(t, c, 4 * c) + lin_f(t, 4 * c, c)

    parts = []  # (name, fn, params, x, extra, fwd_flops)

    def add_resnet(name, t, ci, mask):
        p = cast(unet.init_resnet_block1d(key, ci, c, time_dim))
        x = bf(rng.standard_normal((b, t, ci)))
        parts.append((name, unet.resnet_block1d, p, x, (mask, t_emb),
                      resnet_f(t, ci, c)))

    def add_tb(name, t, mask):
        p = cast(unet.init_transformer_block(key, c, heads, dim_head))
        x = bf(rng.standard_normal((b, t, c)))
        fn = functools.partial(unet.transformer_block, heads=heads,
                               dim_head=dim_head)
        parts.append((name, fn, p, x, (mask,), tb_f(t)))

    def add_attn(name, t, mask):
        p = cast(unet.init_attention(key, c, heads, dim_head))
        x = bf(rng.standard_normal((b, t, c)))
        fn = functools.partial(unet.attention, heads=heads,
                               dim_head=dim_head)
        parts.append((name, fn, p, x, (mask,), attn_f(t)))

    def add_ff(name, t, remat, snake_impl="xla"):
        p = cast(unet.init_feed_forward(key, c))
        x = bf(rng.standard_normal((b, t, c)))
        fn = functools.partial(unet.feed_forward, snake_impl=snake_impl)
        if remat:
            fn = jax.checkpoint(fn)
        parts.append((name, fn, p, x, (),
                      lin_f(t, c, 4 * c) + lin_f(t, 4 * c, c)))

    t_half = t_y // 2
    add_resnet(f"resnet_in160_t{t_y}", t_y, 2 * cfg.encoder.n_feats, mask768)
    add_resnet(f"resnet_c256_t{t_half}", t_half, c, mask384)
    add_resnet(f"resnet_skip512_t{t_half}", t_half, 2 * c, mask384)
    add_resnet(f"resnet_skip512_t{t_y}", t_y, 2 * c, mask768)
    add_tb(f"tblock_t{t_y}", t_y, mask768)
    add_tb(f"tblock_t{t_half}", t_half, mask384)
    add_attn(f"attn_t{t_y}", t_y, mask768)
    add_attn(f"attn_t{t_half}", t_half, mask384)
    # the tblock deficit is the SnakeBeta FF (attn alone is 41-73% MFU):
    # time it directly, plus a remat variant that drops the (B, T, 4C)
    # intermediate saves and recomputes the activation in backward
    add_ff(f"snakeff_t{t_y}", t_y, remat=False)
    add_ff(f"snakeff_remat_t{t_y}", t_y, remat=True)
    # identity-rewrite custom VJP (all transcendentals in forward,
    # backward is multiply-adds over a saved sin(2ax)) — VERDICT r3 #5
    add_ff(f"snakeff_fused_t{t_y}", t_y, remat=False,
           snake_impl="fused_vjp")

    # text encoder fwd+bwd at its real shapes
    from matcha_tts_tpu.models.matcha import init_matcha

    full = init_matcha(jax.random.PRNGKey(0), cfg)
    x_tok = jnp.asarray(rng.integers(1, cfg.n_vocab, size=(b, args.t_x)),
                        jnp.int32)
    xl = jnp.asarray(np.full((b,), args.t_x), jnp.int32)

    def enc_fn(p, tok, lengths):
        mu, logw, m = text_encoder(p, tok, lengths, cfg.encoder,
                                   cfg.duration_predictor, compute_dtype=cd)
        return mu.astype(jnp.float32) + 0.0 * jnp.sum(logw)

    def enc_loss(p, z):
        return jnp.sum(enc_fn(p, x_tok + z.astype(jnp.int32), xl))

    @jax.jit
    def enc_fb_chain(key):
        def body(i, acc):
            l, g = jax.value_and_grad(enc_loss)(full["encoder"], acc * 0)
            return acc + l + 0.0 * _fold_tree(g)
        return jax.lax.fori_loop(0, PART_CHAIN, body, jnp.float32(0))

    results["parts_encoder_fwd_bwd_ms"] = round(
        _part_chained_time(enc_fb_chain) * 1e3, 3)

    # optimizer alone (clip-by-global-norm + Adam on the 18M tree)
    tcfg = TrainConfig(batch_size=b)
    tx = make_optimizer(tcfg)
    opt_state = tx.init(full)
    grads = jax.tree.map(lambda a: jnp.ones_like(a) * 1e-4, full)

    @jax.jit
    def opt_chain(key):
        def body(i, carry):
            acc, os = carry
            g = jax.tree.map(lambda a: a + acc * 0, grads)
            updates, os = tx.update(g, os, full)
            return acc + _fold_tree(updates) * 0 + 1.0, os
        acc, _ = jax.lax.fori_loop(0, PART_CHAIN, body,
                                   (jnp.float32(0), opt_state))
        return acc

    results["parts_optimizer_ms"] = round(
        _part_chained_time(opt_chain) * 1e3, 3)

    print(f"{'part':24s} {'fwd ms':>8s} {'f+b ms':>8s} {'bwd/fwd':>8s} "
          f"{'f+b TF/s':>9s} {'MFU%':>6s}  (floor {floor_ms:.2f} ms "
          f"subtracted)", file=sys.stderr)
    for name, fn, p, x, extra, fflops in parts:
        fwd_ms, fb_ms = part_times(fn, p, x, *extra)
        fwd_d = max(fwd_ms - floor_ms, 1e-3)
        fb_d = max(fb_ms - floor_ms, 1e-3)
        tfs = 3 * fflops / fb_d / 1e9   # fwd+bwd ~ 3x fwd matmul FLOPs
        mfu = 100.0 * tfs / V5E_BF16_PEAK_TFLOPS
        results[f"part_{name}_fwd_ms"] = round(fwd_ms, 3)
        results[f"part_{name}_fwd_bwd_ms"] = round(fb_ms, 3)
        print(f"{name:24s} {fwd_d:8.2f} {fb_d:8.2f} "
              f"{(fb_d - fwd_d) / fwd_d:8.2f} {tfs:9.1f} {mfu:6.1f}",
              file=sys.stderr)


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=32)
    p.add_argument("--t-x", type=int, default=256)
    p.add_argument("--t-y", type=int, default=768)
    p.add_argument("--dtype", default="bfloat16",
                   choices=("float32", "bfloat16"))
    p.add_argument("--parts", action="store_true",
                   help="per-component U-Net fwd/bwd attribution + SOL")
    p.add_argument("--parts-only", action="store_true",
                   help="skip the stage breakdown, run only --parts")
    args = p.parse_args(argv)

    if args.parts_only:
        results = {}
        run_parts(args, results)
        out = {"batch": args.batch, "t_x": args.t_x, "t_y": args.t_y,
               "dtype": args.dtype, "chain": CHAIN, **results}
        print(json.dumps(out))
        return out

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

    results = {k: round(v, 3) for k, v in results.items()}
    if args.parts:
        run_parts(args, results)
    out = {"batch": b, "t_x": t_x, "t_y": t_y, "dtype": args.dtype,
           "chain": CHAIN, **results}
    print(json.dumps(out))
    return out


if __name__ == "__main__":
    main()
