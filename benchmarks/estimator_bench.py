"""U-Net estimator forward at batch: XLA vs fused-Block1D Pallas path.

Round-1 measured the fused conv+GroupNorm+Mish kernel ~5% SLOWER than
XLA at batch 1 (docs/RESULTS.md "Kernel experiments"); the batched MFU
work re-opens the question at batch 8/32 where HBM round trips between
conv and norm cost relatively more.

Usage: python benchmarks/estimator_bench.py [--batch 32] [--frames 768]
       [--dtype bfloat16] [--use-pallas] [--attention-impl auto]
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

CHAIN = 8


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=32)
    p.add_argument("--frames", type=int, default=768)
    p.add_argument("--dtype", default="bfloat16",
                   choices=("float32", "bfloat16"))
    p.add_argument("--use-pallas", action="store_true")
    p.add_argument("--attention-impl", default=None,
                   help="override DecoderConfig.attention_impl "
                        "(xla | flash | auto)")
    p.add_argument("--block1d-impl", default=None,
                   help="override DecoderConfig.block1d_impl "
                        "(xla | pallas | auto)")
    args = p.parse_args(argv)

    from matcha_tts_tpu.config import MatchaConfig
    from matcha_tts_tpu.models.matcha import estimator_fn, init_matcha
    from matcha_tts_tpu.ops.masking import sequence_mask

    cfg = MatchaConfig()
    dec = dataclasses.replace(cfg.decoder, use_pallas=args.use_pallas)
    if args.attention_impl is not None:
        dec = dataclasses.replace(dec, attention_impl=args.attention_impl)
    if args.block1d_impl is not None:
        dec = dataclasses.replace(dec, block1d_impl=args.block1d_impl)
    cfg = dataclasses.replace(cfg, decoder=dec)

    params = init_matcha(jax.random.PRNGKey(0), cfg)
    est = estimator_fn(params, cfg)

    dt = jnp.dtype(args.dtype)
    rng = np.random.default_rng(0)
    b, t_y = args.batch, args.frames
    z = jnp.asarray(rng.standard_normal((b, t_y, cfg.encoder.n_feats)), dt)
    mu = jnp.asarray(rng.standard_normal((b, t_y, cfg.encoder.n_feats)), dt)
    yl = jnp.asarray(rng.integers(t_y // 2, t_y + 1, size=(b,)), jnp.int32)
    mask = sequence_mask(yl, t_y).astype(dt)
    t = jnp.full((b,), 0.5, dt)

    @jax.jit
    def chain(key):
        def body(i, carry):
            acc, _ = carry
            v = est(z + (acc * 0).astype(dt), mask, mu, t)
            return acc + jnp.sum(v.astype(jnp.float32)), key
        acc, _ = jax.lax.fori_loop(0, CHAIN, body, (jnp.float32(0), key))
        return acc

    float(chain(jax.random.PRNGKey(0)))
    ts = []
    for s in range(1, 4):
        t0 = time.perf_counter()
        float(chain(jax.random.PRNGKey(s)))
        ts.append((time.perf_counter() - t0) / CHAIN)

    out = {"batch": b, "frames": t_y, "dtype": args.dtype,
           "use_pallas": args.use_pallas,
           "attention_impl": args.attention_impl or "default",
           "block1d_impl": args.block1d_impl or "default",
           "estimator_fwd_ms": round(float(np.median(ts)) * 1e3, 3)}
    print(json.dumps(out))
    return out


if __name__ == "__main__":
    main()
