"""XLA vs flash attention at the U-Net's exact shapes (batched synthesis).

docs/RESULTS.md flags the batch-32 non-vocoder graph at ~29% MFU; the
materialized (B, H, T, T) attention scores are the largest identified
HBM cost.  This microbench times one transformer-block attention at the
U-Net shapes (T=768 full res, T=384 half res) for both implementations,
chained-iteration method, plus a correctness check on valid rows.

Usage: python benchmarks/attn_bench.py [--batch 32] [--dtype bfloat16]
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
HEADS, DIM_HEAD = 2, 64


def chained_time(f, n_samples: int = 3) -> float:
    float(f(jax.random.PRNGKey(0)))
    ts = []
    for s in range(1, n_samples + 1):
        t0 = time.perf_counter()
        float(f(jax.random.PRNGKey(s)))
        ts.append((time.perf_counter() - t0) / CHAIN)
    return float(np.median(ts))


def xla_attn(q, k, v, key_mask, scale):
    sim = jnp.einsum("bihd,bjhd->bhij", q, k) * scale
    neg = jnp.finfo(sim.dtype).min
    sim = jnp.where(key_mask[:, None, None, :] == 0, neg, sim)
    attn = jax.nn.softmax(sim, axis=-1)
    b, t = q.shape[0], q.shape[1]
    return jnp.einsum("bhij,bjhd->bihd", attn, v).reshape(b, t, -1)


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=32)
    p.add_argument("--dtype", default="bfloat16",
                   choices=("float32", "bfloat16"))
    args = p.parse_args(argv)

    from matcha_tts_tpu.ops.pallas.attention import flash_mha
    from matcha_tts_tpu.ops.pallas.attn_vmem import vmem_mha

    dt = jnp.dtype(args.dtype)
    scale = DIM_HEAD ** -0.5
    rng = np.random.default_rng(0)
    results = {}

    for t in (768, 384):
        b = args.batch
        q = jnp.asarray(rng.standard_normal((b, t, HEADS, DIM_HEAD)), dt)
        k = jnp.asarray(rng.standard_normal((b, t, HEADS, DIM_HEAD)), dt)
        v = jnp.asarray(rng.standard_normal((b, t, HEADS, DIM_HEAD)), dt)
        lengths = rng.integers(t // 2, t + 1, size=(b,))
        key_mask = jnp.asarray(
            (np.arange(t)[None, :] < lengths[:, None]).astype(np.float32))

        # correctness on valid rows
        o_x = np.asarray(xla_attn(q, k, v, key_mask, scale), np.float32)
        o_f = np.asarray(flash_mha(q, k, v, key_mask, sm_scale=scale),
                         np.float32)
        valid = np.asarray(key_mask)[:, :, None].astype(bool)
        diff = float(np.abs(np.where(valid, o_x - o_f, 0.0)).max())
        results[f"t{t}_maxdiff_valid"] = diff
        o_m = np.asarray(vmem_mha(q, k, v, key_mask, sm_scale=scale),
                         np.float32)
        results[f"t{t}_vmem_maxdiff_all"] = float(np.abs(o_x - o_m).max())

        @jax.jit
        def xla_chain(key, q=q, k=k, v=v, key_mask=key_mask):
            def body(i, carry):
                acc, _ = carry
                o = xla_attn(q + (acc * 0).astype(dt), k, v, key_mask, scale)
                return acc + jnp.sum(o.astype(jnp.float32)), key
            acc, _ = jax.lax.fori_loop(0, CHAIN, body, (jnp.float32(0), key))
            return acc

        @jax.jit
        def flash_chain(key, q=q, k=k, v=v, key_mask=key_mask):
            def body(i, carry):
                acc, _ = carry
                o = flash_mha(q + (acc * 0).astype(dt), k, v, key_mask,
                              sm_scale=scale)
                return acc + jnp.sum(o.astype(jnp.float32)), key
            acc, _ = jax.lax.fori_loop(0, CHAIN, body, (jnp.float32(0), key))
            return acc

        @jax.jit
        def vmem_chain(key, q=q, k=k, v=v, key_mask=key_mask):
            def body(i, carry):
                acc, _ = carry
                o = vmem_mha(q + (acc * 0).astype(dt), k, v, key_mask,
                             sm_scale=scale)
                return acc + jnp.sum(o.astype(jnp.float32)), key
            acc, _ = jax.lax.fori_loop(0, CHAIN, body, (jnp.float32(0), key))
            return acc

        results[f"t{t}_xla_ms"] = round(chained_time(xla_chain) * 1e3, 3)
        results[f"t{t}_flash_ms"] = round(chained_time(flash_chain) * 1e3, 3)
        results[f"t{t}_vmem_ms"] = round(chained_time(vmem_chain) * 1e3, 3)

    out = {"batch": args.batch, "dtype": args.dtype, "heads": HEADS,
           "dim_head": DIM_HEAD, **results}
    print(json.dumps(out))
    return out


if __name__ == "__main__":
    main()
