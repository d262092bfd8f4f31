"""Feasibility probe: int8 MXU matmul throughput vs bf16 on this TPU.

v5e lists 394 int8 TOPs vs 197 bf16 TFLOP/s.  If int8 dots actually
lower to the MXU's int8 path here (axon plugin), quantizing the
HiFi-GAN vocoder — 82% of the synthesis FLOPs — could halve its MXU
time.  This probe times a vocoder-shaped matmul chain in both dtypes
before any quantization work is attempted.

Shapes mirror the packed MRF kernel's dots: (rows, 128) @ (128, 128)
with rows ~ a wav-rate tile, chained so the MXU dominates.

Usage: python benchmarks/int8_probe.py [--rows 4096] [--depth 64]
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
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

CHAIN = 8  # overridden by --chain; large values drown the dispatch floor


def _pallas_chain_kernel(x_ref, w_ref, o_ref, *, depth: int, int8: bool):
    """depth matmuls back-to-back in VMEM, mirroring the MRF chain."""
    y = x_ref[...]
    for j in range(depth):
        w = w_ref[j * 128:(j + 1) * 128]
        if int8:
            d = jax.lax.dot_general(y, w, (((1,), (0,)), ((), ())),
                                    preferred_element_type=jnp.int32)
            # NB: (d >> 8) still exceeds int8 range, so the cast WRAPS —
            # the chained values are modular garbage.  That is fine for
            # this probe: it times one shift + one cast per matmul, the
            # same op count as a real rescale, and MXU time is
            # data-independent.  The production kernel (mrf_packed quant
            # mode) does a true scale-based requantization instead.
            y = (d >> 8).astype(jnp.int8)
        else:
            d = jax.lax.dot_general(y, w, (((1,), (0,)), ((), ())),
                                    preferred_element_type=jnp.float32)
            y = (d * 0.01).astype(jnp.bfloat16)
    o_ref[...] = y


def pallas_chain(x, w, depth: int):
    int8 = x.dtype == jnp.int8
    return pl.pallas_call(
        lambda x_ref, w_ref, o_ref: _pallas_chain_kernel(
            x_ref, w_ref, o_ref, depth=depth, int8=int8),
        in_specs=[pl.BlockSpec(x.shape, lambda: (0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((depth * 128, 128), lambda: (0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(x.shape, lambda: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        interpret=jax.default_backend() == "cpu",
    )(x, w.reshape(depth * 128, 128))


def chained_time(f, n_samples: int = 3) -> float:
    float(f(0))
    ts = []
    for s in range(1, n_samples + 1):
        t0 = time.perf_counter()
        float(f(s))
        ts.append((time.perf_counter() - t0) / CHAIN)
    return float(np.median(ts))


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--rows", type=int, default=4096)
    p.add_argument("--depth", type=int, default=64,
                   help="matmuls per chain iteration")
    p.add_argument("--chain", type=int, default=1024,
                   help="chain iterations per timed call; the ~28 ms "
                        "dispatch floor must be small against "
                        "chain*depth matmuls of device work")
    args = p.parse_args(argv)
    rows, depth = args.rows, args.depth
    global CHAIN
    CHAIN = args.chain

    rng = np.random.default_rng(0)
    x8 = jnp.asarray(rng.integers(-127, 128, size=(rows, 128)), jnp.int8)
    w8 = jnp.asarray(rng.integers(-127, 128, size=(depth, 128, 128)), jnp.int8)
    xb = jnp.asarray(rng.standard_normal((rows, 128)), jnp.bfloat16)
    wb = jnp.asarray(rng.standard_normal((depth, 128, 128)), jnp.bfloat16)

    @jax.jit
    def chain_i8(seed):
        def body(i, acc):
            def inner(j, y):
                d = jax.lax.dot_general(
                    y, w8[j], (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.int32)
                # shift + cast keeps the chain int8-typed; values wrap
                # (see the Pallas kernel note) — timing-equivalent to a
                # real requant, which is all this probe measures
                return (d >> 8).astype(jnp.int8)
            y = jax.lax.fori_loop(0, depth, inner, x8 + (acc * 0).astype(jnp.int8))
            return acc + jnp.sum(y.astype(jnp.int32))
        return jax.lax.fori_loop(0, CHAIN, body, jnp.int32(0)) + seed

    @jax.jit
    def chain_bf16(seed):
        def body(i, acc):
            def inner(j, y):
                d = jax.lax.dot_general(
                    y, wb[j], (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                return (d * 0.01).astype(jnp.bfloat16)
            y = jax.lax.fori_loop(0, depth, inner,
                                  xb + (acc * 0).astype(jnp.bfloat16))
            return acc + jnp.sum(y.astype(jnp.float32))
        return jax.lax.fori_loop(0, CHAIN, body, jnp.float32(0)) + seed

    @jax.jit
    def chain_i8_pallas(seed):
        def body(i, acc):
            y = pallas_chain(x8 + (acc * 0).astype(jnp.int8), w8, depth)
            return acc + jnp.sum(y.astype(jnp.int32))
        return jax.lax.fori_loop(0, CHAIN, body, jnp.int32(0)) + seed

    @jax.jit
    def chain_bf16_pallas(seed):
        def body(i, acc):
            y = pallas_chain(xb + (acc * 0).astype(jnp.bfloat16), wb, depth)
            return acc + jnp.sum(y.astype(jnp.float32))
        return jax.lax.fori_loop(0, CHAIN, body, jnp.float32(0)) + seed

    flops = 2 * rows * 128 * 128 * depth  # per chain iteration
    out = {"rows": rows, "depth": depth}
    for name, f in (("bf16", chain_bf16), ("int8", chain_i8),
                    ("bf16_pallas", chain_bf16_pallas),
                    ("int8_pallas", chain_i8_pallas)):
        try:
            dt = chained_time(f)
            out[f"{name}_ms"] = round(dt * 1e3, 3)
            out[f"{name}_tops"] = round(flops / dt / 1e12, 1)
        except Exception as e:  # lowering may be unsupported on this backend
            out[f"{name}_error"] = f"{type(e).__name__}: {e}"[:200]
    print(json.dumps(out))
    return out


if __name__ == "__main__":
    main()
