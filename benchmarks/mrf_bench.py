"""Microbenchmark: one HiFi-GAN MRF level — XLA vs Pallas kernels.

Times the 18-conv 3-branch resblock stack at the deep wav-rate levels
(C=32, C=64) with the chained-iteration method (docs/RESULTS.md).

Usage: python benchmarks/mrf_bench.py [--frames 768] [--dtype bfloat16]
       [--impl xla packed] [--channels 32 64]
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
KERNELS = (3, 7, 11)
DILS = ((1, 3, 5),) * 3


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--frames", type=int, default=768,
                   help="mel frames; wav T = frames * 256")
    p.add_argument("--dtype", default="bfloat16",
                   choices=("float32", "bfloat16"))
    p.add_argument("--impl", nargs="+", default=["xla", "packed"],
                   choices=("xla", "tap", "packed", "int8", "xla_up",
                            "packed_up", "int8_up"))
    p.add_argument("--channels", nargs="+", type=int, default=[32, 64])
    p.add_argument("--batch", type=int, default=1)
    p.add_argument("--tile", type=int, default=0,
                   help="packed-kernel tile override (0 = auto)")
    p.add_argument("--kstack", type=int, default=16,
                   help="packed-kernel K-stack group size (16 = the "
                        "production default in mrf_packed)")
    args = p.parse_args(argv)

    from matcha_tts_tpu.models import hifigan

    dtype = jnp.dtype(args.dtype)
    results = {}
    # V1 level geometry (hifigan/config.py:9-10): cumulative upsampling at
    # each channel width.  C=256 sits right after the first x8 stage.
    level_t = {256: 8, 128: 64, 64: 128, 32: 256}
    for c in args.channels:
        t = args.frames * level_t[c]
        rbs = [hifigan.init_resblock1(jax.random.PRNGKey(i), c, k, (1, 3, 5))
               for i, k in enumerate(KERNELS)]
        rng = np.random.default_rng(0)
        x0 = jnp.asarray(rng.standard_normal((args.batch, t, c))
                         .astype(np.float32)).astype(dtype)

        def xla_level(x):
            ref = None
            for rb, k in zip(rbs, KERNELS):
                y = hifigan.resblock1(rb, x, k, (1, 3, 5))
                ref = y if ref is None else ref + y
            return ref / 3.0

        impls = {}
        if "xla" in args.impl:
            impls["xla"] = xla_level
        if "packed" in args.impl and c <= 128:  # no lane packing above 128
            from matcha_tts_tpu.ops.pallas.mrf_packed import (
                mrf_packed, pack_packed_weights)

            wp, bp = pack_packed_weights(rbs, KERNELS, DILS, dtype=dtype)

            def packed_level(x, wp=wp, bp=bp):
                return mrf_packed(x, wp, bp, kernel_sizes=KERNELS,
                                  dilations=DILS, tile=args.tile,
                                  kstack=args.kstack)

            impls["packed"] = packed_level
        if "int8" in args.impl and c <= 256:
            from matcha_tts_tpu.ops.pallas.mrf_packed import (
                mrf_packed, pack_packed_weights_int8)

            w8, b8, ws8 = pack_packed_weights_int8(rbs, KERNELS, DILS)

            def int8_level(x, w=(w8, b8, ws8)):
                return mrf_packed(x, *w, kernel_sizes=KERNELS,
                                  dilations=DILS, tile=args.tile,
                                  kstack=args.kstack)

            impls["int8"] = int8_level
        if ("xla_up" in args.impl or "packed_up" in args.impl
                or "int8_up" in args.impl) and c <= 64:
            # upsample-inclusive variants: time the full generator level
            # lrelu -> ConvTranspose(k=4,s=2, C 2c->c) -> MRF from the
            # pre-upsample tensor (B, t/2, 2c).  Only the two deepest
            # levels (c in {32, 64}) have a fused-upsample kernel.
            from matcha_tts_tpu.models import nn as mnn

            up = mnn.init_conv_transpose1d(jax.random.PRNGKey(17), 2 * c, c, 4)
            up = {k: jnp.asarray(v, dtype) for k, v in up.items()}
            xin = jnp.asarray(rng.standard_normal((args.batch, t // 2, 2 * c))
                              .astype(np.float32)).astype(dtype)

            if "xla_up" in args.impl:
                def xla_up_level(x):
                    y = jax.nn.leaky_relu(x, 0.1)
                    y = mnn.conv_transpose1d(up, y, stride=2, padding=1)
                    return xla_level(y)

                impls["xla_up"] = (xla_up_level, xin)
            if "packed_up" in args.impl:
                from matcha_tts_tpu.ops.pallas.mrf_packed import (
                    mrf_packed_up, pack_packed_weights, pack_upsample_weights)

                wupp, bupp = pack_upsample_weights(up, dtype=dtype)
                if "packed" in args.impl:
                    wp2, bp2 = wp, bp  # identical resblock packing
                else:
                    wp2, bp2 = pack_packed_weights(rbs, KERNELS, DILS,
                                                   dtype=dtype)

                def packed_up_level(x, w=(wupp, bupp, wp2, bp2)):
                    return mrf_packed_up(x, *w, KERNELS, DILS,
                                         tile=args.tile, kstack=args.kstack)

                impls["packed_up"] = (packed_up_level, xin)
            if "int8_up" in args.impl:
                from matcha_tts_tpu.ops.pallas.mrf_packed import (
                    mrf_packed_up, pack_packed_weights_int8,
                    pack_upsample_weights)

                wup8, bup8 = pack_upsample_weights(up, dtype=dtype)
                w8u, b8u, ws8u = pack_packed_weights_int8(rbs, KERNELS, DILS)

                def int8_up_level(x, w=(wup8, bup8, w8u, b8u, ws8u)):
                    return mrf_packed_up(x, w[0], w[1], w[2], w[3],
                                         KERNELS, DILS, tile=args.tile,
                                         kstack=args.kstack, ws=w[4])

                impls["int8_up"] = (int8_up_level, xin)
        elif c > 64 and ("xla_up" in args.impl or "packed_up" in args.impl
                         or "int8_up" in args.impl):
            print(f"C={c}: skipping _up impls (no fused-upsample kernel)",
                  file=sys.stderr)
        if "tap" in args.impl:
            from matcha_tts_tpu.ops.pallas.mrf import mrf_fused, pack_mrf_weights

            w1, b1, w2, b2 = pack_mrf_weights(rbs, KERNELS)

            def tap_level(x, w=(w1, b1, w2, b2)):
                return mrf_fused(x.astype(jnp.float32), *w,
                                 kernel_sizes=KERNELS).astype(x.dtype)

            impls["tap"] = tap_level

        for name, fn in impls.items():
            fn, x_run = fn if isinstance(fn, tuple) else (fn, x0)

            if name.endswith("_up"):
                # shape-changing level: serialize iterations through a
                # data-dependent scalar folded into the constant input
                @jax.jit
                def chain(x, fn=fn):
                    def body(i, s):
                        y = fn(x + s.astype(x.dtype))
                        return jnp.sum(y.astype(jnp.float32)) * 1e-30
                    return jax.lax.fori_loop(0, CHAIN, body,
                                             jnp.float32(0.0))
            else:
                @jax.jit
                def chain(x, fn=fn):
                    def body(i, x):
                        return fn(x) * 0.5
                    return jnp.sum(jax.lax.fori_loop(0, CHAIN, body, x)
                                   .astype(jnp.float32))

            print(f"compiling C={c} {name}...", file=sys.stderr, flush=True)
            float(chain(x_run))
            ts = []
            for _ in range(3):
                t0 = time.perf_counter()
                float(chain(x_run))
                ts.append((time.perf_counter() - t0) / CHAIN)
            ms = float(np.median(ts)) * 1e3
            results[f"c{c}_{name}_ms"] = round(ms, 3)
            print(f"C={c} T={t} {name}: {ms:.2f} ms", file=sys.stderr,
                  flush=True)

    print(json.dumps({"metric": "mrf_level_ms", "frames": args.frames,
                      "dtype": args.dtype, **results}))
    return results


if __name__ == "__main__":
    main()
