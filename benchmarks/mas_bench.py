"""MAS on-device timing: scan-unroll sweep.

The MAS forward DP walks T_y=768 sequential columns; per-column work at
the LJSpeech config is a (B, 256) vector op — tiny against the TPU's
while-loop per-iteration overhead.  `lax.scan(..., unroll=N)` amortizes
that bookkeeping N-fold without changing numerics.  This sweep picks the
default for ops/mas.py::maximum_path.

Usage: python benchmarks/mas_bench.py [--batch 32] [--t-x 256] [--t-y 768]
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


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=32)
    p.add_argument("--t-x", type=int, default=256)
    p.add_argument("--t-y", type=int, default=768)
    p.add_argument("--unrolls", type=int, nargs="+",
                   default=[1, 4, 8, 16, 32])
    p.add_argument("--impl", default="scan", choices=("scan", "pallas"),
                   help="scan: sweep unrolls of the portable path; pallas: "
                        "time the VMEM-resident kernel (ops/pallas/mas.py)")
    args = p.parse_args(argv)

    from matcha_tts_tpu.ops.mas import maximum_path, maximum_path_numpy
    from matcha_tts_tpu.ops.masking import sequence_mask

    rng = np.random.default_rng(0)
    b, t_x, t_y = args.batch, args.t_x, args.t_y
    value = jnp.asarray(rng.standard_normal((b, t_x, t_y)), jnp.float32)
    xl = rng.integers(t_x // 2, t_x + 1, size=(b,))
    yl = rng.integers(t_y // 2, t_y + 1, size=(b,))
    # MAS requires t_y >= t_x per item (monotonic path must fit)
    yl = np.maximum(yl, xl)
    x_mask = np.asarray(sequence_mask(jnp.asarray(xl, jnp.int32), t_x))
    y_mask = np.asarray(sequence_mask(jnp.asarray(yl, jnp.int32), t_y))
    mask = jnp.asarray(x_mask[:, :, None] * y_mask[:, None, :], jnp.float32)

    oracle = maximum_path_numpy(np.asarray(value), np.asarray(mask))

    results = {}
    variants = ([("pallas", 1)] if args.impl == "pallas"
                else [("scan", u) for u in args.unrolls])
    for impl, unroll in variants:
        @jax.jit
        def chain(key, impl=impl, unroll=unroll):
            def body(i, carry):
                acc, _ = carry
                path = maximum_path(value + acc * 0, mask, unroll=unroll,
                                    impl=impl)
                return acc + jnp.sum(path), key
            acc, _ = jax.lax.fori_loop(0, CHAIN, body, (jnp.float32(0), key))
            return acc

        # parity at this variant
        got = np.asarray(maximum_path(value, mask, unroll=unroll, impl=impl))
        assert np.array_equal(got, oracle), f"{impl}/unroll={unroll} mismatch"

        float(chain(jax.random.PRNGKey(0)))
        ts = []
        for s in range(1, 4):
            t0 = time.perf_counter()
            float(chain(jax.random.PRNGKey(s)))
            ts.append((time.perf_counter() - t0) / CHAIN)
        label = "pallas" if impl == "pallas" else f"unroll{unroll}"
        results[f"{label}_ms"] = round(float(np.median(ts)) * 1e3, 3)

    print(json.dumps({"batch": b, "t_x": t_x, "t_y": t_y, **results}))
    return results


if __name__ == "__main__":
    main()
