"""AOT-export deployment bench: load-to-first-audio vs cold compile.

`inference/export.py` serializes the fused packed-PCM synthesis graph
(StableHLO via jax.export) so a serving process can start WITHOUT model
code or retracing.  This bench measures what that buys on the real TPU
backend (VERDICT r3 #8):

  1. EXPORT (this process): full-size random weights -> one-entry
     bucket grid on disk, wall time recorded;
  2. LOAD (fresh process): `load_bucket_grid` -> first packed-PCM audio
     out, with the XLA compile cache DISABLED — isolates what the
     artifact saves (Python model import + trace) from XLA compile;
  3. COLD (fresh process): build the Synthesizer from model code and
     synthesize the same shape, cache disabled — the control;
  4. LOAD+CACHE (fresh process): the production warm restart — artifact
     + persistent compile cache.

The vocoder runs `mrf_kernel="xla"` so the comparison measures the
graph pipeline, not minutes of Mosaic kernel compiles per variant.

Usage: python benchmarks/export_bench.py            # orchestrates all
"""

from __future__ import annotations

import argparse
import json
import os
import pickle
import subprocess
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
WORK = Path("/tmp/export_bench")
TEXT = "The birch canoe slid on the smooth planks."
BATCH, TEXT_BUCKET, FRAME_BUCKET, NFE = 1, 128, 512, 10


def _cfgs():
    import dataclasses

    from matcha_tts_tpu.config import HiFiGANConfig, MatchaConfig

    cfg = MatchaConfig()
    hcfg = dataclasses.replace(HiFiGANConfig(), mrf_kernel="xla",
                               use_pallas=False)
    return cfg, hcfg


def _tokens():
    import numpy as np

    from matcha_tts_tpu.text.tokenizer import encode_text

    ids = encode_text(TEXT, add_blank=True)[:TEXT_BUCKET]
    x = np.zeros((BATCH, TEXT_BUCKET), np.int32)
    x[0, : len(ids)] = ids
    return x, np.asarray([len(ids)], np.int32)


def role_export():
    import jax

    from matcha_tts_tpu.inference.export import export_bucket_grid
    from matcha_tts_tpu.models import vocoder as vocoder_mod
    from matcha_tts_tpu.models.matcha import init_matcha

    cfg, hcfg = _cfgs()
    params = init_matcha(jax.random.PRNGKey(0), cfg)
    voc = vocoder_mod.init_vocoder(jax.random.PRNGKey(1), hcfg)
    t0 = time.perf_counter()
    manifest = export_bucket_grid(
        params, cfg, voc, hcfg, WORK / "grid",
        batch_buckets=(BATCH,), text_buckets=(TEXT_BUCKET,),
        frame_buckets=(FRAME_BUCKET,), n_timesteps=NFE,
        compute_dtype="bfloat16")
    dt = time.perf_counter() - t0
    with open(WORK / "params.pkl", "wb") as f:
        pickle.dump({"params": jax.device_get(params),
                     "voc": jax.device_get(voc)}, f)
    size = sum((WORK / "grid" / e["file"]).stat().st_size
               for e in manifest["entries"])
    print(json.dumps({"metric": "export", "wall_s": round(dt, 2),
                      "entries": len(manifest["entries"]),
                      "artifact_mb": round(size / 1e6, 2)}))


def role_load(cache: bool):
    import jax

    if cache:
        jax.config.update("jax_compilation_cache_dir",
                          str(REPO / ".jax_cache"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    import numpy as np

    t_start = time.perf_counter()
    from matcha_tts_tpu.inference.export import (key_data, load_bucket_grid,
                                                 unpack_pcm)

    with open(WORK / "params.pkl", "rb") as f:
        trees = pickle.load(f)
    t_params = time.perf_counter()
    table = load_bucket_grid(WORK / "grid")
    fn = table[(BATCH, TEXT_BUCKET, FRAME_BUCKET)]
    t_load = time.perf_counter()
    x, xl = _tokens()
    out = fn(trees["params"], trees["voc"], key_data(0), jnp.asarray(x),
             jnp.asarray(xl))
    pcm, y_lengths = unpack_pcm(np.asarray(out[0]), BATCH, 256)
    t_audio = time.perf_counter()
    assert int(y_lengths[0]) > 0 and np.abs(pcm).max() >= 0
    print(json.dumps({
        "metric": "load_cache" if cache else "load",
        "params_s": round(t_params - t_start, 2),
        "deserialize_s": round(t_load - t_params, 2),
        "first_audio_s": round(t_audio - t_load, 2),
        "total_s": round(t_audio - t_start, 2)}))


def role_cold():
    import numpy as np

    t_start = time.perf_counter()
    import jax

    from matcha_tts_tpu.inference.synthesizer import Synthesizer

    cfg, hcfg = _cfgs()
    with open(WORK / "params.pkl", "rb") as f:
        trees = pickle.load(f)
    syn = Synthesizer(trees["params"], cfg, trees["voc"], hcfg,
                      text_buckets=(TEXT_BUCKET,),
                      frame_buckets=(FRAME_BUCKET,),
                      compute_dtype="bfloat16")
    t_build = time.perf_counter()
    r = syn.synthesize(TEXT, n_timesteps=NFE)
    t_audio = time.perf_counter()
    assert np.isfinite(r.wav).all()
    print(json.dumps({
        "metric": "cold",
        "build_s": round(t_build - t_start, 2),
        "first_audio_s": round(t_audio - t_build, 2),
        "total_s": round(t_audio - t_start, 2)}))


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--role", default="all",
                    choices=("all", "export", "load", "load-cache", "cold"))
    args = ap.parse_args(argv)
    WORK.mkdir(parents=True, exist_ok=True)

    if args.role == "export":
        return role_export()
    if args.role == "load":
        return role_load(cache=False)
    if args.role == "load-cache":
        return role_load(cache=True)
    if args.role == "cold":
        return role_cold()

    env = dict(os.environ)
    # the child processes must NOT inherit an ambient cache setting
    env.pop("JAX_COMPILATION_CACHE_DIR", None)
    me = [sys.executable, str(Path(__file__).resolve())]
    for role in ("export", "load", "cold", "load-cache"):
        print(f"== {role} (fresh process) ==", flush=True)
        subprocess.run(me + ["--role", role], check=True, env=env,
                       cwd=str(REPO))


if __name__ == "__main__":
    sys.path.insert(0, str(REPO))
    main()
