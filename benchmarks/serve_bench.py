"""Serving throughput benchmark: dynamic batching under concurrent load.

Measures what production cares about: sustained requests/sec, realized
batch sizes, and serving RTF when N clients hit the HTTP server at once.
Run on the TPU (default platform) or CPU (--cpu).

  python benchmarks/serve_bench.py --clients 16 --requests 48
"""

from __future__ import annotations

import argparse
import json
import sys
import threading
import time
import urllib.error
import urllib.request
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

SENTENCES = [
    "The birch canoe slid on the smooth planks.",
    "Glue the sheet to the dark blue background.",
    "It is easy to tell the depth of a well.",
    "These days a chicken leg is a rare dish.",
    "Rice is often served in round bowls.",
    "The juice of lemons makes fine punch.",
    "The box was thrown beside the parked truck.",
    "The hogs were fed chopped corn and garbage.",
]


def read_rss_mb() -> float:
    with open("/proc/self/status") as f:
        for line in f:
            if line.startswith("VmRSS:"):
                return int(line.split()[1]) / 1024.0
    return float("nan")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--clients", type=int, default=16)
    ap.add_argument("--requests", type=int, default=48)
    ap.add_argument("--nfe", type=int, default=10)
    ap.add_argument("--max-batch", type=int, default=16)
    ap.add_argument("--batch-window-ms", type=float, default=15.0)
    ap.add_argument("--compute-dtype", default="bfloat16")
    ap.add_argument("--mrf", default=None,
                    choices=("xla", "tap", "packed", "int8", "auto"),
                    help="override HiFiGANConfig.mrf_kernel (int8 = the "
                         "opt-in quantized serving mode)")
    ap.add_argument("--family", default="hifigan",
                    choices=("hifigan", "vocos"),
                    help="vocoder family (models/vocoder.py dispatch)")
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--soak-seconds", type=float, default=0.0,
                    help="after the burst rounds, run a sustained-load soak "
                         "with fault injection (disconnects, malformed "
                         "payloads, oversized text) and report p99/RSS/"
                         "thread stability")
    ap.add_argument("--warmup-grid", action="store_true",
                    help="precompile EVERY reachable (batch, text, frame) "
                         "bucket triple (Synthesizer.warmup_grid) instead "
                         "of only the shapes the sample texts induce — "
                         "kills the mid-request-compile p99 cliff "
                         "(docs/RESULTS.md 2026-08-18 soak)")
    ap.add_argument("--text-buckets", default=None,
                    help="comma-separated text buckets for the deployment "
                         "(warmup_grid precompiles everything REACHABLE, "
                         "so a production deployment deliberately sizes "
                         "its bucket surface; the full default grid is "
                         "~75 triples of cold compiles)")
    ap.add_argument("--batch-frame-buckets", default=None,
                    help="comma-separated batch-mode frame buckets")
    args = ap.parse_args()

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
    import jax

    jax.config.update("jax_compilation_cache_dir",
                      str(Path(__file__).resolve().parent.parent / ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from matcha_tts_tpu.config import (HiFiGANConfig, MatchaConfig,
                                       VocosConfig)
    from matcha_tts_tpu.inference.server import TTSServer
    from matcha_tts_tpu.inference.synthesizer import Synthesizer
    from matcha_tts_tpu.models import vocoder as vocoder_mod
    from matcha_tts_tpu.models.matcha import init_matcha

    cfg = MatchaConfig()
    if args.family == "vocos":
        hcfg = VocosConfig()
    else:
        hcfg = (HiFiGANConfig() if args.mrf is None
                else HiFiGANConfig(mrf_kernel=args.mrf))
    syn_kw = {}
    if args.text_buckets:
        syn_kw["text_buckets"] = tuple(
            int(v) for v in args.text_buckets.split(","))
    if args.batch_frame_buckets:
        syn_kw["batch_frame_buckets"] = tuple(
            int(v) for v in args.batch_frame_buckets.split(","))
    synth = Synthesizer(init_matcha(jax.random.PRNGKey(0), cfg), cfg,
                        vocoder_mod.init_vocoder(jax.random.PRNGKey(1), hcfg),
                        hcfg, compute_dtype=args.compute_dtype,
                        denoise_strength=0.00025, **syn_kw)
    srv = TTSServer(synth, max_batch=args.max_batch,
                    batch_window_ms=args.batch_window_ms).start()
    url = f"http://127.0.0.1:{srv.port}/synthesize"

    def post(i):
        body = json.dumps({"text": SENTENCES[i % len(SENTENCES)],
                           "n_timesteps": args.nfe}).encode()
        req = urllib.request.Request(url, data=body)
        return urllib.request.urlopen(req, timeout=600).read()

    print("warmup (precompiling batch shapes) ...", file=sys.stderr)
    t0 = time.perf_counter()
    limit = synth._bucket(args.max_batch, synth.batch_buckets)
    sizes = [b for b in synth.batch_buckets if b <= limit]
    if args.warmup_grid:
        triples = synth.warmup_grid(batch_sizes=sizes, n_timesteps=args.nfe)
        print(f"warmup_grid: {len(triples)} bucket triples", file=sys.stderr)
    else:
        synth.warmup(SENTENCES, batch_sizes=sizes, n_timesteps=args.nfe)
    print(f"warmup {time.perf_counter() - t0:.1f}s", file=sys.stderr)

    def load_round(name):
        base = dict(srv.batcher.stats)
        lat = [None] * args.requests
        sem = threading.Semaphore(args.clients)

        failures = [0]
        fail_lock = threading.Lock()

        def worker(i):
            with sem:
                t = time.perf_counter()
                try:
                    post(i)
                except Exception as e:
                    with fail_lock:
                        failures[0] += 1
                    print(f"request {i} FAILED: {e!r}", file=sys.stderr)
                    return
                lat[i] = time.perf_counter() - t

        t0 = time.perf_counter()
        threads = [threading.Thread(target=worker, args=(i,))
                   for i in range(args.requests)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        wall = time.perf_counter() - t0

        st = srv.batcher.stats
        n_batches = st["batches"] - base["batches"]
        n_reqs = st["batched_requests"] - base["batched_requests"]
        audio_s = st["audio_seconds"] - base["audio_seconds"]
        synth_s = st["synth_seconds"] - base["synth_seconds"]
        lat_sorted = sorted(v for v in lat if v is not None) or [float("nan")]
        completed = args.requests - failures[0]
        return {
            "metric": "serving_throughput",
            "round": name,
            "requests": args.requests,
            "failed": failures[0],
            "clients": args.clients,
            "wall_s": round(wall, 3),
            "requests_per_s": round(completed / wall, 2),
            "audio_seconds": round(audio_s, 2),
            "serving_rtf": round(synth_s / max(audio_s, 1e-9), 5),
            "xrealtime": round(audio_s / wall, 1),
            "mean_batch": round(n_reqs / max(n_batches, 1), 2),
            "max_batch_seen": st["max_batch_seen"],
            "p50_latency_s": round(lat_sorted[len(lat_sorted) // 2], 3),
            "p95_latency_s": round(lat_sorted[int(len(lat_sorted) * 0.95)], 3),
        }

    def soak_round(duration_s: float):
        """Sustained load + fault injection: `--clients` closed-loop
        clients for `duration_s`, with a chaos thread firing client
        disconnects mid-request, malformed JSON, and oversized text.
        Verifies the server neither leaks (RSS, threads, futures) nor
        degrades (p99) under the faults a burst benchmark never sees."""
        import socket

        rss0, thr0 = read_rss_mb(), threading.active_count()
        stop_at = time.monotonic() + duration_s
        lats, lat_lock = [], threading.Lock()
        failures = [0]
        faults = {"disconnect": 0, "malformed": 0, "oversize": 0}

        def client(cid):
            i = cid
            while time.monotonic() < stop_at:
                t = time.perf_counter()
                try:
                    post(i)
                except Exception as e:
                    with lat_lock:
                        failures[0] += 1
                    print(f"soak request FAILED: {e!r}", file=sys.stderr)
                else:
                    with lat_lock:
                        lats.append(time.perf_counter() - t)
                i += args.clients

        def chaos():
            kinds = ["disconnect", "malformed", "oversize"]
            k = 0
            while time.monotonic() < stop_at:
                kind = kinds[k % len(kinds)]
                k += 1
                try:
                    if kind == "disconnect":
                        # full request, then vanish before the response
                        body = json.dumps(
                            {"text": "you will never hear this",
                             "n_timesteps": args.nfe}).encode()
                        s = socket.create_connection(
                            ("127.0.0.1", srv.port), timeout=30)
                        s.sendall(b"POST /synthesize HTTP/1.1\r\n"
                                  b"Host: localhost\r\nContent-Length: "
                                  + str(len(body)).encode() + b"\r\n\r\n"
                                  + body)
                        s.close()
                    elif kind == "malformed":
                        req = urllib.request.Request(url, data=b"{not json!")
                        try:
                            urllib.request.urlopen(req, timeout=60)
                        except urllib.error.HTTPError as e:
                            assert e.code == 400, e.code
                    else:  # oversized text (> largest text bucket)
                        body = json.dumps({"text": "word " * 4000,
                                           "n_timesteps": args.nfe}).encode()
                        urllib.request.urlopen(
                            urllib.request.Request(url, data=body),
                            timeout=300).read()
                    faults[kind] += 1
                except Exception as e:
                    print(f"chaos {kind} FAILED: {e!r}", file=sys.stderr)
                time.sleep(2.0)

        threads = [threading.Thread(target=client, args=(i,))
                   for i in range(args.clients)]
        threads.append(threading.Thread(target=chaos))
        t0 = time.perf_counter()
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        wall = time.perf_counter() - t0
        time.sleep(1.0)  # let keep-alive handler threads wind down
        ls = sorted(lats) or [float("nan")]

        def pct(p):
            return round(ls[min(len(ls) - 1, int(len(ls) * p))], 3)

        return {
            "metric": "serving_soak",
            "family": args.family,
            "warmup_grid": bool(args.warmup_grid),
            "soak_s": round(wall, 1),
            "completed": len(lats),
            "failed": failures[0],
            "requests_per_s": round(len(lats) / wall, 2),
            "p50_latency_s": pct(0.50),
            "p95_latency_s": pct(0.95),
            "p99_latency_s": pct(0.99),
            "faults_injected": dict(faults),
            "rss_start_mb": round(rss0, 1),
            "rss_end_mb": round(read_rss_mb(), 1),
            "threads_start": thr0,
            "threads_end": threading.active_count(),
        }

    # round 1 pays the batched-shape compiles (bounded by batch buckets);
    # round 2 is the steady-state serving number
    print(json.dumps(load_round("cold")), file=sys.stderr)
    print(json.dumps(load_round("steady")))
    if args.soak_seconds > 0:
        print(json.dumps(soak_round(args.soak_seconds)))
    srv.stop()


if __name__ == "__main__":
    main()
