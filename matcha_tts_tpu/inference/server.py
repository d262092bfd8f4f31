"""Production TTS serving: HTTP front end + dynamic batcher.

The reference has no serving story (a hard-coded-text CLI, main.py:155-217).
This is the deployment layer a TPU chip actually needs:

* **Dynamic batching** — concurrent requests are collected for up to
  `batch_window_ms` (or until `max_batch`) and synthesized as ONE fused
  device call via `Synthesizer.synthesize_batch`.  On TPU this is the
  whole ballgame: the U-Net and vocoder are batch-amortized on the MXU,
  and per-call overhead (host dispatch + device-transport round trip,
  ~30 ms on tunneled transports) is paid once per batch instead of once
  per request.
* **Single device thread** — all JAX calls happen on the batcher thread;
  HTTP threads only enqueue work and wait on futures, so the device never
  sees concurrent dispatch.
* **Streaming** — `stream=true` responses use chunked transfer encoding
  fed by `Synthesizer.stream_samples` (sample-level streaming vocoder).
* stdlib only (`http.server`), so it runs anywhere the framework does.

Endpoints:
  POST /synthesize   {"text": ..., "n_timesteps": 10, "temperature": 0.667,
                      "length_scale": 1.0, "seed": 0, "spk": null,
                      "stream": false}            -> audio/wav
  GET  /healthz                                    -> {"status": "ok", ...}
  GET  /stats                                      -> batching counters
"""

from __future__ import annotations

import json
import queue
import threading
import time
from concurrent.futures import Future
from dataclasses import dataclass, field
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Optional

import numpy as np

from matcha_tts_tpu.inference.synthesizer import Synthesizer
from matcha_tts_tpu.utils.wav import wav_bytes


@dataclass
class _Request:
    text: str
    n_timesteps: int
    temperature: float
    length_scale: float
    seed: int
    spk: Optional[int]
    future: Future = field(default_factory=Future)

    @property
    def group_key(self):
        # requests fused into one device call must share the static params
        return (self.n_timesteps, self.temperature, self.length_scale,
                self.seed, self.spk)


class DynamicBatcher:
    """Collects requests for up to `batch_window_ms`, groups them by
    static-parameter key, and synthesizes each group as one batch.

    With a `mesh` (jax.sharding.Mesh), each group is dispatched through
    `Synthesizer.synthesize_batch_sharded` instead: the batch axis is
    sharded over the mesh's "data" axis so every chip synthesizes its
    shard locally (no collectives on the inference path) — pod-scale
    serving over ICI, the serving-layer completion of SURVEY §2.3's
    batch-sharded inference strategy (the reference's only parallelism
    is training DDP, train_standalone.py:863-868)."""

    def __init__(self, synth: Synthesizer, max_batch: int = 16,
                 batch_window_ms: float = 10.0, mesh=None):
        self.synth = synth
        self.mesh = mesh
        self.max_batch = int(max_batch)
        self.window_s = float(batch_window_ms) / 1000.0
        self.q: "queue.Queue[Optional[_Request]]" = queue.Queue()
        self.stats = {"requests": 0, "batches": 0, "batched_requests": 0,
                      "audio_seconds": 0.0, "synth_seconds": 0.0,
                      "max_batch_seen": 0}
        # serializes ALL device dispatch (batched calls here, streaming
        # calls on handler threads) — the device never sees concurrent
        # programs from multiple host threads
        self.device_lock = threading.Lock()
        self._closing = False
        self._thread = threading.Thread(target=self._run, daemon=True)
        self._thread.start()

    def submit(self, req: _Request) -> Future:
        if self._closing:
            req.future.set_exception(
                RuntimeError("server is shutting down"))
            return req.future
        self.stats["requests"] += 1
        self.q.put(req)
        return req.future

    def shutdown(self):
        """Drain: requests enqueued before shutdown complete normally; new
        submits (and any that race past the sentinel) fail fast."""
        self._closing = True
        self.q.put(None)
        self._thread.join(timeout=300.0)
        while True:  # fail any stragglers enqueued after the sentinel
            try:
                item = self.q.get_nowait()
            except queue.Empty:
                break
            if item is not None:
                item.future.set_exception(
                    RuntimeError("server is shutting down"))

    # -- batcher thread ------------------------------------------------------

    def _collect(self):
        """Block for the first request, then drain for the batch window."""
        first = self.q.get()
        if first is None:
            return None
        batch = [first]
        deadline = time.monotonic() + self.window_s
        while len(batch) < self.max_batch:
            timeout = deadline - time.monotonic()
            if timeout <= 0:
                break
            try:
                nxt = self.q.get(timeout=timeout)
            except queue.Empty:
                break
            if nxt is None:
                self.q.put(None)  # re-post sentinel for the outer loop
                break
            batch.append(nxt)
        return batch

    def _run(self):
        while True:
            batch = self._collect()
            if batch is None:
                return
            groups: dict = {}
            for r in batch:
                groups.setdefault(r.group_key, []).append(r)
            for (nfe, temp, ls, seed, spk), reqs in groups.items():
                t0 = time.monotonic()
                try:
                    with self.device_lock:
                        if self.mesh is not None:
                            results = self.synth.synthesize_batch_sharded(
                                [r.text for r in reqs], self.mesh,
                                n_timesteps=nfe, temperature=temp,
                                length_scale=ls, seed=seed, spk=spk)
                        else:
                            results = self.synth.synthesize_batch(
                                [r.text for r in reqs], n_timesteps=nfe,
                                temperature=temp, length_scale=ls, seed=seed,
                                spk=spk)
                except Exception as e:  # propagate to every waiter
                    for r in reqs:
                        r.future.set_exception(e)
                    continue
                dt = time.monotonic() - t0
                sr = self.synth.matcha_cfg.audio.sample_rate
                self.stats["batches"] += 1
                self.stats["batched_requests"] += len(reqs)
                self.stats["max_batch_seen"] = max(
                    self.stats["max_batch_seen"], len(reqs))
                self.stats["synth_seconds"] += dt
                for r, res in zip(reqs, results):
                    # int16 PCM straight off the packed transfer: no
                    # float round trip on the (single-core) host
                    pcm = res.pcm16
                    self.stats["audio_seconds"] += len(pcm) / sr
                    r.future.set_result(pcm)


class TTSServer:
    """Threaded HTTP server around a `Synthesizer` + `DynamicBatcher`."""

    def __init__(self, synth: Synthesizer, host: str = "127.0.0.1",
                 port: int = 0, max_batch: int = 16,
                 batch_window_ms: float = 10.0, mesh=None):
        self.synth = synth
        self.batcher = DynamicBatcher(synth, max_batch, batch_window_ms,
                                      mesh=mesh)
        server = self

        class Handler(BaseHTTPRequestHandler):
            # chunked transfer (streaming endpoint) requires HTTP/1.1 —
            # under the default HTTP/1.0 status line, spec-compliant
            # clients ignore the chunk framing and read raw chunk headers
            # as payload
            protocol_version = "HTTP/1.1"

            def log_message(self, *a):  # quiet; stats endpoint instead
                pass

            def _json(self, code: int, obj):
                body = json.dumps(obj).encode()
                self.send_response(code)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

            def do_GET(self):
                if self.path == "/healthz":
                    import jax

                    self._json(200, {
                        "status": "ok",
                        "backend": jax.default_backend(),
                        "devices": [str(d) for d in jax.devices()],
                    })
                elif self.path == "/stats":
                    st = dict(server.batcher.stats)
                    if st["synth_seconds"] > 0:
                        st["rtf"] = st["synth_seconds"] / max(
                            st["audio_seconds"], 1e-9)
                    self._json(200, st)
                else:
                    self._json(404, {"error": f"no route {self.path}"})

            def do_POST(self):
                if self.path != "/synthesize":
                    self._json(404, {"error": f"no route {self.path}"})
                    return
                try:
                    n = int(self.headers.get("Content-Length", 0))
                    payload = json.loads(self.rfile.read(n) or b"{}")
                except (ValueError, json.JSONDecodeError) as e:
                    self._json(400, {"error": f"bad JSON: {e}"})
                    return
                text = payload.get("text", "")
                if not isinstance(text, str) or not text.strip():
                    self._json(400, {"error": "missing/empty 'text'"})
                    return
                try:
                    req = _Request(
                        text=text,
                        n_timesteps=int(payload.get("n_timesteps", 10)),
                        temperature=float(payload.get("temperature", 0.667)),
                        length_scale=float(payload.get("length_scale", 1.0)),
                        seed=int(payload.get("seed", 0)),
                        spk=(int(payload["spk"])
                             if payload.get("spk") is not None else None),
                    )
                except (TypeError, ValueError) as e:
                    self._json(400, {"error": f"bad parameter: {e}"})
                    return
                sr = server.synth.matcha_cfg.audio.sample_rate
                if payload.get("stream"):
                    # chunked transfer of a headerless PCM16 stream, fed by
                    # the streaming vocoder (bypasses the batcher: streams
                    # are latency-, not throughput-, oriented)
                    self.send_response(200)
                    self.send_header("Content-Type",
                                     "application/octet-stream")
                    self.send_header("X-Sample-Rate", str(sr))
                    self.send_header("Transfer-Encoding", "chunked")
                    self.end_headers()
                    try:
                        from matcha_tts_tpu.utils.wav import pcm16_bytes

                        # lookahead_sentences=0: the sentence-lookahead
                        # producer thread would dispatch device work
                        # OUTSIDE the per-chunk device_lock below,
                        # breaking the server's single-device-thread
                        # discipline.  Window pipelining + chunk growth
                        # stay on (their dispatch happens inside next(),
                        # under the lock).
                        gen = server.synth.stream_samples(
                            req.text, n_timesteps=req.n_timesteps,
                            temperature=req.temperature,
                            length_scale=req.length_scale,
                            seed=req.seed, spk=req.spk,
                            lookahead_sentences=0)
                        while True:
                            # device dispatch happens inside next(); hold
                            # the batcher's lock per chunk so streams and
                            # batches never dispatch concurrently
                            with server.batcher.device_lock:
                                chunk = next(gen, None)
                            if chunk is None:
                                break
                            pcm = pcm16_bytes(chunk)
                            self.wfile.write(
                                f"{len(pcm):X}\r\n".encode() + pcm + b"\r\n")
                        self.wfile.write(b"0\r\n\r\n")
                    except (BrokenPipeError, ConnectionResetError):
                        pass
                    return
                try:
                    wav = server.batcher.submit(req).result(timeout=300.0)
                except Exception as e:
                    # include the exception TYPE: runtime/plugin errors
                    # (e.g. XlaRuntimeError) can carry an empty str(e),
                    # which made failures undiagnosable from the body
                    self._json(500, {"error": "synthesis failed: "
                                              f"{type(e).__name__}: {e}"})
                    return
                body = wav_bytes(wav, sr)
                self.send_response(200)
                self.send_header("Content-Type", "audio/wav")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

        class _Server(ThreadingHTTPServer):
            # socketserver's default listen backlog is 5: a burst of
            # concurrent clients overflows it and the kernel RSTs the
            # excess connections before the accept loop sees them
            request_queue_size = 128

        self.httpd = _Server((host, port), Handler)
        # non-daemon handlers + block_on_close: server_close() waits for
        # in-flight responses to finish writing (graceful drain)
        self.httpd.daemon_threads = False
        self.port = self.httpd.server_address[1]
        self._serve_thread: Optional[threading.Thread] = None

    def start(self):
        """Serve in a background thread (tests, embedding); returns self."""
        self._serve_thread = threading.Thread(
            target=self.httpd.serve_forever, daemon=True)
        self._serve_thread.start()
        return self

    def serve_forever(self):
        """Serve until SIGTERM/SIGINT, then drain and exit cleanly.

        The signal handler only unblocks `httpd.serve_forever()` (from a
        helper thread — calling shutdown() on the serving thread would
        deadlock); the actual drain runs HERE on the main thread, so the
        process cannot exit before queued requests finish and their
        responses are written (handler threads are non-daemon and
        server_close() joins them)."""
        import signal

        def handle(signum, frame):
            print(f"signal {signum}: shutting down")
            threading.Thread(target=self.httpd.shutdown,
                             daemon=True).start()

        for sig in (signal.SIGTERM, signal.SIGINT):
            try:
                signal.signal(sig, handle)
            except ValueError:  # non-main thread (embedded use)
                break
        print(f"matcha-tpu serving on :{self.port} "
              f"(max_batch={self.batcher.max_batch}, "
              f"window={self.batcher.window_s * 1e3:.0f}ms)")
        self.httpd.serve_forever()
        # main thread resumes here after the signal: drain synchronously
        self.batcher.shutdown()
        self.httpd.server_close()  # joins in-flight handler threads
        print("drained; clean exit")

    def stop(self):
        self.httpd.shutdown()
        # drain the batcher BEFORE joining handler threads: handlers may be
        # blocked on batcher futures, and server_close() waits for them
        self.batcher.shutdown()
        self.httpd.server_close()
        if self._serve_thread is not None:
            self._serve_thread.join(timeout=5.0)


def main(argv=None):
    """CLI: `python -m matcha_tts_tpu.inference.server --ckpt ... --port 8080`."""
    import argparse

    from matcha_tts_tpu.inference.cli import load_models

    ap = argparse.ArgumentParser(description="matcha-tpu TTS server")
    ap.add_argument("--ckpt", default=None,
                    help="Matcha checkpoint (torch .ckpt/.pt); random init "
                         "if omitted (smoke testing)")
    ap.add_argument("--vocoder", default=None, help="HiFi-GAN checkpoint")
    ap.add_argument("--host", default="0.0.0.0")
    ap.add_argument("--port", type=int, default=8080)
    ap.add_argument("--max-batch", type=int, default=16)
    ap.add_argument("--batch-window-ms", type=float, default=10.0)
    ap.add_argument("--compute-dtype", default="bfloat16")
    ap.add_argument("--vocoder-family", default="hifigan",
                    choices=("hifigan", "vocos"),
                    help="mel->wav family (vocos: frame-rate iSTFT "
                         "vocoder, ~4.5x the batched serving throughput)")
    ap.add_argument("--denoise-strength", type=float, default=0.00025)
    ap.add_argument("--data-parallel", action="store_true",
                    help="shard each batch over ALL visible devices (1-D "
                         "'data' mesh): pod-scale serving — each chip "
                         "synthesizes its shard of the dynamic batch")
    ap.add_argument("--warmup", action="store_true",
                    help="precompile batched graphs before serving")
    ap.add_argument("--warmup-grid", action="store_true",
                    help="precompile EVERY reachable (batch, text, frame)-"
                         "bucket graph (Synthesizer.warmup_grid) so steady-"
                         "state traffic never hits a mid-request compile; "
                         "expensive cold (use --compile-cache to pay it "
                         "once per deployment)")
    ap.add_argument("--warmup-only", action="store_true",
                    help="prime the compile cache (implies --warmup) and "
                         "exit without serving — for deploy-time prebaking "
                         "with --compile-cache (the kernel-heavy fused "
                         "graphs take minutes each to compile cold)")
    ap.add_argument("--compile-cache", default=None,
                    help="persistent JAX compilation cache dir "
                         "(warm restarts skip compiles)")
    args = ap.parse_args(argv)

    import jax

    if args.compile_cache:
        jax.config.update("jax_compilation_cache_dir", args.compile_cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    params, cfg, voc_params, hcfg = load_models(
        args.ckpt, args.vocoder, vocoder_family=args.vocoder_family)
    synth = Synthesizer(params, cfg, voc_params, hcfg,
                        compute_dtype=args.compute_dtype,
                        denoise_strength=args.denoise_strength)
    if args.warmup or args.warmup_only or args.warmup_grid:
        print("warming up batched graphs ...")
        # warm every bucket a runtime batch can PAD UP to (<= max_batch
        # requests round up to the next bucket, which must be compiled)
        limit = synth._bucket(args.max_batch, synth.batch_buckets)
        sizes = [b for b in synth.batch_buckets if b <= limit]
        if args.warmup_grid:
            triples = synth.warmup_grid(batch_sizes=sizes)
            print(f"warmed {len(triples)} (batch, text, frame) graphs")
        else:
            n = synth.warmup(batch_sizes=sizes)
            print(f"warmed {n} batch shapes")
    if args.warmup_only:
        return
    mesh = None
    if args.data_parallel:
        from matcha_tts_tpu.parallel import mesh as pmesh

        mesh = pmesh.make_mesh()
        print(f"serving data-parallel over {mesh.devices.size} devices")
    TTSServer(synth, host=args.host, port=args.port,
              max_batch=args.max_batch,
              batch_window_ms=args.batch_window_ms,
              mesh=mesh).serve_forever()


if __name__ == "__main__":
    main()
