"""Checkpoint auto-download (utils/fetch.py) — the reference downloads its
pretrained vocoder with urllib when the local file is absent
(main.py:139-142).  No egress exists in this environment, so the tests
prove the full plumbing against a localhost http.server: download,
cache-hit (no second request), atomicity on interrupted transfers, and
the end-to-end URL -> torch-load -> convert path.
"""

from __future__ import annotations

import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from pathlib import Path

import numpy as np
import pytest
import torch

from matcha_tts_tpu.utils import fetch


class _Server:
    """Serves an in-memory {path: bytes} dict, counting GETs per path.

    Paths listed in `truncate` send a Content-Length larger than the body
    and then close, simulating a dropped connection mid-download.
    """

    def __init__(self):
        self.files: dict[str, bytes] = {}
        self.hits: dict[str, int] = {}
        self.truncate: set[str] = set()
        outer = self

        class Handler(BaseHTTPRequestHandler):
            def do_GET(self):  # noqa: N802
                outer.hits[self.path] = outer.hits.get(self.path, 0) + 1
                body = outer.files.get(self.path)
                if body is None:
                    self.send_error(404)
                    return
                self.send_response(200)
                if self.path in outer.truncate:
                    self.send_header("Content-Length", str(len(body) + 1000))
                    self.end_headers()
                    self.wfile.write(body[: len(body) // 2])
                    self.wfile.flush()
                    self.connection.close()
                    return
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

            def log_message(self, *a):  # silence
                pass

        self.httpd = ThreadingHTTPServer(("127.0.0.1", 0), Handler)
        self.port = self.httpd.server_address[1]
        self.thread = threading.Thread(target=self.httpd.serve_forever,
                                       daemon=True)
        self.thread.start()

    def url(self, path: str) -> str:
        return f"http://127.0.0.1:{self.port}{path}"

    def close(self):
        self.httpd.shutdown()
        self.httpd.server_close()


@pytest.fixture()
def server():
    s = _Server()
    yield s
    s.close()


@pytest.fixture()
def cache(tmp_path, monkeypatch):
    d = tmp_path / "cache"
    monkeypatch.setenv("MATCHA_TPU_CACHE", str(d))
    return d


def test_local_path_passthrough(tmp_path):
    p = tmp_path / "gen.pt"
    assert fetch.resolve_checkpoint(p) == Path(p)
    assert fetch.resolve_checkpoint(str(p)) == Path(p)
    assert not fetch.is_url(str(p))


def test_url_downloads_once_then_serves_from_cache(server, cache):
    server.files["/gen.pt"] = b"payload-bytes"
    url = server.url("/gen.pt")
    p1 = fetch.resolve_checkpoint(url)
    assert p1.read_bytes() == b"payload-bytes"
    assert str(p1).startswith(str(cache))
    p2 = fetch.resolve_checkpoint(url)
    assert p2 == p1
    assert server.hits["/gen.pt"] == 1  # second call never hit the server


def test_same_basename_different_urls_dont_collide(server, cache):
    server.files["/a/gen.pt"] = b"AAAA"
    server.files["/b/gen.pt"] = b"BBBB"
    pa = fetch.resolve_checkpoint(server.url("/a/gen.pt"))
    pb = fetch.resolve_checkpoint(server.url("/b/gen.pt"))
    assert pa != pb
    assert pa.read_bytes() == b"AAAA"
    assert pb.read_bytes() == b"BBBB"


def test_interrupted_download_is_atomic(server, cache):
    server.files["/gen.pt"] = b"x" * 4096
    server.truncate.add("/gen.pt")
    url = server.url("/gen.pt")
    with pytest.raises(Exception):
        fetch.resolve_checkpoint(url)
    # neither a truncated target nor a stale .part file may remain
    assert list(cache.rglob("*")) in ([], [cache]) or \
        all(p.is_dir() for p in cache.rglob("*"))
    server.truncate.clear()
    p = fetch.resolve_checkpoint(url)  # retry succeeds cleanly
    assert p.read_bytes() == b"x" * 4096
    assert server.hits["/gen.pt"] == 2


def test_load_torch_state_dict_from_url(server, cache, tmp_path):
    """End-to-end: the reference's load_vocoder surface (main.py:134-150)
    — URL -> download -> torch.load -> {'generator': sd} unwrap."""
    from matcha_tts_tpu.params.convert import load_torch_state_dict

    sd = {"conv_pre.weight": torch.from_numpy(
        np.arange(24, dtype=np.float32).reshape(2, 3, 4))}
    path = tmp_path / "g.pt"
    torch.save({"generator": sd}, path)
    server.files["/g.pt"] = path.read_bytes()

    out = load_torch_state_dict(server.url("/g.pt"))
    np.testing.assert_array_equal(
        out["conv_pre.weight"],
        np.arange(24, dtype=np.float32).reshape(2, 3, 4))
    assert server.hits["/g.pt"] == 1
    load_torch_state_dict(server.url("/g.pt"))
    assert server.hits["/g.pt"] == 1  # cached
