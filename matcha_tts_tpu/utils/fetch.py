"""Checkpoint auto-download (the reference's ``load_vocoder`` surface).

The reference fetches its pretrained HiFi-GAN with
``urllib.request.urlretrieve(VOCODER_URL, VOCODER_PATH)`` when the local
file is absent (main.py:139-142).  We generalize that into
``resolve_checkpoint``: any CLI/library checkpoint argument may be an
``http(s)://`` URL, which is downloaded once into a local cache directory
and resolved to the cached path on every later call.

Hardening over the reference's bare ``urlretrieve``:

* atomic download (``.part`` temp file + ``os.replace``) so an
  interrupted transfer never leaves a truncated file that a later run
  would try to ``torch.load``;
* cache keyed by URL hash + basename, so distinct URLs with the same
  filename don't collide;
* cache dir override via ``MATCHA_TPU_CACHE`` (default
  ``~/.cache/matcha_tts_tpu``).

This environment has no egress, so the only network exercised in tests is
a localhost ``http.server`` (tests/test_fetch.py) — which fully proves the
plumbing the reference relies on.
"""

from __future__ import annotations

import hashlib
import os
import urllib.request
from pathlib import Path

__all__ = ["resolve_checkpoint", "cache_dir"]


def cache_dir() -> Path:
    root = os.environ.get("MATCHA_TPU_CACHE")
    if root:
        return Path(root)
    return Path.home() / ".cache" / "matcha_tts_tpu"


def is_url(spec: str) -> bool:
    return isinstance(spec, str) and spec.startswith(("http://", "https://"))


def _cache_path(url: str) -> Path:
    digest = hashlib.sha256(url.encode("utf-8")).hexdigest()[:16]
    name = os.path.basename(url.split("?", 1)[0]) or "checkpoint"
    return cache_dir() / f"{digest}-{name}"


def resolve_checkpoint(spec: str | os.PathLike) -> Path:
    """Return a local path for ``spec``.

    Local paths pass through untouched; URLs are downloaded into the
    cache on first use (main.py:139-142 semantics: download iff the
    target does not already exist) and the cached path is returned.
    """
    spec = os.fspath(spec)
    if not is_url(spec):
        return Path(spec)
    target = _cache_path(spec)
    if target.exists():
        return target
    target.parent.mkdir(parents=True, exist_ok=True)
    tmp = target.with_suffix(target.suffix + ".part")
    print(f"Downloading {spec} -> {target} ...")
    try:
        urllib.request.urlretrieve(spec, tmp)  # noqa: S310 (user-supplied URL)
        os.replace(tmp, target)
    finally:
        if tmp.exists():
            tmp.unlink()
    return target
