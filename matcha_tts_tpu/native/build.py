"""Build the native MAS shared library with the system toolchain.

Compiles mas.cpp to _mas.so next to this file (g++ -O3, OpenMP when
available).  Invoked lazily on first use and idempotent: rebuilds only
when the source is newer than the binary.
"""

from __future__ import annotations

import subprocess
from pathlib import Path

_DIR = Path(__file__).parent
SRC = _DIR / "mas.cpp"
LIB = _DIR / "_mas.so"


def build_lib(src: Path, lib: Path, force: bool = False,
              extra: tuple = ()) -> Path:
    """Compile `src` -> shared `lib` (g++ -O3), rebuilding only when the
    source is newer.  `extra` appends flags (e.g. ("-pthread",))."""
    if not force and lib.exists() and lib.stat().st_mtime >= src.stat().st_mtime:
        return lib
    base = ["g++", "-O3", "-shared", "-fPIC", "-std=c++17",
            *extra, str(src), "-o", str(lib)]
    try:
        subprocess.run(base[:1] + ["-fopenmp"] + base[1:], check=True,
                       capture_output=True)
    except (subprocess.CalledProcessError, FileNotFoundError):
        subprocess.run(base, check=True, capture_output=True)
    return lib


def build(force: bool = False) -> Path:
    """Build the MAS kernel (back-compat entry)."""
    return build_lib(SRC, LIB, force)


def build_wavio(force: bool = False) -> Path:
    return build_lib(_DIR / "wavio.cpp", _DIR / "_wavio.so", force,
                     extra=("-pthread",))


if __name__ == "__main__":
    print(build(force=True))
    print(build_wavio(force=True))
