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


def build(force: bool = False) -> Path:
    if not force and LIB.exists() and LIB.stat().st_mtime >= SRC.stat().st_mtime:
        return LIB
    base = ["g++", "-O3", "-shared", "-fPIC", "-std=c++17",
            str(SRC), "-o", str(LIB)]
    try:
        subprocess.run(base[:1] + ["-fopenmp"] + base[1:], check=True,
                       capture_output=True)
    except (subprocess.CalledProcessError, FileNotFoundError):
        subprocess.run(base, check=True, capture_output=True)
    return LIB


if __name__ == "__main__":
    print(build(force=True))
