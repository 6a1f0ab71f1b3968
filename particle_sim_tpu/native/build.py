"""Build the native packer shared library with g++ (no pybind11 — ctypes ABI).

Lazy: ``ensure_built()`` compiles on first use and caches by source mtime.
"""

from __future__ import annotations

import os
import subprocess
from typing import Optional

_DIR = os.path.dirname(os.path.abspath(__file__))
SRC = os.path.join(_DIR, "packer.cpp")
LIB = os.path.join(_DIR, "libpsimpack.so")


def ensure_built(force: bool = False) -> Optional[str]:
    """Returns the .so path, building if needed; None if no toolchain."""
    try:
        if (not force and os.path.exists(LIB)
                and os.path.getmtime(LIB) >= os.path.getmtime(SRC)):
            return LIB
        cmd = [
            "g++", "-O3", "-march=native", "-std=c++17", "-shared", "-fPIC",
            "-pthread", SRC, "-o", LIB,
        ]
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return LIB
    except (OSError, subprocess.SubprocessError):
        return None


if __name__ == "__main__":
    path = ensure_built(force=True)
    print(path or "build failed")
