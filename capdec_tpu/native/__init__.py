"""Native (C++) components: build-on-first-use shared libraries."""
from __future__ import annotations

import os
import subprocess
import sys

_NATIVE_DIR = os.path.dirname(os.path.abspath(__file__))


def build_library(name: str, sources, extra_flags=()) -> str:
    """Compile `sources` into {name}.so next to this file (cached by mtime).
    Returns the .so path; raises on compiler failure."""
    so_path = os.path.join(_NATIVE_DIR, f"{name}.so")
    srcs = [os.path.join(_NATIVE_DIR, s) for s in sources]
    if os.path.isfile(so_path) and all(
            os.path.getmtime(so_path) >= os.path.getmtime(s) for s in srcs):
        return so_path
    cmd = ["g++", "-O2", "-std=c++17", "-shared", "-fPIC",
           *extra_flags, *srcs, "-o", so_path]
    subprocess.run(cmd, check=True, capture_output=True)
    return so_path


def try_load(name: str, sources):
    """Build+load via ctypes; returns None if no toolchain is available."""
    import ctypes
    try:
        return ctypes.CDLL(build_library(name, sources))
    except Exception as e:  # pragma: no cover - toolchain-less environments
        print(f"[capdec_tpu.native] {name} unavailable: {e}", file=sys.stderr)
        return None
