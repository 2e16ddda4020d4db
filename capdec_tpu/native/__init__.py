"""Native (C++) components: build-on-first-use shared libraries.

Binaries are never committed: the artifact name embeds a hash of the
sources, so a checkout always compiles the reviewed code on first use and
a stale cached binary can never shadow an edited source file (mtimes are
arbitrary on fresh checkouts).
"""
from __future__ import annotations

import hashlib
import os
import subprocess
import sys

_NATIVE_DIR = os.path.dirname(os.path.abspath(__file__))


def build_library(name: str, sources, extra_flags=()) -> str:
    """Compile `sources` into {name}-{srchash}.so next to this file
    (cache keyed by source content). Returns the .so path; raises on
    compiler failure."""
    srcs = [os.path.join(_NATIVE_DIR, s) for s in sources]
    h = hashlib.sha256()
    for s in srcs:
        with open(s, "rb") as f:
            h.update(f.read())
    h.update(" ".join(extra_flags).encode())
    so_path = os.path.join(_NATIVE_DIR, f"{name}-{h.hexdigest()[:12]}.so")
    if os.path.isfile(so_path):
        return so_path
    cmd = ["g++", "-O2", "-std=c++17", "-shared", "-fPIC",
           *extra_flags, *srcs, "-o", so_path + ".tmp"]
    subprocess.run(cmd, check=True, capture_output=True)
    # Evict stale hash-named builds of this library (source edits would
    # otherwise accumulate orphaned .so files forever). The pattern is
    # anchored to this library's exact `{name}-{12 hex}.so` shape so a
    # library whose name is a dash-prefix of another (e.g. "fused" vs
    # "fused-v2") never deletes the other's artifact, and the new path is
    # excluded so a concurrent process that just resolved it via the
    # isfile() fast path cannot lose a race against this eviction.
    import glob
    import re
    pat = re.compile(re.escape(name) + r"-[0-9a-f]{12}\.so$")
    for old in glob.glob(os.path.join(_NATIVE_DIR, f"{name}-*.so")):
        if old == so_path or not pat.search(os.path.basename(old)):
            continue
        try:
            os.unlink(old)
        except OSError:
            pass
    os.replace(so_path + ".tmp", so_path)
    return so_path


def try_load(name: str, sources):
    """Build+load via ctypes; returns None if no toolchain is available."""
    import ctypes
    try:
        return ctypes.CDLL(build_library(name, sources))
    except Exception as e:  # pragma: no cover - toolchain-less environments
        print(f"[capdec_tpu.native] {name} unavailable: {e}", file=sys.stderr)
        return None
