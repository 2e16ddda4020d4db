"""Process-level JAX configuration for CLIs and benchmarks.

Enables the persistent compilation cache (first GPT-2-sized compile on the
TPU backend is slow; subsequent runs hit the cache) and optional debug
toggles (NaN checks as the sanitizer story — SURVEY.md §5).

KNOWN QUIRK: XLA:CPU executables that contain collectives (multi-device
CPU meshes) can DEADLOCK their collective rendezvous when reloaded from
the persistent cache — fresh compiles always work (reproduced on entries
the same machine wrote). When running a virtual-device CPU mesh, point
CAPDEC_JAX_CACHE at a throwaway directory (see __graft_entry__'s dryrun
child) or skip setup_jax. TPU executables are unaffected.
"""
from __future__ import annotations

import os


def setup_jax(cache_dir: str | None = None, debug_nans: bool = False) -> None:
    import jax

    cache = cache_dir or os.environ.get(
        "CAPDEC_JAX_CACHE", os.path.expanduser("~/.cache/capdec_jax"))
    os.makedirs(cache, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    if debug_nans:
        jax.config.update("jax_debug_nans", True)


def force_cpu(n_devices: int = 1) -> None:
    """Route this process to the CPU backend (tests / data tools)."""
    flags = os.environ.get("XLA_FLAGS", "")
    if "host_platform_device_count" not in flags and n_devices > 1:
        os.environ["XLA_FLAGS"] = (
            flags + f" --xla_force_host_platform_device_count={n_devices}").strip()
    import jax
    jax.config.update("jax_platforms", "cpu")
