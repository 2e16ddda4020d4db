"""Staged KV-cache growth shared by the beam and greedy decode engines.

Both engines run their decode as consecutive `lax.while_loop`s over gen
caches of growing slot capacity, so early steps' attention reads (and the
beam engine's fork copies) stream a small cache instead of the full
entry_length allocation (~40% average traffic saving at 67 steps).

Boundary contract: the loop counter `i` is one past the slot being
written (`step = i - 1`); a stage with capacity `cap` may run while
`i <= cap`, so slots 0..cap-1 are written before growth. Buckets are
`align`-aligned (8 = the bf16 (8, 128) memref tiling granularity, also
the chunked-slot-write kernel's chunk size).
"""
from __future__ import annotations

from typing import Any, List

import jax
import jax.numpy as jnp
from jax import lax


def stage_buckets(e_pad: int, stages: int, align: int = 8) -> List[int]:
    """Slot-capacity buckets for `stages` consecutive decode stages."""
    if stages > 1:
        return sorted({min(e_pad, -(-(e_pad * k) // (stages * align)) * align)
                       for k in range(1, stages + 1)})
    return [e_pad]


def grow_cache(gen_cache: Any, bigger: Any,
               all_stopped: jnp.ndarray) -> Any:
    """Copy a gen cache into the next stage's larger allocation (leading
    slices at offset 0 in every dim); skipped entirely when every
    sequence already stopped (the remaining stages no-op).

    `bigger` is used for SHAPES/DTYPES only (pass `init_cache(...)` as
    before — the zeros become dead code). Each leaf grows via `jnp.pad`
    (one write pass: copy + zero-fill, vs zeros-fill + copy for a DUS
    into a fresh allocation), and leaves are CHAINED with an
    optimization barrier so leaf n+1's new buffer is not live until
    leaf n's old buffer can be freed. That bounds the growth transient
    to ~(new + largest old leaf) instead of (new + old) — the
    allocation spike that OOM'd beam N=640 by 326 MB on a 16 GB chip
    (docs/PERFORMANCE.md round-3)."""
    old_leaves, treedef = jax.tree.flatten(gen_cache)
    big_leaves, big_treedef = jax.tree.flatten(bigger)
    # a silent zip() mispair on structural drift would grow the wrong
    # leaves without error (ADVICE r3) — fail loudly like tree.map would
    assert treedef == big_treedef, (
        f"gen_cache/bigger pytree structures differ: {treedef} vs "
        f"{big_treedef}")
    grown: List[jnp.ndarray] = []
    for o, big in zip(old_leaves, big_leaves):
        if grown:
            # sequence this leaf's growth after the previous one so the
            # previous OLD leaf is dead before this NEW leaf allocates
            o, _ = lax.optimization_barrier((o, grown[-1]))
        pads = [(0, int(b) - int(s)) for b, s in zip(big.shape, o.shape)]
        grown.append(lax.cond(
            all_stopped,
            lambda x, shape=big.shape, dt=big.dtype: jnp.zeros(shape, dt),
            lambda x, p=tuple(pads), dt=big.dtype: jnp.pad(
                x.astype(dt), p),
            o))
    return jax.tree.unflatten(treedef, grown)
