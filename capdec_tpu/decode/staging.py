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
    sequence already stopped (the remaining stages no-op)."""
    return lax.cond(
        all_stopped,
        lambda old: bigger,
        lambda old: jax.tree.map(
            lambda big, o: lax.dynamic_update_slice(
                big, o.astype(big.dtype), (0,) * big.ndim),
            bigger, old),
        gen_cache)
