"""Pallas TPU kernel: fused LM-head + logsumexp + top-R over the vocab.

The decode loop's candidate step is `logits = h @ wte^T` ([B, 50257] f32,
~515 MB at B=2560) followed by `logsumexp(logits)` and `top_k(logits, R)`
— three HBM passes over a buffer that exists only to be reduced. This
kernel streams `wte` in vocab chunks (grid = batch blocks x vocab
chunks), does the chunk matmul on the MXU, and keeps ONLY running
(top-R values, top-R indices, max, sumexp) in VMEM scratch — the logits
never reach HBM.

Exactness: the top-R values/indices equal XLA's `lax.top_k` on the full
f32 logits (per-chunk R-round max with lowest-index tie-breaking, merged
against the running R — the global top-R is a subset of chunk top-Rs);
`lse` differs from a single-pass logsumexp only by f32 reduction order
(the online max/sum rescaling).

Greedy decode is the R=1 case and ignores `lse`.
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG = -1e30  # python float: jnp scalars would be captured consts in Mosaic


def _kernel(h_ref, w_ref, vals_ref, idx_ref, lse_ref,
            m_ref, l_ref, tv_ref, ti_ref, *, R: int, VC: int, V: int,
            n_chunks: int):
    TB, D = h_ref.shape
    c = pl.program_id(1)

    @pl.when(c == 0)
    def _init():
        m_ref[:] = jnp.full((TB, 1), NEG, jnp.float32)
        l_ref[:] = jnp.zeros((TB, 1), jnp.float32)
        tv_ref[:] = jnp.full((TB, R), NEG, jnp.float32)
        ti_ref[:] = jnp.zeros((TB, R), jnp.int32)

    h = h_ref[:]                                     # [TB, D]
    w = w_ref[:]                                     # [VC, D]
    s = jax.lax.dot_general(
        h, w, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)          # [TB, VC] f32
    gidx = c * VC + jax.lax.broadcasted_iota(jnp.int32, (TB, VC), 1)
    s = jnp.where(gidx < V, s, NEG)                  # mask vocab padding

    # online logsumexp
    m_old = m_ref[:]
    m_new = jnp.maximum(m_old, jnp.max(s, axis=1, keepdims=True))
    l_ref[:] = (l_ref[:] * jnp.exp(m_old - m_new)
                + jnp.sum(jnp.exp(s - m_new), axis=1, keepdims=True))
    m_ref[:] = m_new

    # chunk top-R by R rounds of (max, lowest-index argmax, mask), merged
    # against the running top-R through the same R-round selection over
    # the 2R candidates.
    run_v, run_i = tv_ref[:], ti_ref[:]
    sc = s
    new_v = []
    new_i = []
    for _ in range(R):
        cur = jnp.max(sc, axis=1, keepdims=True)             # [TB, 1]
        cur_i = jnp.min(jnp.where(sc == cur, gidx, jnp.int32(2 ** 30)),
                        axis=1, keepdims=True)
        new_v.append(cur)
        new_i.append(cur_i)
        sc = jnp.where(gidx == cur_i, NEG, sc)
    cand_v = jnp.concatenate([run_v] + new_v, axis=1)        # [TB, 2R]
    cand_i = jnp.concatenate([run_i] + new_i, axis=1)
    pos = jax.lax.broadcasted_iota(jnp.int32, cand_v.shape, 1)
    out_v = []
    out_i = []
    for _ in range(R):
        cur = jnp.max(cand_v, axis=1, keepdims=True)
        # lowest candidate-slot wins ties (keeps run/new stable order)
        cur_p = jnp.min(jnp.where(cand_v == cur, pos, jnp.int32(2 ** 30)),
                        axis=1, keepdims=True)
        sel = pos == cur_p
        cur_i = jnp.sum(jnp.where(sel, cand_i, 0), axis=1, keepdims=True)
        out_v.append(cur)
        out_i.append(cur_i)
        cand_v = jnp.where(sel, NEG, cand_v)
    tv_ref[:] = jnp.concatenate(out_v, axis=1)
    ti_ref[:] = jnp.concatenate(out_i, axis=1)

    @pl.when(c == n_chunks - 1)
    def _finalize():
        vals_ref[:] = tv_ref[:]
        idx_ref[:] = ti_ref[:]
        lse_ref[:] = m_ref[:] + jnp.log(l_ref[:])


@functools.partial(jax.jit, static_argnames=("r", "block_rows",
                                             "vocab_chunk", "interpret"))
def lm_head_topk(hidden: jnp.ndarray, wte: jnp.ndarray, r: int,
                 block_rows: int = 256, vocab_chunk: int = 1024,
                 interpret: bool = False
                 ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Fused `top_k(h @ wte^T, r)` + logsumexp.

    hidden: [B, D] (post-final-layernorm); wte: [V, D] (tied LM head).
    Returns (vals [B, r] f32, idx [B, r] int32, lse [B] f32). Exact
    top-k (values and lowest-index ties) vs XLA on the f32 logits.
    """
    B, D = hidden.shape
    V = wte.shape[0]
    TB = min(block_rows, B)
    while B % TB:
        TB -= 1
    NC = pl.cdiv(V, vocab_chunk)
    grid = (B // TB, NC)

    vals, idx, lse = pl.pallas_call(
        functools.partial(_kernel, R=r, VC=vocab_chunk, V=V, n_chunks=NC),
        grid=grid,
        in_specs=[
            pl.BlockSpec((TB, D), lambda i, c: (i, 0)),
            pl.BlockSpec((vocab_chunk, D), lambda i, c: (c, 0)),
        ],
        out_specs=[
            pl.BlockSpec((TB, r), lambda i, c: (i, 0)),
            pl.BlockSpec((TB, r), lambda i, c: (i, 0)),
            pl.BlockSpec((TB, 1), lambda i, c: (i, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, r), jnp.float32),
            jax.ShapeDtypeStruct((B, r), jnp.int32),
            jax.ShapeDtypeStruct((B, 1), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((TB, 1), jnp.float32),
            pltpu.VMEM((TB, 1), jnp.float32),
            pltpu.VMEM((TB, r), jnp.float32),
            pltpu.VMEM((TB, r), jnp.int32),
        ],
        interpret=interpret,
    )(hidden, wte)
    return vals, idx, lse[:, 0]
