"""Pallas TPU kernel: fused LM-head + logsumexp + top-R over the vocab.

The decode loop's candidate step is `logits = h @ wte^T` ([B, 50257] f32,
~515 MB at B=2560) followed by `logsumexp(logits)` and `top_k(logits, R)`
— three HBM passes over a buffer that exists only to be reduced. This
kernel streams `wte` in vocab chunks (grid = batch blocks x vocab
chunks), does the chunk matmul on the MXU, and keeps ONLY running
(top-R values, top-R indices, max, sumexp) in VMEM scratch — the logits
never reach HBM.

Exactness: selection-exact — the top-R indices (incl. lowest-index tie
breaking) equal XLA's `lax.top_k` on the f32 logits (per-chunk R-round
max with lowest-index tie-breaking, merged against the running R — the
global top-R is a subset of chunk top-Rs). Values/`lse` carry f32
accumulation but can differ from a single full-shape matmul by
reduction order (~1 ULP); on TPU the kernel is strictly MORE precise
than the engine's XLA path, whose logits are rounded to the bf16
compute dtype before the f32 cast.

Greedy decode is the R=1 case and ignores `lse`.
"""
from __future__ import annotations

import functools
from typing import Optional, Tuple

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

    # chunk top-R merged against the running top-R (see _topr_update)
    tv, ti = _topr_update(s, gidx, tv_ref[:], ti_ref[:], R=R)
    tv_ref[:] = tv
    ti_ref[:] = ti

    @pl.when(c == n_chunks - 1)
    def _finalize():
        vals_ref[:] = tv_ref[:]
        idx_ref[:] = ti_ref[:]
        lse_ref[:] = m_ref[:] + jnp.log(l_ref[:])


def _topr_update(s, gidx, run_v, run_i, *, R: int):
    """Merge a score chunk `s` (global indices `gidx`) into the running
    top-R (run_v, run_i): R rounds of (max, lowest-index argmax, mask)
    over the chunk, then the same R-round selection over the 2R
    candidates. Returns the new (top-R values, indices)."""
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
    return jnp.concatenate(out_v, axis=1), jnp.concatenate(out_i, axis=1)


def _kernel_vo(h_ref, w_ref, vals_ref, idx_ref, lse_ref,
               m_ref, l_ref, tv_ref, ti_ref, *, R: int, VC: int, V: int,
               n_chunks: int, TB: int):
    """Vocab-OUTER grid variant: grid = (vocab chunks, batch blocks).

    The full [B, D] hidden block has a constant index map (DMA'd into
    VMEM once for the whole kernel) and each weight chunk's index map
    repeats across the inner batch dimension (DMA'd once per chunk) —
    the tied-head weights stream HBM->VMEM exactly ONCE total instead
    of once per batch block (B/TB times, the v1 grid's dominant traffic
    term: ~770 MB/step at beam N=512 vs ~77 MB here). Running state
    lives in full-B VMEM scratch sliced per batch block."""
    c = pl.program_id(0)
    i = pl.program_id(1)
    rows = pl.ds(i * TB, TB)

    @pl.when(c == 0)
    def _init():
        m_ref[rows, :] = jnp.full((TB, 1), NEG, jnp.float32)
        l_ref[rows, :] = jnp.zeros((TB, 1), jnp.float32)
        tv_ref[rows, :] = jnp.full((TB, R), NEG, jnp.float32)
        ti_ref[rows, :] = jnp.zeros((TB, R), jnp.int32)

    h = h_ref[rows, :]                               # [TB, D]
    w = w_ref[:]                                     # [VC, D]
    s = jax.lax.dot_general(
        h, w, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)          # [TB, VC] f32
    gidx = c * VC + jax.lax.broadcasted_iota(jnp.int32, (TB, VC), 1)
    s = jnp.where(gidx < V, s, NEG)                  # mask vocab padding

    # online logsumexp
    m_old = m_ref[rows, :]
    m_new = jnp.maximum(m_old, jnp.max(s, axis=1, keepdims=True))
    l_ref[rows, :] = (l_ref[rows, :] * jnp.exp(m_old - m_new)
                      + jnp.sum(jnp.exp(s - m_new), axis=1, keepdims=True))
    m_ref[rows, :] = m_new

    tv, ti = _topr_update(s, gidx, tv_ref[rows, :], ti_ref[rows, :], R=R)
    tv_ref[rows, :] = tv
    ti_ref[rows, :] = ti

    @pl.when(c == n_chunks - 1)
    def _finalize():
        vals_ref[:] = tv
        idx_ref[:] = ti
        lse_ref[:] = m_ref[rows, :] + jnp.log(l_ref[rows, :])


@functools.partial(jax.jit, static_argnames=("r", "block_rows",
                                             "vocab_chunk", "interpret",
                                             "vocab_outer"))
def lm_head_topk(hidden: jnp.ndarray, wte: jnp.ndarray, r: int,
                 block_rows: int = 256, vocab_chunk: int = 2048,
                 interpret: bool = False,
                 vocab_outer: Optional[bool] = None
                 ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Fused `top_k(h @ wte^T, r)` + logsumexp.

    hidden: [B, D] (post-final-layernorm); wte: [V, D] (tied LM head).
    Returns (vals [B, r] f32, idx [B, r] int32, lse [B] f32). Selection-
    exact vs `lax.top_k` on the f32 logits (see module docstring).

    vocab_outer: grid order. True = weights stream HBM->VMEM once total
    (full-B hidden VMEM-resident; needs B*D + running state + the w
    chunk + the [TB, VC] score block to fit the 16 MB VMEM scope).
    False (auto default) = v1 grid: batch outer, weights re-stream per
    batch block. Measured on v5e at production decode shapes: a WASH
    (the kernel is VPU-bound on the R-round top-R merge, and the
    per-block weight re-streaming overlaps compute), and vocab_outer
    VMEM-OOMs first when vocab_chunk grows — which IS worth ~0.5 ms at
    the beam shape (4.2 -> 3.7 ms at vc=2048). So the default is the
    batch-outer grid at vc=2048.
    """
    B, D = hidden.shape
    V = wte.shape[0]
    TB = min(block_rows, B)
    while B % TB:
        TB -= 1
    NC = pl.cdiv(V, vocab_chunk)
    if vocab_outer is None:
        vocab_outer = False

    if vocab_outer:
        vals, idx, lse = pl.pallas_call(
            functools.partial(_kernel_vo, R=r, VC=vocab_chunk, V=V,
                              n_chunks=NC, TB=TB),
            grid=(NC, B // TB),
            in_specs=[
                pl.BlockSpec((B, D), lambda c, i: (0, 0)),
                pl.BlockSpec((vocab_chunk, D), lambda c, i: (c, 0)),
            ],
            out_specs=[
                pl.BlockSpec((TB, r), lambda c, i: (i, 0)),
                pl.BlockSpec((TB, r), lambda c, i: (i, 0)),
                pl.BlockSpec((TB, 1), lambda c, i: (i, 0)),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((B, r), jnp.float32),
                jax.ShapeDtypeStruct((B, r), jnp.int32),
                jax.ShapeDtypeStruct((B, 1), jnp.float32),
            ],
            scratch_shapes=[
                pltpu.VMEM((B, 1), jnp.float32),
                pltpu.VMEM((B, 1), jnp.float32),
                pltpu.VMEM((B, r), jnp.float32),
                pltpu.VMEM((B, r), jnp.int32),
            ],
            interpret=interpret,
        )(hidden, wte)
        return vals, idx, lse[:, 0]

    vals, idx, lse = pl.pallas_call(
        functools.partial(_kernel, R=r, VC=vocab_chunk, V=V, n_chunks=NC),
        grid=(B // TB, NC),
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
