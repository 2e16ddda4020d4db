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


def _fold_chunk(h, w, c, rows, m_ref, l_ref, tv_ref, ti_ref, *, R: int,
                VC: int, V: int, merge: str):
    """Shared per-(row-block, vocab-chunk) body of BOTH grid orders:
    matmul the [TB, VC] score tile, mask vocab padding, fold it into
    the running (logsumexp, top-R) state at scratch slice `rows`.
    Returns the updated (top-R values, indices) for the finalize step.
    Keeping this in one place means a fix to the online-lse or either
    merge cannot silently diverge between the batch-outer and
    vocab-outer kernels (their result-identity is test-asserted)."""
    TB = h.shape[0]
    s = jax.lax.dot_general(
        h, w, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)          # [TB, VC] f32
    gidx = c * VC + jax.lax.broadcasted_iota(jnp.int32, (TB, VC), 1)
    s = jnp.where(gidx < V, s, NEG)                  # mask vocab padding

    if merge == "lanes":
        tv, ti, m_new, l_new = _chunk_update_lanes(
            s, c * VC, tv_ref[rows, :], ti_ref[rows, :], m_ref[rows, :],
            l_ref[rows, :], R=R)
        m_ref[rows, :] = m_new
        l_ref[rows, :] = l_new
    else:
        # online logsumexp
        m_old = m_ref[rows, :]
        m_new = jnp.maximum(m_old, jnp.max(s, axis=1, keepdims=True))
        l_ref[rows, :] = (l_ref[rows, :] * jnp.exp(m_old - m_new)
                          + jnp.sum(jnp.exp(s - m_new), axis=1,
                                    keepdims=True))
        m_ref[rows, :] = m_new

        # chunk top-R merged against the running top-R (see _topr_update)
        tv, ti = _topr_update(s, gidx, tv_ref[rows, :], ti_ref[rows, :],
                              R=R)
    tv_ref[rows, :] = tv
    ti_ref[rows, :] = ti
    return tv, ti


def _init_state(rows, m_ref, l_ref, tv_ref, ti_ref, TB: int, R: int):
    m_ref[rows, :] = jnp.full((TB, 1), NEG, jnp.float32)
    l_ref[rows, :] = jnp.zeros((TB, 1), jnp.float32)
    tv_ref[rows, :] = jnp.full((TB, R), NEG, jnp.float32)
    ti_ref[rows, :] = jnp.zeros((TB, R), jnp.int32)


def _kernel(h_ref, w_ref, vals_ref, idx_ref, lse_ref,
            m_ref, l_ref, tv_ref, ti_ref, *, R: int, VC: int, V: int,
            n_chunks: int, merge: str = "rounds"):
    TB, D = h_ref.shape
    c = pl.program_id(1)
    rows = pl.ds(0, TB)  # scratch is one batch block wide in this grid

    @pl.when(c == 0)
    def _init():
        _init_state(rows, m_ref, l_ref, tv_ref, ti_ref, TB, R)

    _fold_chunk(h_ref[:], w_ref[:], c, rows, m_ref, l_ref, tv_ref,
                ti_ref, R=R, VC=VC, V=V, merge=merge)

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


def _chunk_update_lanes(s, chunk_base, run_v, run_i, m_old, l_old, *,
                        R: int):
    """Two-level chunk update: logsumexp + exact top-R merge with all
    wide reductions restructured around 128-lane column blocks.

    `_topr_update`'s R rounds each max/argmin-REDUCE across the full
    VC=2048 lane dimension — cross-lane tree reduces plus result
    re-broadcasts are the slow ops Mosaic serializes (measured ~0.3 ms
    per round at the beam shape, the kernel's dominant cost). Here:

    * Phase A (per-lane top-R): the [TB, VC] chunk is viewed as
      VC/128 STATIC 128-wide column slices (natural vreg blocks, no
      relayout). R rounds of max/argmin fold ACROSS the block list —
      pure elementwise [TB, 128] ops, zero cross-lane reductions.
      Candidate-set exactness: a global top-R element x has fewer than
      R elements above it (by value desc, global-index asc) in its own
      lane, so x is in its lane's top-R under the same order.
    * Phase B: one narrow selection over (running-R || R lane arrays) —
      R+1 column blocks — with exactly TWO 128-wide cross-lane reduces
      per round (max, then lowest-global-index among equals) instead of
      the 2048-wide reduces of the flat merge.

    The online logsumexp reuses phase A's lane-max fold for the chunk
    max and accumulates exp partials blockwise (one 128-wide final sum).
    Index uniqueness for the tie/mask logic: running entries come from
    earlier chunks (gidx < chunk_base), lane entries are distinct
    (g, lane) pairs; pad entries carry value NEG / index 2^30 and are
    never selected while any real candidate remains.
    """
    TB, VC = s.shape
    G = VC // 128
    lane = jax.lax.broadcasted_iota(jnp.int32, (TB, 128), 1)
    cols = [s[:, g * 128:(g + 1) * 128] for g in range(G)]
    idxs = [chunk_base + g * 128 + lane for g in range(G)]
    BIG = jnp.int32(2 ** 30)

    def fold_max(blocks):
        m = blocks[0]
        for b in blocks[1:]:
            m = jnp.maximum(m, b)
        return m

    def fold_argmin_idx(blocks_v, blocks_i, target):
        gi = jnp.full((TB, 128), BIG, jnp.int32)
        for bv, bi in zip(blocks_v, blocks_i):
            gi = jnp.minimum(gi, jnp.where(bv == target, bi, BIG))
        return gi

    mlane = fold_max(cols)                           # [TB, 128]

    # --- online logsumexp (blockwise partials; masked-pad cols are NEG
    # so their exp contribution is exactly 0, same as the flat path) ---
    m_new = jnp.maximum(m_old, jnp.max(mlane, axis=1, keepdims=True))
    part = jnp.zeros((TB, 128), jnp.float32)
    for col in cols:
        part = part + jnp.exp(col - m_new)
    l_new = (l_old * jnp.exp(m_old - m_new)
             + jnp.sum(part, axis=1, keepdims=True))

    # --- phase A: per-lane top-R (values desc, lowest gidx on ties) ---
    lane_v = []
    lane_i = []
    m = mlane
    for r_ in range(R):
        gi = fold_argmin_idx(cols, idxs, m)
        lane_v.append(m)
        lane_i.append(gi)
        if r_ < R - 1:
            cols = [jnp.where(bi == gi, NEG, bv)
                    for bv, bi in zip(cols, idxs)]
            m = fold_max(cols)

    # --- phase B: merge running-R with the per-lane candidates --------
    blocks_v = [jnp.pad(run_v, ((0, 0), (0, 128 - R)),
                        constant_values=NEG)] + lane_v
    blocks_i = [jnp.pad(run_i, ((0, 0), (0, 128 - R)),
                        constant_values=2 ** 30)] + lane_i
    out_v = []
    out_i = []
    for _ in range(R):
        rowmax = jnp.max(fold_max(blocks_v), axis=1, keepdims=True)
        gi = fold_argmin_idx(blocks_v, blocks_i, rowmax)
        rowgi = jnp.min(gi, axis=1, keepdims=True)
        out_v.append(rowmax)
        out_i.append(rowgi)
        blocks_v = [jnp.where((bi == rowgi) & (bv == rowmax), NEG, bv)
                    for bv, bi in zip(blocks_v, blocks_i)]
    return (jnp.concatenate(out_v, axis=1),
            jnp.concatenate(out_i, axis=1), m_new, l_new)


def _kernel_vo(h_ref, w_ref, vals_ref, idx_ref, lse_ref,
               m_ref, l_ref, tv_ref, ti_ref, *, R: int, VC: int, V: int,
               n_chunks: int, TB: int, merge: str = "rounds"):
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
        _init_state(rows, m_ref, l_ref, tv_ref, ti_ref, TB, R)

    tv, ti = _fold_chunk(h_ref[rows, :], w_ref[:], c, rows, m_ref, l_ref,
                         tv_ref, ti_ref, R=R, VC=VC, V=V, merge=merge)

    @pl.when(c == n_chunks - 1)
    def _finalize():
        vals_ref[:] = tv
        idx_ref[:] = ti
        lse_ref[:] = m_ref[rows, :] + jnp.log(l_ref[rows, :])


@functools.partial(jax.jit, static_argnames=("r", "block_rows",
                                             "vocab_chunk", "interpret",
                                             "vocab_outer", "merge"))
def lm_head_topk(hidden: jnp.ndarray, wte: jnp.ndarray, r: int,
                 block_rows: int = 256, vocab_chunk: int = 2048,
                 interpret: bool = False,
                 vocab_outer: Optional[bool] = None,
                 merge: Optional[str] = None
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
    if merge is None:
        # auto: the two-level lane merge whenever it's expressible (it
        # needs 128-lane column blocks and r slots within one block).
        # A/B on v5e at the production vc=2048 decode shapes, 4 runs
        # (scripts/lm_head_bench.py): beam B=2560/R=5 lanes wins 4/4
        # (mean 3.08 vs 3.40 ms), greedy B=1024/R=1 wins 3/4 (1.41 vs
        # 1.66 ms) with visibly lower run-to-run variance — the flat
        # merge's 2048-wide cross-lane reduces are both slower and
        # noisier than the lane-blocked folds.
        merge = "lanes" if (vocab_chunk % 128 == 0 and r < 128) \
            else "rounds"
    if merge == "lanes" and (vocab_chunk % 128 or r >= 128):
        raise ValueError("merge='lanes' requires vocab_chunk % 128 == 0 "
                         "and r < 128")

    if vocab_outer:
        vals, idx, lse = pl.pallas_call(
            functools.partial(_kernel_vo, R=r, VC=vocab_chunk, V=V,
                              n_chunks=NC, TB=TB, merge=merge),
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
        functools.partial(_kernel, R=r, VC=vocab_chunk, V=V, n_chunks=NC,
                          merge=merge),
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
