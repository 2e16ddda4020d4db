"""Pallas TPU kernel: fused beam-decode attention over split KV caches.

One decode step of one transformer layer, fully fused:
    scores = q · [prefix_cache | gen_cache(slots < step) | k_new] per head
    probs  = softmax(scores)
    out    = probs · [prefix_v | gen_v | v_new]
    gen_cache[:, step] = (k_new, v_new)          (in-place, aliased buffers)

Design notes (see /opt/skills/guides/pallas_guide.md):
  * Caches are seq-major [rows, S, H*hd=768]: the 768-lane payload is the
    hardware-friendly lane dimension (6×128), and the per-step cache write
    is one contiguous [TB, 1, 768] block whose out-spec index_map is
    driven by the scalar-prefetched `step` — only the written slot leaves
    VMEM, the rest of the aliased buffer is untouched.
  * Per-head score/output reductions are matmuls against a constant 0/1
    "head grouping" matrix G [768, 128] (G[d, h]=1 iff d//64==h): the MXU
    does the segmented reduction and its transpose broadcast, avoiding
    sublane-hostile 3-D reshapes on the VPU.
  * Softmax runs on [TB, S, 128] where the 116 dead lanes carry zeros —
    each lane is an independent softmax, junk lanes are dropped by G^T.
  * The prefix cache is shared per image: its block is repeated
    `beams_per_image` times inside VMEM, never in HBM.

The pure-XLA equivalent lives in models/gpt2.decode_step; `interpret=True`
makes this kernel runnable on CPU for tests.
"""
from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e9


def _head_matrix(n_embd: int, head_dim: int, dtype=jnp.bfloat16) -> jnp.ndarray:
    """G [D, 128]: G[d, h] = 1 iff h == d // head_dim (h < n_heads)."""
    d = np.arange(n_embd)
    g = np.zeros((n_embd, 128), np.float32)
    g[d, d // head_dim] = 1.0
    return jnp.asarray(g, dtype)


def _mask_padded_prefix(sp, k_true: Optional[int], TB: int, K: int):
    """NEG_INF the scores of prefix slots >= k_true (static no-op when the
    prefix is unpadded). The padded K/V rows are zeros, so after the
    softmax their probabilities are exactly 0 and the value pass adds
    nothing — identical to decoding with the true-K cache.

    Why padding exists: the XLA:TPU backend (lower_to_llo) CHECK-crashes
    (`d >> 32 == 0 (-1 vs 0)`) compiling these kernels when the prefix
    slot count K is 4 mod 8 AND n_embd is a single 128-lane tile
    (measured on v5e 2026-08: K=4,12 crash, K=5,8,16,40 compile, any K
    at D=768 compiles). The beam engine pads the prefix cache to an
    8-multiple (gpt2.pad_prefix_cache) and passes the true length here."""
    if k_true is None or k_true >= K:
        return sp
    pid = jax.lax.broadcasted_iota(jnp.int32, (TB, K, 1), 1)
    return jnp.where(pid < k_true, sp, NEG_INF)


def _kernel(step_ref, q_ref, kn_ref, vn_ref, pk_ref, pv_ref, gk_ref, gv_ref,
            g_ref, out_ref, gk_out_ref, gv_out_ref, *, beams_per_image: int,
            head_dim: int, scale: float):
    TB, _, D = q_ref.shape
    TI, K, _ = pk_ref.shape
    E = gk_ref.shape[1]  # gk_ref: [TB, E, 1, D]
    R = beams_per_image
    step = step_ref[0]

    g = g_ref[:]                                    # [D, 128] bf16
    q = q_ref[:, 0, :]                              # [TB, D]
    k_new = kn_ref[:, 0, :]
    v_new = vn_ref[:, 0, :]

    # ---- in-place cache write: only the current slot leaves VMEM --------
    gk_out_ref[:, 0, 0, :] = k_new.astype(gk_out_ref.dtype)
    gv_out_ref[:, 0, 0, :] = v_new.astype(gv_out_ref.dtype)

    # ---- scores ---------------------------------------------------------
    def heads(x2d):  # [S, D] -> [S, 128] per-head sums via MXU
        return jax.lax.dot_general(
            x2d.astype(jnp.bfloat16), g,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    # current-token column [TB, 128]
    sc = heads(q * k_new) * scale

    # generated slots [TB, E, 128]
    prod_g = (gk_ref[:, :, 0, :].astype(jnp.bfloat16)
              * q[:, None, :].astype(jnp.bfloat16))
    sg = heads(prod_g.reshape(TB * E, D)).reshape(TB, E, 128) * scale
    slot_ids = jax.lax.broadcasted_iota(jnp.int32, (TB, E, 1), 1)
    sg = jnp.where(slot_ids < step, sg, NEG_INF)

    # prefix slots [TB, K, 128] — repeat each image's rows across its beams
    pk_rep = jnp.repeat(pk_ref[:], R, axis=0)       # [TB, K, D]
    pv_rep = jnp.repeat(pv_ref[:], R, axis=0)
    prod_p = pk_rep.astype(jnp.bfloat16) * q[:, None, :].astype(jnp.bfloat16)
    sp = heads(prod_p.reshape(TB * K, D)).reshape(TB, K, 128) * scale

    scores = jnp.concatenate([sp, sg, sc[:, None, :]], axis=1)  # [TB,S,128]

    # ---- softmax over slots (axis 1); each lane independent -------------
    m = jnp.max(scores, axis=1, keepdims=True)
    e = jnp.exp(scores - m)
    denom = jnp.sum(e, axis=1, keepdims=True)
    probs = e / denom

    # ---- output: spread probs back over lanes and reduce over slots -----
    def spread(p):  # [S', 128] -> [S', D]
        return jax.lax.dot_general(
            p.astype(jnp.bfloat16), g,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32).astype(jnp.bfloat16)

    S_total = K + E + 1
    p_all = spread(probs.reshape(TB * S_total, 128)).reshape(TB, S_total, D)
    out = jnp.sum(p_all[:, :K, :] * pv_rep.astype(jnp.bfloat16),
                  axis=1, dtype=jnp.float32)
    # Zero the value products of invalid slots through `where`, mirroring
    # gpt2.decode_step: slots >= step may hold arbitrary bits (the bounded
    # reorder skips them) and 0 * NaN == NaN would poison the sum.
    gen_prod = jnp.where(slot_ids < step,
                         p_all[:, K:K + E, :]
                         * gv_ref[:, :, 0, :].astype(jnp.bfloat16),
                         jnp.bfloat16(0.0))
    out = out + jnp.sum(gen_prod, axis=1, dtype=jnp.float32)
    out = out + p_all[:, K + E, :].astype(jnp.float32) * v_new.astype(jnp.float32)
    out_ref[:, 0, :] = out.astype(out_ref.dtype)


def _reduce_fns(g, head_dim: int, vector_reduce: bool):
    """(heads, spread) pair: per-head segmented score reduction
    [S, D] -> [S, 128] and its transpose broadcast [S', 128] -> [S', D].

    Matmul path: one MXU dot against the 0/1 head-grouping matrix G —
    burns 2*S*D*128 MACs for H useful lanes (the MXU tile forces 128
    output columns) but avoids sublane-hostile 3-D reshapes. Vector
    path: f32 reshape+sum / lane-repeat on the VPU — trades the MXU
    waste for elementwise work.

    HARDWARE REJECTION (v5e, 2026-08): the vector path does not lower —
    Mosaic fails with `unsupported shape cast` on the lane-splitting
    reshape `vector<Sx768xf32> -> vector<Sx12x64xf32>` (the lane dim
    can only be re-tiled through a relayout Mosaic refuses in-kernel),
    for BOTH the v2 and v3 kernels. Lowerable alternatives all reduce
    to either per-head 64-lane cross-lane reduces (~7 serialized vreg
    ops x 12 heads, worse than the one pipelined MXU dot) or a
    block-diagonal matmul with identical MAC count to G. The MXU path
    stays production; vector_reduce is kept interpret-mode-only as the
    algorithm record (oracle tests pass under interpret=True).
    """
    D = g.shape[0]
    H = D // head_dim
    if vector_reduce:
        def heads(x2d):  # [S, D] -> [S, 128], scores in the first H lanes
            s = jnp.sum(x2d.astype(jnp.float32).reshape(
                x2d.shape[0], H, head_dim), axis=-1)
            return jnp.pad(s, ((0, 0), (0, 128 - H)))

        def spread(p):  # [S', 128] -> [S', D]
            return jnp.repeat(p[:, :H].astype(jnp.bfloat16), head_dim,
                              axis=-1)
    else:
        def heads(x2d):  # [S, D] -> [S, 128] per-head sums via MXU
            return jax.lax.dot_general(
                x2d.astype(jnp.bfloat16), g,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)

        def spread(p):  # [S', 128] -> [S', D]
            return jax.lax.dot_general(
                p.astype(jnp.bfloat16), g,
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32).astype(jnp.bfloat16)
    return heads, spread


def _kernel_rm(scal_ref, q_ref, kn_ref, vn_ref, pk_ref, pv_ref, gk_ref,
               gv_ref, g_ref, out_ref, *, beams_per_image: int,
               head_dim: int, scale: float, vector_reduce: bool = False,
               k_true: Optional[int] = None):
    """v2: row-major [B, L, E, D] caches, pure function (no aliased
    outputs — the slot write is `ops.cache_reorder.write_gen_slot`).

    v1 fused the slot write via aliased in/out buffers, which blocks the
    Mosaic pipeline from prefetching the next input block while an output
    write to the same buffer is pending — measured 2.3x slower than the
    XLA path. Read-only cache blocks restore full double-buffering.
    """
    TB, _, D = q_ref.shape
    _, TI, K, _ = pk_ref.shape
    E = gk_ref.shape[2]  # gk_ref: [TB, 1, E, D]
    R = beams_per_image
    step = scal_ref[0]

    g = g_ref[:]                                    # [D, 128] bf16
    q = q_ref[:, 0, :]                              # [TB, D]
    k_new = kn_ref[:, 0, :]
    v_new = vn_ref[:, 0, :]

    heads, spread = _reduce_fns(g, head_dim, vector_reduce)

    sc = heads(q * k_new) * scale                   # current token [TB, 128]

    gk = gk_ref[:, 0, :, :]                         # [TB, E, D]
    gv = gv_ref[:, 0, :, :]
    prod_g = gk.astype(jnp.bfloat16) * q[:, None, :].astype(jnp.bfloat16)
    sg = heads(prod_g.reshape(TB * E, D)).reshape(TB, E, 128) * scale
    slot_ids = jax.lax.broadcasted_iota(jnp.int32, (TB, E, 1), 1)
    sg = jnp.where(slot_ids < step, sg, NEG_INF)

    pk_rep = jnp.repeat(pk_ref[0], R, axis=0)       # [TB, K, D]
    pv_rep = jnp.repeat(pv_ref[0], R, axis=0)
    prod_p = pk_rep.astype(jnp.bfloat16) * q[:, None, :].astype(jnp.bfloat16)
    sp = heads(prod_p.reshape(TB * K, D)).reshape(TB, K, 128) * scale
    sp = _mask_padded_prefix(sp, k_true, TB, K)

    scores = jnp.concatenate([sp, sg, sc[:, None, :]], axis=1)  # [TB,S,128]
    m = jnp.max(scores, axis=1, keepdims=True)
    e = jnp.exp(scores - m)
    denom = jnp.sum(e, axis=1, keepdims=True)
    probs = e / denom

    S_total = K + E + 1
    p_all = spread(probs.reshape(TB * S_total, 128)).reshape(TB, S_total, D)
    out = jnp.sum(p_all[:, :K, :] * pv_rep.astype(jnp.bfloat16),
                  axis=1, dtype=jnp.float32)
    gen_prod = jnp.where(slot_ids < step,
                         p_all[:, K:K + E, :] * gv.astype(jnp.bfloat16),
                         jnp.bfloat16(0.0))
    out = out + jnp.sum(gen_prod, axis=1, dtype=jnp.float32)
    out = out + p_all[:, K + E, :].astype(jnp.float32) * v_new.astype(jnp.float32)
    out_ref[:, 0, :] = out.astype(out_ref.dtype)


def _kernel_rm_q(scal_ref, q_ref, kn_ref, vn_ref, pk_ref, pv_ref, gk_ref,
                 gv_ref, gks_ref, gvs_ref, g_ref, out_ref, *,
                 beams_per_image: int, head_dim: int, scale: float,
                 k_true: Optional[int] = None):
    """int8-KV variant of _kernel_rm: the generated cache streams as int8
    with per-(row, layer, slot) absmax scales (written by
    ops.cache_reorder.write_gen_slot_chunk_q). The scales factor out of
    the per-head reductions: scores scale row-wise after the G-matmul and
    V-scales fold into the probabilities before the spread.

    The scales blocks always carry the FULL slot width and are sliced to
    the levels' (possibly e_cap-bounded) width in-kernel: their slot dim
    is the LAST memref dim, and Mosaic only allows last-dim blocks that
    are 128-multiples or the whole dim — an e_cap-sized block fails to
    lower on hardware (interpret mode does not check this). They are
    tiny (f32 per slot), so the extra DMA is noise."""
    TB, _, D = q_ref.shape
    _, TI, K, _ = pk_ref.shape
    E = gk_ref.shape[2]  # gk_ref: [TB, 1, E, D] int8; E = e_cap when bounded
    R = beams_per_image
    step = scal_ref[0]

    g = g_ref[:]
    q = q_ref[:, 0, :]
    k_new = kn_ref[:, 0, :]
    v_new = vn_ref[:, 0, :]

    def heads(x2d):
        return jax.lax.dot_general(
            x2d.astype(jnp.bfloat16), g,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    sc = heads(q * k_new) * scale

    gk = gk_ref[:, 0, :, :].astype(jnp.bfloat16)    # dequant levels [TB,E,D]
    gv = gv_ref[:, 0, :, :].astype(jnp.bfloat16)
    ks = gks_ref[:, 0, 0, :E]                       # [TB, E] f32
    vs = gvs_ref[:, 0, 0, :E]
    prod_g = gk * q[:, None, :].astype(jnp.bfloat16)
    sg = heads(prod_g.reshape(TB * E, D)).reshape(TB, E, 128)
    sg = sg * (ks * scale)[:, :, None]              # per-slot dequant
    slot_ids = jax.lax.broadcasted_iota(jnp.int32, (TB, E, 1), 1)
    sg = jnp.where(slot_ids < step, sg, NEG_INF)

    pk_rep = jnp.repeat(pk_ref[0], R, axis=0)
    pv_rep = jnp.repeat(pv_ref[0], R, axis=0)
    prod_p = pk_rep.astype(jnp.bfloat16) * q[:, None, :].astype(jnp.bfloat16)
    sp = heads(prod_p.reshape(TB * K, D)).reshape(TB, K, 128) * scale
    sp = _mask_padded_prefix(sp, k_true, TB, K)

    scores = jnp.concatenate([sp, sg, sc[:, None, :]], axis=1)
    m = jnp.max(scores, axis=1, keepdims=True)
    e = jnp.exp(scores - m)
    denom = jnp.sum(e, axis=1, keepdims=True)
    probs = e / denom
    # fold the V dequant scales into the gen probabilities (spread is
    # linear), so the value pass below stays identical to the fp kernel.
    # Built as one concatenated multiplier: .at[].multiply would lower to
    # an unsupported scatter-mul on TPU.
    ones_k = jnp.ones((TB, K), jnp.float32)
    ones_c = jnp.ones((TB, 1), jnp.float32)
    mult = jnp.concatenate([ones_k, vs, ones_c], axis=1)  # [TB, S]
    probs = probs * mult[:, :, None]

    def spread(p):
        return jax.lax.dot_general(
            p.astype(jnp.bfloat16), g,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32).astype(jnp.bfloat16)

    S_total = K + E + 1
    p_all = spread(probs.reshape(TB * S_total, 128)).reshape(TB, S_total, D)
    out = jnp.sum(p_all[:, :K, :] * pv_rep.astype(jnp.bfloat16),
                  axis=1, dtype=jnp.float32)
    gen_prod = jnp.where(slot_ids < step, p_all[:, K:K + E, :] * gv,
                         jnp.bfloat16(0.0))
    out = out + jnp.sum(gen_prod, axis=1, dtype=jnp.float32)
    out = out + p_all[:, K + E, :].astype(jnp.float32) * v_new.astype(jnp.float32)
    out_ref[:, 0, :] = out.astype(out_ref.dtype)


def _kernel_rm_chunked(scal_ref, q_ref, kn_ref, vn_ref, pk_ref, pv_ref,
                       gk_ref, gv_ref, g_ref, out_ref, m_ref, l_ref, acc_ref,
                       *, beams_per_image: int, head_dim: int, scale: float,
                       n_chunks: int, chunk: int, int8_scales=None,
                       prefix_scales=None, vector_reduce: bool = False,
                       k_true: Optional[int] = None):
    """v3: slot-bounded generated-cache reads via a chunk grid dimension.

    Grid is (batch_blocks, n_chunks) with the chunk axis innermost. The
    generated cache streams as (TB, 1, C, D) chunk blocks whose index map
    clamps at the chunk containing `step` — Mosaic issues no DMA when the
    block index repeats, so per step only ceil(step/C) chunks of the cache
    leave HBM instead of the whole allocation. Softmax is accumulated
    online (flash style) in VMEM scratch across chunk iterations:
      c == 0          : prefix + current-token scores initialize (m, l, acc)
      c*C < step      : fold the chunk's scores/values into (m, l, acc)
      c == n_chunks-1 : normalize and write out (the out block's index is
                        constant in c, so it is flushed once per batch block)
    With `int8_scales` (gks_ref, gvs_ref blocks, f32 [TB, 1, 1, E]) the
    generated chunks are int8 levels; K-scales multiply scores after the
    head reduction and V-scales fold into the probabilities. Numerics
    match the one-pass kernels to bf16 tolerance (different reduction
    order — flash rescaling)."""
    TB, _, D = q_ref.shape
    _, TI, K, _ = pk_ref.shape
    C = chunk
    R = beams_per_image
    step = scal_ref[0]
    c = pl.program_id(1)

    g = g_ref[:]                                    # [D, 128] bf16
    q = q_ref[:, 0, :]                              # [TB, D]

    # Scores land in the first H of 128 lanes (zero elsewhere) on both
    # paths, keeping the softmax/accumulator shapes identical.
    heads, spread = _reduce_fns(g, head_dim, vector_reduce)

    @pl.when(c == 0)
    def _init():
        k_new = kn_ref[:, 0, :]
        v_new = vn_ref[:, 0, :]
        sc = heads(q * k_new) * scale               # current token [TB, 128]
        pk_rep = jnp.repeat(pk_ref[0], R, axis=0)   # [TB, K, D]
        pv_rep = jnp.repeat(pv_ref[0], R, axis=0)
        prod_p = (pk_rep.astype(jnp.bfloat16)
                  * q[:, None, :].astype(jnp.bfloat16))
        sp = heads(prod_p.reshape(TB * K, D)).reshape(TB, K, 128)
        if prefix_scales is not None:
            # int8 prefix cache: pk/pv blocks are levels; per-(image,
            # slot) K-scales multiply scores after the head reduction,
            # V-scales fold into the probabilities before the spread.
            pks_ref, pvs_ref = prefix_scales
            pks_rep = jnp.repeat(pks_ref[0, :, 0, :], R, axis=0)  # [TB, K]
            pvs_rep = jnp.repeat(pvs_ref[0, :, 0, :], R, axis=0)
            sp = sp * (pks_rep * scale)[:, :, None]
        else:
            sp = sp * scale
        sp = _mask_padded_prefix(sp, k_true, TB, K)
        scores = jnp.concatenate([sp, sc[:, None, :]], axis=1)  # [TB,K+1,128]
        m0 = jnp.max(scores, axis=1)                             # [TB, 128]
        e = jnp.exp(scores - m0[:, None, :])
        l0 = jnp.sum(e, axis=1)
        if prefix_scales is not None:
            ones_c = jnp.ones((TB, 1), jnp.float32)
            e_v = e * jnp.concatenate([pvs_rep, ones_c], axis=1)[:, :, None]
        else:
            e_v = e
        p_all = spread(e_v.reshape(TB * (K + 1), 128)).reshape(TB, K + 1, D)
        acc = jnp.sum(p_all[:, :K, :] * pv_rep.astype(jnp.bfloat16),
                      axis=1, dtype=jnp.float32)
        acc = acc + (p_all[:, K, :].astype(jnp.float32)
                     * v_new.astype(jnp.float32))
        m_ref[:] = m0
        l_ref[:] = l0
        acc_ref[:] = acc

    @pl.when(c * C < step)
    def _chunk():
        gk = gk_ref[:, 0, :, :]                     # [TB, C, D] (or int8)
        gv = gv_ref[:, 0, :, :]
        prod_g = (gk.astype(jnp.bfloat16)
                  * q[:, None, :].astype(jnp.bfloat16))
        sg = heads(prod_g.reshape(TB * C, D)).reshape(TB, C, 128)
        slot_ids = c * C + jax.lax.broadcasted_iota(jnp.int32, (TB, C, 1), 1)
        if int8_scales is not None:
            gks_ref, gvs_ref = int8_scales
            E_s = gks_ref.shape[3]
            # chunk-select the per-slot scales with a dynamic one-hot
            # (E_s x C) matmul: a dynamic-start lane-dim slice would not
            # lower, the tiny MXU contraction always does.
            sel = (jax.lax.broadcasted_iota(jnp.int32, (E_s, C), 0) - c * C
                   == jax.lax.broadcasted_iota(jnp.int32, (E_s, C), 1)
                   ).astype(jnp.float32)
            ks_c = jax.lax.dot_general(
                gks_ref[:, 0, 0, :], sel,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)          # [TB, C]
            vs_c = jax.lax.dot_general(
                gvs_ref[:, 0, 0, :], sel,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            sg = sg * (ks_c * scale)[:, :, None]
        else:
            sg = sg * scale
        sg = jnp.where(slot_ids < step, sg, NEG_INF)
        m_old = m_ref[:]
        l_old = l_ref[:]
        m_new = jnp.maximum(m_old, jnp.max(sg, axis=1))
        corr = jnp.exp(m_old - m_new)                        # [TB, 128]
        e = jnp.exp(sg - m_new[:, None, :])                  # [TB, C, 128]
        l_ref[:] = l_old * corr + jnp.sum(e, axis=1)
        if int8_scales is not None:
            e_v = e * vs_c[:, :, None]
        else:
            e_v = e
        p = spread(e_v.reshape(TB * C, 128)).reshape(TB, C, D)
        part = jnp.sum(
            jnp.where(slot_ids < step, p * gv.astype(jnp.bfloat16),
                      jnp.bfloat16(0.0)),
            axis=1, dtype=jnp.float32)
        corr_d = spread(corr[:, None, :].reshape(TB, 128)
                        ).astype(jnp.float32)                # [TB, D]
        acc_ref[:] = acc_ref[:] * corr_d + part
        m_ref[:] = m_new

    @pl.when(c == n_chunks - 1)
    def _finalize():
        l_d = spread(l_ref[:]).astype(jnp.float32)           # [TB, D]
        out_ref[:, 0, :] = (acc_ref[:] / l_d).astype(out_ref.dtype)


def _chunked_blockspecs(TB, TI, K, D, E, C):
    """BlockSpecs shared by the fp and int8 chunked kernels. Grid is
    (batch_blocks, n_chunks); s = (step, layer) scalars. The gen-cache
    chunk index clamps at step's chunk so exhausted chunks re-use the
    resident block (no DMA)."""
    def gen_idx(i, c, s, C=C):
        cmax = jnp.maximum((s[0] - 1) // C, 0)
        return (i, s[1], jnp.minimum(c, cmax), 0)

    const = [
        pl.BlockSpec((TB, 1, D), lambda i, c, s: (i, 0, 0)),
        pl.BlockSpec((TB, 1, D), lambda i, c, s: (i, 0, 0)),
        pl.BlockSpec((TB, 1, D), lambda i, c, s: (i, 0, 0)),
        pl.BlockSpec((1, TI, K, D), lambda i, c, s: (s[1], i, 0, 0)),
        pl.BlockSpec((1, TI, K, D), lambda i, c, s: (s[1], i, 0, 0)),
    ]
    gen = [
        pl.BlockSpec((TB, 1, C, D), gen_idx),
        pl.BlockSpec((TB, 1, C, D), gen_idx),
    ]
    return const, gen


@functools.partial(jax.jit,
                   static_argnames=("beams_per_image", "head_dim",
                                    "block_beams", "chunk", "interpret",
                                    "vector_reduce", "k_true"))
def beam_decode_attention_chunked(
        q: jnp.ndarray, k_new: jnp.ndarray, v_new: jnp.ndarray,
        pk: jnp.ndarray, pv: jnp.ndarray, gk: jnp.ndarray, gv: jnp.ndarray,
        step: jnp.ndarray, layer: jnp.ndarray, *, beams_per_image: int,
        head_dim: int, block_beams: int = 20, chunk: int = 8,
        vector_reduce: bool = False,
        interpret: bool = False,
        k_true: Optional[int] = None) -> jnp.ndarray:
    """Slot-bounded fused decode attention (v3) over row-major caches.

    Same contract as `beam_decode_attention_rowmajor`, but the generated
    cache streams in `chunk`-slot blocks bounded by `step`: per step only
    ceil(step/chunk) chunks leave HBM instead of the full allocation, so
    the decode engine can run a single full-size cache (no staged growth,
    no grow copies) while early steps stay cheap. E must be a multiple of
    `chunk` (cache allocs are 8-aligned). `k_true`: true prefix length
    when pk/pv carry 8-alignment padding (see _mask_padded_prefix)."""
    B, D = q.shape
    L, N, K, _ = pk.shape
    E = gk.shape[2]
    R = beams_per_image
    if B % R:
        raise ValueError(f"batch {B} is not a multiple of beams_per_image {R}")
    if E % chunk:
        raise ValueError(f"E ({E}) must be a multiple of chunk ({chunk})")
    TB = R * max(1, min(block_beams, B) // R)
    while B % TB:
        TB -= R
    TI = TB // R
    NC = E // chunk
    grid = (B // TB, NC)
    g = _head_matrix(D, head_dim)
    scale = 1.0 / (head_dim ** 0.5)

    kernel = functools.partial(_kernel_rm_chunked, beams_per_image=R,
                               head_dim=head_dim, scale=scale,
                               n_chunks=NC, chunk=chunk,
                               vector_reduce=vector_reduce, k_true=k_true)
    const, gen = _chunked_blockspecs(TB, TI, K, D, E, chunk)
    out = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=const + gen + [
                pl.BlockSpec((D, 128), lambda i, c, s: (0, 0)),
            ],
            out_specs=[
                pl.BlockSpec((TB, 1, D), lambda i, c, s: (i, 0, 0)),
            ],
            scratch_shapes=[
                pltpu.VMEM((TB, 128), jnp.float32),
                pltpu.VMEM((TB, 128), jnp.float32),
                pltpu.VMEM((TB, D), jnp.float32),
            ],
        ),
        out_shape=[jax.ShapeDtypeStruct((B, 1, D), jnp.float32)],
        interpret=interpret,
    )(jnp.stack([step.astype(jnp.int32), layer.astype(jnp.int32)]),
      q[:, None, :], k_new[:, None, :], v_new[:, None, :], pk, pv, gk, gv, g)
    return out[0][:, 0, :]


def _kernel_rm_chunked_q(scal_ref, q_ref, kn_ref, vn_ref, pk_ref, pv_ref,
                         gk_ref, gv_ref, gks_ref, gvs_ref, g_ref, out_ref,
                         m_ref, l_ref, acc_ref, **kw):
    _kernel_rm_chunked(scal_ref, q_ref, kn_ref, vn_ref, pk_ref, pv_ref,
                       gk_ref, gv_ref, g_ref, out_ref, m_ref, l_ref,
                       acc_ref, int8_scales=(gks_ref, gvs_ref), **kw)


def _kernel_rm_chunked_q8p(scal_ref, q_ref, kn_ref, vn_ref, pk_ref, pv_ref,
                           pks_ref, pvs_ref, gk_ref, gv_ref, gks_ref,
                           gvs_ref, g_ref, out_ref, m_ref, l_ref, acc_ref,
                           **kw):
    _kernel_rm_chunked(scal_ref, q_ref, kn_ref, vn_ref, pk_ref, pv_ref,
                       gk_ref, gv_ref, g_ref, out_ref, m_ref, l_ref,
                       acc_ref, int8_scales=(gks_ref, gvs_ref),
                       prefix_scales=(pks_ref, pvs_ref), **kw)


@functools.partial(jax.jit,
                   static_argnames=("beams_per_image", "head_dim",
                                    "block_beams", "chunk", "interpret",
                                    "k_true"))
def beam_decode_attention_chunked_q(
        q: jnp.ndarray, k_new: jnp.ndarray, v_new: jnp.ndarray,
        pk: jnp.ndarray, pv: jnp.ndarray, gk: jnp.ndarray, gv: jnp.ndarray,
        gks: jnp.ndarray, gvs: jnp.ndarray,
        step: jnp.ndarray, layer: jnp.ndarray, *, beams_per_image: int,
        head_dim: int, block_beams: int = 20, chunk: int = 8,
        pks: jnp.ndarray = None, pvs: jnp.ndarray = None,
        interpret: bool = False,
        k_true: Optional[int] = None) -> jnp.ndarray:
    """`beam_decode_attention_chunked` over an int8 generated cache
    (levels gk/gv int8 [B, L, E, D]; scales gks/gvs f32 [B, L, 1, E]).
    The full scale rows ride along per batch block (tiny, f32) and the
    chunk's scales are selected in-kernel with a dynamic one-hot matmul.

    With pks/pvs (f32 [L, N, 1, K]) the PREFIX cache is int8 too (pk/pv
    are levels) — the prefix read is the largest fixed per-step traffic
    term, shared by all beams of an image, and halves under int8."""
    B, D = q.shape
    L, N, K, _ = pk.shape
    E = gk.shape[2]
    R = beams_per_image
    if B % R:
        raise ValueError(f"batch {B} is not a multiple of beams_per_image {R}")
    if E % chunk:
        raise ValueError(f"E ({E}) must be a multiple of chunk ({chunk})")
    int8_prefix = pks is not None
    TB = R * max(1, min(block_beams, B) // R)
    while B % TB:
        TB -= R
    TI = TB // R
    NC = E // chunk
    grid = (B // TB, NC)
    g = _head_matrix(D, head_dim)
    scale = 1.0 / (head_dim ** 0.5)

    kernel = functools.partial(
        _kernel_rm_chunked_q8p if int8_prefix else _kernel_rm_chunked_q,
        beams_per_image=R, head_dim=head_dim, scale=scale,
        n_chunks=NC, chunk=chunk, k_true=k_true)
    const, gen = _chunked_blockspecs(TB, TI, K, D, E, chunk)
    scale_spec = pl.BlockSpec((TB, 1, 1, E), lambda i, c, s: (i, s[1], 0, 0))
    pscale_spec = pl.BlockSpec((1, TI, 1, K),
                               lambda i, c, s: (s[1], i, 0, 0))
    in_specs = list(const)
    operands = [q[:, None, :], k_new[:, None, :], v_new[:, None, :], pk, pv]
    if int8_prefix:
        in_specs += [pscale_spec, pscale_spec]
        operands += [pks, pvs]
    in_specs += gen + [scale_spec, scale_spec,
                       pl.BlockSpec((D, 128), lambda i, c, s: (0, 0))]
    operands += [gk, gv, gks, gvs, g]
    out = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=in_specs,
            out_specs=[
                pl.BlockSpec((TB, 1, D), lambda i, c, s: (i, 0, 0)),
            ],
            scratch_shapes=[
                pltpu.VMEM((TB, 128), jnp.float32),
                pltpu.VMEM((TB, 128), jnp.float32),
                pltpu.VMEM((TB, D), jnp.float32),
            ],
        ),
        out_shape=[jax.ShapeDtypeStruct((B, 1, D), jnp.float32)],
        interpret=interpret,
    )(jnp.stack([step.astype(jnp.int32), layer.astype(jnp.int32)]),
      *operands)
    return out[0][:, 0, :]


@functools.partial(jax.jit,
                   static_argnames=("beams_per_image", "head_dim",
                                    "block_beams", "interpret", "e_cap",
                                    "k_true"))
def beam_decode_attention_rowmajor_q(
        q: jnp.ndarray, k_new: jnp.ndarray, v_new: jnp.ndarray,
        pk: jnp.ndarray, pv: jnp.ndarray, gk: jnp.ndarray, gv: jnp.ndarray,
        gks: jnp.ndarray, gvs: jnp.ndarray,
        step: jnp.ndarray, layer: jnp.ndarray, *, beams_per_image: int,
        head_dim: int, block_beams: int = 20,
        interpret: bool = False,
        e_cap: Optional[int] = None,
        k_true: Optional[int] = None) -> jnp.ndarray:
    """`beam_decode_attention_rowmajor` over an int8 generated cache.

    gk/gv: int8 [B, L, E, D]; gks/gvs: f32 [B, L, 1, E] per-slot absmax
    scales (value = level * scale). Streaming the generated cache at
    half the bytes buys ~25% beam-decode throughput; results are NOT
    bitwise comparable to the bf16 path (8-bit K/V quantization).
    `e_cap`: stage-bounded slot reads, as in the bf16 kernel."""
    B, D = q.shape
    L, N, K, _ = pk.shape
    E_full = gk.shape[2]
    E = E_full
    if e_cap is not None:
        if not 0 < e_cap <= E_full:
            raise ValueError(f"e_cap {e_cap} out of range for E={E_full}")
        E = e_cap
    R = beams_per_image
    if B % R:
        raise ValueError(f"batch {B} is not a multiple of beams_per_image {R}")
    TB = R * max(1, min(block_beams, B) // R)
    while B % TB:
        TB -= R
    TI = TB // R
    grid = (B // TB,)
    g = _head_matrix(D, head_dim)
    scale = 1.0 / (head_dim ** 0.5)

    kernel = functools.partial(_kernel_rm_q, beams_per_image=R,
                               head_dim=head_dim, scale=scale,
                               k_true=k_true)
    out = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[
                pl.BlockSpec((TB, 1, D), lambda i, s: (i, 0, 0)),
                pl.BlockSpec((TB, 1, D), lambda i, s: (i, 0, 0)),
                pl.BlockSpec((TB, 1, D), lambda i, s: (i, 0, 0)),
                pl.BlockSpec((1, TI, K, D), lambda i, s: (s[1], i, 0, 0)),
                pl.BlockSpec((1, TI, K, D), lambda i, s: (s[1], i, 0, 0)),
                pl.BlockSpec((TB, 1, E, D), lambda i, s: (i, s[1], 0, 0)),
                pl.BlockSpec((TB, 1, E, D), lambda i, s: (i, s[1], 0, 0)),
                # scales: slot dim is LAST — full width (sliced in-kernel);
                # an e_cap-sized last-dim block does not lower on hardware
                pl.BlockSpec((TB, 1, 1, E_full), lambda i, s: (i, s[1], 0, 0)),
                pl.BlockSpec((TB, 1, 1, E_full), lambda i, s: (i, s[1], 0, 0)),
                pl.BlockSpec((D, 128), lambda i, s: (0, 0)),
            ],
            out_specs=[
                pl.BlockSpec((TB, 1, D), lambda i, s: (i, 0, 0)),
            ],
        ),
        out_shape=[jax.ShapeDtypeStruct((B, 1, D), jnp.float32)],
        interpret=interpret,
    )(jnp.stack([step.astype(jnp.int32), layer.astype(jnp.int32)]),
      q[:, None, :], k_new[:, None, :], v_new[:, None, :], pk, pv, gk, gv,
      gks, gvs, g)
    return out[0][:, 0, :]


@functools.partial(jax.jit,
                   static_argnames=("beams_per_image", "head_dim",
                                    "block_beams", "interpret",
                                    "vector_reduce", "e_cap", "k_true"))
def beam_decode_attention_rowmajor(
        q: jnp.ndarray, k_new: jnp.ndarray, v_new: jnp.ndarray,
        pk: jnp.ndarray, pv: jnp.ndarray, gk: jnp.ndarray, gv: jnp.ndarray,
        step: jnp.ndarray, layer: jnp.ndarray, *, beams_per_image: int,
        head_dim: int, block_beams: int = 20,
        interpret: bool = False,
        vector_reduce: bool = False,
        e_cap: Optional[int] = None,
        k_true: Optional[int] = None) -> jnp.ndarray:
    """Fused decode attention over row-major caches (v2, production).

    q/k_new/v_new: [B, D]; pk/pv: [L, N, K, D] (full prefix cache);
    gk/gv: [B, L, E, D] (full gen cache, read-only — only layer `layer`'s
    blocks are streamed by the pipeline); step/layer: int32 scalars.
    Returns attn_out [B, D] f32. The caller writes the new K/V slot
    separately (`ops.cache_reorder.write_gen_slot`), keeping this kernel
    alias-free so the pipeline double-buffers cache reads.

    `e_cap` (static, <= E, 8-aligned): stream only the first e_cap slots
    of the generated cache. With a full-size allocation and stage-bounded
    caps (BeamConfig.full_alloc) this keeps the staged-read traffic
    saving WITHOUT the stage-growth copies or their transient double
    allocation — the caller guarantees step <= e_cap so masking (slot <
    step) is unaffected.
    """
    B, D = q.shape
    L, N, K, _ = pk.shape
    E = gk.shape[2]
    if e_cap is not None:
        if not 0 < e_cap <= E:
            raise ValueError(f"e_cap {e_cap} out of range for E={E}")
        E = e_cap
    R = beams_per_image
    if B % R:
        raise ValueError(f"batch {B} is not a multiple of beams_per_image {R}")
    TB = R * max(1, min(block_beams, B) // R)
    while B % TB:
        TB -= R
    TI = TB // R
    grid = (B // TB,)
    g = _head_matrix(D, head_dim)
    scale = 1.0 / (head_dim ** 0.5)

    kernel = functools.partial(_kernel_rm, beams_per_image=R,
                               head_dim=head_dim, scale=scale,
                               vector_reduce=vector_reduce, k_true=k_true)
    out = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[
                pl.BlockSpec((TB, 1, D), lambda i, s: (i, 0, 0)),
                pl.BlockSpec((TB, 1, D), lambda i, s: (i, 0, 0)),
                pl.BlockSpec((TB, 1, D), lambda i, s: (i, 0, 0)),
                pl.BlockSpec((1, TI, K, D), lambda i, s: (s[1], i, 0, 0)),
                pl.BlockSpec((1, TI, K, D), lambda i, s: (s[1], i, 0, 0)),
                pl.BlockSpec((TB, 1, E, D), lambda i, s: (i, s[1], 0, 0)),
                pl.BlockSpec((TB, 1, E, D), lambda i, s: (i, s[1], 0, 0)),
                pl.BlockSpec((D, 128), lambda i, s: (0, 0)),
            ],
            out_specs=[
                pl.BlockSpec((TB, 1, D), lambda i, s: (i, 0, 0)),
            ],
        ),
        out_shape=[jax.ShapeDtypeStruct((B, 1, D), jnp.float32)],
        interpret=interpret,
    )(jnp.stack([step.astype(jnp.int32), layer.astype(jnp.int32)]),
      q[:, None, :], k_new[:, None, :], v_new[:, None, :], pk, pv, gk, gv, g)
    return out[0][:, 0, :]


@functools.partial(jax.jit,
                   static_argnames=("beams_per_image", "head_dim",
                                    "block_beams", "interpret"))
def beam_decode_attention(q: jnp.ndarray, k_new: jnp.ndarray,
                          v_new: jnp.ndarray, pk: jnp.ndarray,
                          pv: jnp.ndarray, gk: jnp.ndarray, gv: jnp.ndarray,
                          step: jnp.ndarray, *, beams_per_image: int,
                          head_dim: int, block_beams: int = 20,
                          interpret: bool = False
                          ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Fused decode attention.

    q/k_new/v_new: [B, D]; pk/pv: [N, K, D]; gk/gv: [B, E, D] (donated —
    returned updated); step: int32 scalar array.
    Returns (attn_out [B, D] f32, gk', gv').
    """
    B, D = q.shape
    N, K, _ = pk.shape
    E = gk.shape[1]
    R = beams_per_image
    if B % R:
        raise ValueError(f"batch {B} is not a multiple of beams_per_image {R}")
    # Largest multiple of R that divides B, capped near block_beams; always
    # terminates at TB=R (R divides B), so beam sizes > block_beams work.
    TB = R * max(1, min(block_beams, B) // R)
    while B % TB:
        TB -= R
    TI = TB // R
    grid = (B // TB,)
    g = _head_matrix(D, head_dim)
    scale = 1.0 / (head_dim ** 0.5)

    kernel = functools.partial(_kernel, beams_per_image=R,
                               head_dim=head_dim, scale=scale)
    out, gk2, gv2 = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[
                pl.BlockSpec((TB, 1, D), lambda i, s: (i, 0, 0)),
                pl.BlockSpec((TB, 1, D), lambda i, s: (i, 0, 0)),
                pl.BlockSpec((TB, 1, D), lambda i, s: (i, 0, 0)),
                pl.BlockSpec((TI, K, D), lambda i, s: (i, 0, 0)),
                pl.BlockSpec((TI, K, D), lambda i, s: (i, 0, 0)),
                pl.BlockSpec((TB, E, 1, D), lambda i, s: (i, 0, 0, 0)),
                pl.BlockSpec((TB, E, 1, D), lambda i, s: (i, 0, 0, 0)),
                pl.BlockSpec((D, 128), lambda i, s: (0, 0)),
            ],
            out_specs=[
                pl.BlockSpec((TB, 1, D), lambda i, s: (i, 0, 0)),
                pl.BlockSpec((TB, 1, 1, D), lambda i, s: (i, s[0], 0, 0)),
                pl.BlockSpec((TB, 1, 1, D), lambda i, s: (i, s[0], 0, 0)),
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((B, 1, D), jnp.float32),
            jax.ShapeDtypeStruct((B, E, 1, D), gk.dtype),
            jax.ShapeDtypeStruct((B, E, 1, D), gv.dtype),
        ],
        input_output_aliases={6: 1, 7: 2},
        interpret=interpret,
    )(step.reshape(1), q[:, None, :], k_new[:, None, :], v_new[:, None, :],
      pk, pv, gk.reshape(B, E, 1, D), gv.reshape(B, E, 1, D), g)
    return out[:, 0, :], gk2.reshape(B, E, D), gv2.reshape(B, E, D)
