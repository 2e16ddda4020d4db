"""Fixed-shape, KV-cached, batched beam search.

Bit-for-bit re-implementation of the reference beam semantics
(gpt2_prefix_eval.py:50-115) in fixed-shape XLA form:
  * log-softmax scores; length-normalized flat top-k over beam*vocab
    with integer div/mod recovery of (source beam, token)
  * stopped beams pinned: all candidates -inf except token 0 at logp 0,
    so a stopped beam survives with frozen score and length
  * seq_lengths increment only for alive beams; selected score is
    re-multiplied by the gathered length (`scores = avg * len`)
  * stop token '.' (id 13 in GPT-2), 67-step cap, final ranking by
    scores / seq_lengths descending
  * the reference's `break` when all beams stop becomes the while-loop
    condition — identical results, no wasted steps

Where the reference re-forwards the whole growing sequence every step with
no KV cache for ONE image at a time, this engine decodes a *batch* of
images × beams against split KV caches (shared prefix rows per image,
per-beam generated rows; see models/gpt2.py) inside one jitted
`lax.while_loop`.
"""
from __future__ import annotations

import dataclasses
import functools
from typing import Any, List, Optional, Tuple

import jax
import jax.numpy as jnp
from jax import lax

from . import staging
from ..models import gpt2
from ..ops.cache_reorder import (copy_forked_rows,  # noqa: F401
                                 copy_forked_rows_bounded,
                                 reorder_cache_rows,
                                 reorder_cache_rows_bounded,
                                 reorder_rows_leading)
from ..utils.tokenizer import GPT2_DOT_TOKEN

NEG = jnp.float32(-1e30)


def cast_params_for_decode(params, cfg: gpt2.GPT2Config):
    """One-time cast of the weight pytree to the compute dtype so every
    decode step reads half the bytes (bf16); a no-op for f32 configs."""
    if cfg.compute_dtype == jnp.float32:
        return params
    return jax.tree.map(lambda a: a.astype(cfg.compute_dtype)
                        if a.dtype == jnp.float32 else a, params)


def _reorder_gen_cache(gen_cache, global_src: jnp.ndarray, bc: "BeamConfig"):
    """Permute gen-cache beam rows by `global_src` under the configured
    layout/backend (Pallas DMA gather on TPU, jnp.take elsewhere)."""
    if bc.rowmajor_cache:
        if bc.mxu_reorder:
            B = gen_cache["k"].shape[0]
            P = jax.nn.one_hot(global_src, B, dtype=gen_cache["k"].dtype)

            def perm(a):
                return jnp.einsum(
                    "bs,sled->bled", P, a,
                    preferred_element_type=jnp.float32).astype(a.dtype)

            return jax.tree.map(perm, gen_cache)
        if bc.pallas_reorder:
            return reorder_rows_leading(gen_cache["k"], gen_cache["v"],
                                        global_src)
        return jax.tree.map(lambda a: jnp.take(a, global_src, axis=0),
                            gen_cache)
    if bc.pallas_reorder:
        # The pipelined full-row DMA gather beats both XLA's take (R
        # full-cache passes) and the slot-bounded manual-DMA variant
        # (per-chunk DMA latency outweighs the traffic saving).
        return reorder_cache_rows(gen_cache["k"], gen_cache["v"], global_src)
    return gpt2.reorder_kv_cache(gen_cache, global_src)


def _reorder_cache_onehot(cache, oh_src: jnp.ndarray):
    """Permute gen-cache beam rows with a one-hot matmul (exact: one 1.0
    coefficient per output row; bf16 values pass through f32 accumulation
    unchanged). oh_src: [N, R, S] over each image's source beams."""
    N, R, S = oh_src.shape

    def perm(a):
        L, B, E, D = a.shape
        a5 = a.reshape(L, N, S, E * D)
        out = jnp.einsum("nrs,lnsx->lnrx", oh_src.astype(a.dtype), a5,
                         preferred_element_type=jnp.float32)
        return out.astype(a.dtype).reshape(L, B, E, D)

    return jax.tree.map(perm, cache)


def exact_top_k_chunked(x: jnp.ndarray, k: int,
                        chunk: int = 1024) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Exact top-k over the last axis via per-chunk top-k + merge.

    The global top-k is a subset of the union of per-chunk top-ks, so this
    is exact while sorting only `chunk`-sized pieces — much cheaper than a
    full-row sort for vocab-sized rows on TPU.
    """
    *lead, V = x.shape
    if V % chunk:
        pad = chunk - V % chunk
        x = jnp.pad(x, [(0, 0)] * len(lead) + [(0, pad)],
                    constant_values=NEG)
        V = V + pad
    C = V // chunk
    xc = x.reshape(*lead, C, chunk)
    vals, idx = lax.top_k(xc, k)                       # [..., C, k]
    base = (jnp.arange(C) * chunk)[..., :, None]
    gidx = (idx + base).reshape(*lead, C * k)
    vals = vals.reshape(*lead, C * k)
    top_vals, sel = lax.top_k(vals, k)                 # [..., k]
    top_idx = jnp.take_along_axis(gidx, sel, axis=-1)
    return top_vals, top_idx


def _assign_lanes(src: jnp.ndarray, R: int
                  ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Assign the R ranked winners of each image to physical cache lanes.

    The first (best-ranked) winner descending from each source lane stays
    IN that lane ("primary" — its cache row needs no movement); remaining
    winners take the dead lanes (lanes no primary claimed) in rank order.
    Because a lane is overwritten only if its own beam produced no primary
    (i.e. nobody reads it), fork copies are hazard-free in place and the
    bytes moved per step are proportional to actual forks, not cache size.

    src: [N, R] source lane of each ranked winner.
    Returns (lane_oh [N, W, S] one-hot lane of each winner (f32),
             lane_of_rank [N, W] int32).
    """
    oh = jax.nn.one_hot(src, R, dtype=jnp.float32)            # [N, W, S]
    claims_before = jnp.cumsum(oh, axis=1) - oh               # earlier ranks
    is_primary = jnp.sum(oh * claims_before, axis=2) == 0     # [N, W]
    claimed = jnp.sum(oh * is_primary[..., None], axis=1)     # [N, S]
    # k-th unclaimed lane pairs with the k-th non-primary winner (by rank)
    free_idx = jnp.cumsum(1.0 - claimed, axis=1) - (1.0 - claimed)
    nonprim_idx = (jnp.cumsum((~is_primary).astype(jnp.float32), axis=1)
                   - (~is_primary))
    free_oh = ((1.0 - claimed)[:, None, :] *
               (free_idx[:, None, :] == nonprim_idx[:, :, None]))
    lane_oh = jnp.where(is_primary[:, :, None], oh, free_oh)  # [N, W, S]
    lane_of_rank = jnp.argmax(lane_oh, axis=2).astype(jnp.int32)
    return lane_oh, lane_of_rank


@dataclasses.dataclass(frozen=True)
class BeamConfig:
    beam_size: int = 5
    entry_length: int = 67
    temperature: float = 1.0
    stop_token: int = GPT2_DOT_TOKEN
    # perf knobs (results are identical either way)
    chunked_top_k: bool = False
    cast_params: bool = True
    onehot_gather: bool = True
    # Ancestry attention: never reorder the KV cache; carry a one-hot
    # [N, R, R, E] ancestry table and select rows inside attention
    # (gpt2.decode_step). Eliminates the per-step cache permutation —
    # 55% of the measured beam step (docs/PERFORMANCE.md).
    # Measured SLOWER than reordering at beam 5 (the one-hot R_s sum
    # re-reads the cache ~R times); kept as an oracle-tested variant.
    ancestry: bool = False
    # Row-major [B, L, E, D] gen cache: each beam row is one contiguous
    # block, so the per-step permutation is one whole-row DMA per beam.
    rowmajor_cache: bool = True
    # Lane-assigned beams: keep each surviving beam in its own cache lane
    # and copy rows only for actual forks (in-place conditional DMA on
    # TPU). Every full-cache movement mechanism measured ~6.5 ms/step at
    # batch 64 (DMA gather, MXU one-hot matmul, XLA take); fork copies
    # move only the forked rows. Results are bit-identical — a final
    # rank permutation restores the reference beam order.
    lane_beams: bool = True
    # Staged cache growth (lane mode): run the decode in `cache_stages`
    # consecutive while-loops with growing slot capacity, so early steps'
    # fork copies and attention reads touch a small cache instead of the
    # full entry_length allocation (~40% average traffic saving at 67
    # steps). 1 disables staging.
    cache_stages: int = 8
    # Permute the cache with a one-hot MXU matmul (P [B, B] is tiny and
    # VMEM-resident, the cache streams once at matmul bandwidth instead of
    # the ~280 GB/s HBM-to-HBM DMA copy ceiling). Exact: f32 accumulation
    # of one 1.0 coefficient per row. Row-major layout only.
    mxu_reorder: bool = False
    # None = auto: Pallas DMA-gather reorder on TPU, jnp.take elsewhere.
    pallas_reorder: Optional[bool] = None
    # Pallas strided-DMA write of the new K/V slot (row-major cache only).
    # XLA's dynamic-update-slice at a dynamic slot index in the tiled
    # sublane dim lowers to a whole-cache masked RMW pass (~2.4 ms/step at
    # batch 640). Default OFF: Mosaic requires DMA slices in the slot dim
    # to be 16-aligned for bf16 ((8,128) tiles of 2-packed sublanes), and
    # the single-slot/2-slot window writes both fail that check.
    pallas_slot_write: Optional[bool] = None
    # Fused Pallas attention kernel (scores+softmax+value over prefix,
    # generated and current slots; ops/decode_attention.py v2). Eliminates
    # the XLA path's per-layer cache-slice materialization, the gen-V
    # retile copy and the spread-probs broadcast (together ~7 ms of the
    # 15.4 ms step at batch 640): measured 122 -> 179 captions/s at batch
    # 128. Numerically bf16-equivalent to the XLA path but NOT bitwise
    # (different reduction order); set False for the exact path.
    # Row-major cache only. None = auto (on on TPU).
    fused_attention: Optional[bool] = None
    fused_interpret: bool = False  # Pallas interpret mode (CPU tests)
    # Rows per fused-attention block (rounded to a beam_size multiple).
    # Measured at N=512, bucket 80: 10 -> 229.8, 20 (default) -> 231.8,
    # 40 -> VMEM OOM (19 MB scoped; per-block VMEM ~= 2*(TB*E*D*2B) for
    # the gen cache alone, double-buffered).
    fused_block_beams: int = 20
    # Chunked in-place slot write (ops.cache_reorder.write_gen_slot_chunk):
    # per step, stream only the aligned 8-slot chunk containing `step`
    # instead of XLA's dynamic-update-slice, whose masked RMW scales with
    # the whole cache (~2 ms of the 10.5 ms step at batch 640, E=80).
    # None = auto (on with fused attention).
    chunk_slot_write: Optional[bool] = None
    # Slot-bounded fused-attention reads (kernel v3): stream the generated
    # cache in this many slots per chunk-grid block, stopping at the chunk
    # containing `step` — attention reads scale with the decoded length
    # instead of the cache allocation, so the engine can run ONE full-size
    # cache (cache_stages=1: no grow copies, no transient double
    # allocation). 0 = the full-read v2 kernel; None = auto (0 — v3
    # measured slower than v2+staging in every hardware head-to-head,
    # docs/PERFORMANCE.md round-3). Must divide the 8-aligned stage
    # buckets.
    fused_slot_chunks: Optional[int] = None
    # Fork copies move only slot chunks below the current step
    # (ops.cache_reorder.copy_forked_rows_bounded) instead of whole cache
    # rows. None = auto (on when fused_slot_chunks is active — with a
    # full-size cache whole-row copies would move the unwritten tail).
    bounded_fork_copy: Optional[bool] = None
    # OPT-IN int8 KV cache: generated K/V stored as int8 levels with
    # per-(row, layer, slot) absmax scales — every cache-byte-
    # proportional cost (attention streaming, slot write, fork copies)
    # halves. Results are NOT token-identical to the bf16 path (8-bit
    # quantization); quality impact is pinned by the synthetic
    # convergence test. Requires the fused-attention row-major lane path.
    kv_cache_int8: bool = False
    # int8 PREFIX cache (with kv_cache_int8): quantize the prefill K/V at
    # decode start — the prefix read is the biggest fixed per-step
    # traffic term and halves. Requires the chunked kernel
    # (fused_slot_chunks). None = auto (on when kv_cache_int8 and
    # fused_slot_chunks are active).
    int8_prefix: Optional[bool] = None
    # Fused LM-head + logsumexp + top-R Pallas kernel (ops/lm_head.py):
    # the [B, vocab] f32 logits (515 MB at N=512) and their two reduction
    # passes never touch HBM. Selection-exact (top-R indices incl. ties)
    # vs lax.top_k on f32 logits; values keep f32 accumulation — MORE
    # precise than the XLA path's bf16-rounded logits. Requires
    # temperature == 1 (the reference default). None = auto (on on TPU;
    # measured 232.8 -> 246.7 caps/s at N=512).
    fused_lm_head: Optional[bool] = None
    # Full-size cache allocation with stage-bounded READS: allocate the
    # entire entry_length cache once and bound each stage's attention
    # reads with a static slot cap in the fused kernel's BlockSpecs
    # (ops/decode_attention.py e_cap) instead of growing the allocation
    # between stages. Keeps staging's ~40% read-traffic saving while
    # eliminating the 7 grow copies (~5% of the N=512 run, profiled
    # round-4) and the growth transient that OOM'd N=640. Exact — the
    # same slots are read either way. None = auto (on with the fused
    # v2 kernel in lane mode; the chunked v3 kernel bounds by step
    # already and keeps its own staging).
    full_alloc: Optional[bool] = None
    # Perf-ablation ONLY: skip the cache permutation entirely. Results are
    # WRONG; this measures the no-reorder floor of the decode step.
    skip_reorder_unsafe: bool = False


@functools.partial(jax.jit, static_argnums=(1, 2))
def _beam_search_impl(params, cfg: gpt2.GPT2Config, bc: BeamConfig,
                      prefix_embeds: jnp.ndarray):
    N, K, D = prefix_embeds.shape
    R, E, V = bc.beam_size, bc.entry_length, cfg.vocab_size

    if bc.cast_params:
        params = cast_params_for_decode(params, cfg)
    logits0, prefix_cache = gpt2.prefill(params, cfg, prefix_embeds)
    # 8-align the prefix slot count for the fused kernels: K = 4 mod 8
    # with a single-lane-tile n_embd CHECK-crashes the XLA:TPU backend
    # (gpt2.pad_prefix_cache). No-op at the flagship K=40; the true
    # length rides to the kernels as a static mask bound.
    _fused_path = (bool(bc.fused_attention) and bc.rowmajor_cache
                   and not bc.ancestry)
    _k_pad = -(-K // 8) * 8
    prefix_len = None
    if _fused_path and _k_pad != K:
        prefix_cache = gpt2.pad_prefix_cache(prefix_cache, _k_pad)
        prefix_len = K
    if bc.kv_cache_int8 and bc.int8_prefix:
        prefix_cache = gpt2.quantize_prefix_cache(prefix_cache)
    if bc.temperature > 0 and bc.temperature != 1.0:
        logits0 = logits0 / bc.temperature
    logp0 = jax.nn.log_softmax(logits0.astype(jnp.float32), axis=-1)

    # Step 0 (reference "scores is None" branch): per-image top-R.
    scores, toks0 = lax.top_k(logp0, R)             # [N, R]
    tokens = jnp.zeros((N, R, E), jnp.int32)
    tokens = tokens.at[:, :, 0].set(toks0)
    seq_lengths = jnp.ones((N, R), jnp.float32)
    is_stopped = toks0 == bc.stop_token

    # Cache slots padded to a multiple of 8 so whole-row DMA slices stay
    # aligned to the (8, 128) memref tiling (Mosaic requirement); slots
    # >= step are masked in attention, so padding is free correctness-wise.
    use_lanes = bc.lane_beams and not bc.ancestry
    # The chunked slot write streams aligned 8-slot chunks — the same
    # granularity as the 8-aligned stage buckets, so no extra padding.
    # Row-major only (the seq-major layout's write isn't the bottleneck).
    chunk_write = bool(bc.chunk_slot_write) and bc.rowmajor_cache
    # 8-aligned buckets for BOTH cache dtypes: 32-aligning the int8
    # buckets (to match int8's (32, 128) tiling) was measured SLOWER
    # (221.8 vs 237.1 caps/s at N=128) — the coarser staged growth costs
    # more than any intra-tile padding saves.
    align = 8
    E_pad = -(-E // align) * align
    if bc.kv_cache_int8:
        if not (bc.rowmajor_cache and use_lanes and bc.fused_attention):
            raise ValueError(
                "kv_cache_int8 requires the fused-attention row-major "
                "lane-beams path (rowmajor_cache + lane_beams + "
                "fused_attention)")
        init_cache = gpt2.init_gen_cache_rowmajor_int8
    else:
        init_cache = (gpt2.init_gen_cache_rowmajor if bc.rowmajor_cache
                      else gpt2.init_gen_cache)
    buckets = staging.stage_buckets(
        E_pad, bc.cache_stages if use_lanes else 1, align)
    # full_alloc: one full-size allocation; the buckets become static
    # read caps (e_cap) instead of allocation sizes.
    gen_cache = init_cache(cfg, N * R,
                           buckets[-1] if bc.full_alloc else buckets[0])
    cur = gpt2.embed_tokens(params, toks0.reshape(N * R))  # [B, D]
    # anc[n, rq, rs, e] == 1: beam rq's slot-e K/V live in cache row rs.
    # Slot e's ancestry is set when it is written (identity: each row
    # writes its own slot) and composed through each selection's src map.
    anc = jnp.zeros((N, R, R, E_pad), jnp.float32)

    # rank -> lane map of the most recent selection (identity at step 0,
    # where ranks ARE lanes); used by lane_beams to restore rank order.
    lane_of_rank = jnp.broadcast_to(jnp.arange(R, dtype=jnp.int32),
                                    (N, R))
    # Lane mode applies the fork-copy lazily at the START of the next
    # step: the loop carry is then produced by the native cache write
    # (dynamic_update_slice, which XLA aliases in place) instead of the
    # Pallas custom call (measured ~1.3 ms/step of defensive carry
    # copies). Identity at step 1 — zero rows move.
    pending_src = jnp.arange(N * R, dtype=jnp.int32)

    def make_cond(stage_cap):
        def cond(carry):
            i, _, _, _, stopped, _, _, _, _, _ = carry
            in_range = jnp.logical_and(i < E, i <= stage_cap)
            return jnp.logical_and(in_range,
                                   jnp.logical_not(jnp.all(stopped)))
        return cond

    def make_body(e_cap):
        # e_cap (static, full_alloc mode): this stage's read bound for the
        # fused attention kernels; None outside full_alloc (the cache
        # allocation itself is stage-sized there).
        return functools.partial(body, e_cap=e_cap)

    def body(carry, e_cap=None):
        (i, tokens, scores, seq_lengths, is_stopped, cur, gen_cache, anc,
         lane_of_rank, pending_src) = carry
        if use_lanes and not bc.skip_reorder_unsafe:
            # deferred fork fix-up for the PREVIOUS selection; slots
            # 0..i-2 are live history (decode_step below writes i-1)
            if bc.rowmajor_cache and bc.pallas_reorder:
                if bc.bounded_fork_copy:
                    fixed = copy_forked_rows_bounded(
                        gen_cache["k"], gen_cache["v"], pending_src,
                        i - 1, interpret=bc.fused_interpret)
                else:
                    fixed = copy_forked_rows(gen_cache["k"],
                                             gen_cache["v"], pending_src,
                                             interpret=bc.fused_interpret)
                if bc.kv_cache_int8:
                    # scales are tiny ([B, L, 1, E] f32): one exact
                    # one-hot contraction instead of a kernel launch
                    P = jax.nn.one_hot(pending_src, N * R,
                                       dtype=jnp.float32)
                    perm = lambda a: jnp.einsum(
                        "bs,slxe->blxe", P, a,
                        preferred_element_type=jnp.float32).astype(a.dtype)
                    fixed = {**fixed, "ks": perm(gen_cache["ks"]),
                             "vs": perm(gen_cache["vs"])}
                gen_cache = fixed
            else:
                gen_cache = _reorder_gen_cache(gen_cache, pending_src, bc)
        out, gen_cache = gpt2.decode_step(
            params, cfg, cur, prefix_cache, gen_cache, i - 1,
            anc_oh=anc if bc.ancestry else None,
            rowmajor=bc.rowmajor_cache,
            slot_write_kernel=bool(bc.pallas_slot_write)
            and bc.rowmajor_cache,
            chunk_slot_write=chunk_write,
            fused_attention=bool(bc.fused_attention) and bc.rowmajor_cache
            and not bc.ancestry,
            fused_interpret=bc.fused_interpret,
            fused_block_beams=bc.fused_block_beams,
            fused_slot_chunks=int(bc.fused_slot_chunks or 0),
            return_hidden=bool(bc.fused_lm_head),
            e_cap=e_cap, prefix_len=prefix_len)
        # Per-beam candidate reduction: adding the per-beam score and
        # dividing by the per-beam length are monotonic within a beam, so
        # the global flat top-R over beam*vocab can only select tokens from
        # each beam's own top-R — an exact (R*R)-candidate shortlist
        # replaces the reference's full [R*V] topk (:95). Stopped beams
        # contribute their single pinned candidate (token 0, logp 0, :90-91).
        if bc.fused_lm_head:
            # `out` is the ln_f'd hidden; LM head + lse + top-R fused in
            # one kernel — the [B, V] logits never reach HBM.
            from ..ops.lm_head import lm_head_topk
            cand_val, cand_tok, lse = lm_head_topk(
                out, params["wte"], R, interpret=bc.fused_interpret)
        else:
            logits = out
            if bc.temperature > 0 and bc.temperature != 1.0:
                logits = logits / bc.temperature
            logits = logits.astype(jnp.float32)
            lse = jax.nn.logsumexp(logits, axis=-1)          # [B]
            if bc.chunked_top_k:
                cand_val, cand_tok = exact_top_k_chunked(logits, R)
            else:
                cand_val, cand_tok = lax.top_k(logits, R)    # [B, R]
        cand_logp = (cand_val - lse[:, None]).reshape(N, R, R)
        cand_tok = cand_tok.reshape(N, R, R)
        cand_logp = jnp.where(is_stopped[:, :, None], NEG, cand_logp)
        cand_logp = cand_logp.at[:, :, 0].set(
            jnp.where(is_stopped, 0.0, cand_logp[:, :, 0]))
        cand_tok = jnp.where(is_stopped[:, :, None], 0, cand_tok)
        scores_sum = scores[:, :, None] + cand_logp          # [N, R, R]
        seq_lengths = seq_lengths + (~is_stopped).astype(jnp.float32)
        avg = scores_sum / seq_lengths[:, :, None]
        top_avg, flat_idx = lax.top_k(avg.reshape(N, R * R), R)  # [N, R]
        src = flat_idx // R
        if use_lanes:
            lane_oh, lane_of_rank = _assign_lanes(src, R)  # [N, W, S]
            oh_flat = jax.nn.one_hot(flat_idx, R * R, dtype=jnp.float32)
            nxt_w = jnp.einsum("nwc,nc->nw", oh_flat,
                               cand_tok.reshape(N, R * R).astype(jnp.float32))
            oh_src = jax.nn.one_hot(src, R, dtype=jnp.float32)
            # scatter winner data to its assigned lane; history arrays go
            # through src composition (winner w inherits lane src[w]'s)
            to_lane = lambda x_w: jnp.einsum("nws,nw->ns", lane_oh, x_w)
            nxt = to_lane(nxt_w).astype(jnp.int32)
            seq_lengths_w = jnp.einsum("nws,ns->nw", oh_src, seq_lengths)
            stop_w = jnp.einsum("nws,ns->nw", oh_src,
                                is_stopped.astype(jnp.float32))
            tok_w = jnp.einsum("nws,nse->nwe", oh_src,
                               tokens.astype(jnp.float32))
            seq_lengths = to_lane(seq_lengths_w)
            is_stopped = to_lane(stop_w) > 0.5
            tokens = jnp.einsum("nws,nwe->nse", lane_oh,
                                tok_w).astype(jnp.int32)
            scores = to_lane(top_avg) * seq_lengths
            src_of_lane = to_lane(src.astype(jnp.float32)).astype(jnp.int32)
            # applied lazily at the start of the next iteration
            pending_src = (jnp.arange(N)[:, None] * R
                           + src_of_lane).reshape(-1)
        elif bc.onehot_gather:
            # XLA lowers dynamic-index gathers on TPU through a scalar path
            # (and whole-cache selects) — measured ~7ms/step at batch 64.
            # One-hot contractions are exact (single 1.0 coefficient, f32
            # accumulation; token ids < 2^24 are exact in f32) and run on
            # the MXU/VPU at memory speed.
            oh_flat = jax.nn.one_hot(flat_idx, R * R, dtype=jnp.float32)
            nxt = jnp.einsum("nrc,nc->nr", oh_flat,
                             cand_tok.reshape(N, R * R).astype(jnp.float32)
                             ).astype(jnp.int32)
            oh_src = jax.nn.one_hot(src, R, dtype=jnp.float32)  # [N, R, S]
            seq_lengths = jnp.einsum("nrs,ns->nr", oh_src, seq_lengths)
            is_stopped = jnp.einsum(
                "nrs,ns->nr", oh_src,
                is_stopped.astype(jnp.float32)) > 0.5
            tokens = jnp.einsum("nrs,nse->nre", oh_src,
                                tokens.astype(jnp.float32)).astype(jnp.int32)
            if bc.ancestry:
                # No cache movement at all: record that slot i-1 was
                # written row-identically, then route every beam's table
                # through its source beam.
                eye = jnp.broadcast_to(
                    jnp.eye(R, dtype=jnp.float32)[None, :, :, None],
                    (N, R, R, 1))
                anc_id = lax.dynamic_update_slice(anc, eye, (0, 0, 0, i - 1))
                anc = jnp.einsum("nqs,nsre->nqre", oh_src, anc_id)
            elif bc.skip_reorder_unsafe:
                pass
            else:
                # Big-cache permutation: XLA's take lowers to ~R full-cache
                # passes (68% of the step at batch 64) — the Pallas
                # DMA-gather kernel moves each row exactly once.
                global_src = (jnp.arange(N)[:, None] * R + src).reshape(-1)
                gen_cache = _reorder_gen_cache(gen_cache, global_src, bc)
        else:
            nxt = jnp.take_along_axis(cand_tok.reshape(N, R * R), flat_idx,
                                      axis=1)
            take = lambda a: jnp.take_along_axis(a, src, axis=1)
            seq_lengths = take(seq_lengths)
            is_stopped = take(is_stopped)
            tokens = jnp.take_along_axis(tokens, src[:, :, None], axis=1)
            if bc.ancestry:
                eye = jnp.broadcast_to(
                    jnp.eye(R, dtype=jnp.float32)[None, :, :, None],
                    (N, R, R, 1))
                anc_id = lax.dynamic_update_slice(anc, eye, (0, 0, 0, i - 1))
                anc = jnp.take_along_axis(anc_id, src[:, :, None, None],
                                          axis=1)
            else:
                global_src = (jnp.arange(N)[:, None] * R + src).reshape(-1)
                gen_cache = _reorder_gen_cache(gen_cache, global_src, bc)
        if not use_lanes:
            scores = top_avg * seq_lengths
        tokens = tokens.at[:, :, i].set(nxt)
        is_stopped = jnp.logical_or(is_stopped, nxt == bc.stop_token)
        cur = gpt2.embed_tokens(params, nxt.reshape(N * R))
        return (i + 1, tokens, scores, seq_lengths, is_stopped, cur,
                gen_cache, anc, lane_of_rank, pending_src)

    carry = (jnp.asarray(1, jnp.int32), tokens, scores, seq_lengths,
             is_stopped, cur, gen_cache, anc, lane_of_rank, pending_src)
    for si, bucket in enumerate(buckets):
        carry = lax.while_loop(
            make_cond(bucket),
            make_body(bucket if bc.full_alloc else None), carry)
        if si + 1 < len(buckets) and not bc.full_alloc:
            # Grow the cache for the next stage; skip the copy when every
            # beam already stopped (the remaining stages no-op).
            # (full_alloc: the cache is already full-size — the next
            # stage just reads with a larger e_cap, nothing moves.)
            (i, tokens, scores, seq_lengths, is_stopped, cur, gc, anc,
             lane_of_rank, pending_src) = carry
            bigger = init_cache(cfg, N * R, buckets[si + 1])
            gc = staging.grow_cache(gc, bigger, jnp.all(is_stopped))
            carry = (i, tokens, scores, seq_lengths, is_stopped, cur, gc,
                     anc, lane_of_rank, pending_src)
    (_, tokens, scores, seq_lengths, is_stopped, _, _, _,
     lane_of_rank, _) = carry

    if use_lanes:
        # restore the reference's rank ordering of the returned beams
        lp = jax.nn.one_hot(lane_of_rank, R, dtype=jnp.float32)  # [N, W, S]
        tokens = jnp.einsum("nws,nse->nwe", lp,
                            tokens.astype(jnp.float32)).astype(jnp.int32)
        seq_lengths = jnp.einsum("nws,ns->nw", lp, seq_lengths)
        scores = jnp.einsum("nws,ns->nw", lp, scores)

    final_scores = scores / seq_lengths
    order = jnp.argsort(-final_scores, axis=1)
    return tokens, seq_lengths, final_scores, order


def pallas_autodetect() -> bool:
    """True when the Pallas fast paths should be on: explicit override
    first (CAPDEC_PALLAS_REORDER=0/1 — the fast path is load-bearing, and
    experimental TPU plugins could rename the platform), then backend
    platform with device_kind as the fallback signal."""
    import os
    env = os.environ.get("CAPDEC_PALLAS_REORDER")
    if env is not None:
        return env not in ("0", "false", "False")
    return (jax.default_backend() == "tpu"
            or any(d.platform == "tpu" or "TPU" in d.device_kind
                   for d in jax.devices()))


def kernels_supported(cfg: Optional[gpt2.GPT2Config]) -> bool:
    """Whether the Pallas decode kernels can lower for this model size.

    The fused kernels keep the embedding payload in the 128-wide lane
    dimension (ops/decode_attention.py: caches [rows, S, n_embd],
    head-grouping G [n_embd, 128]; ops/lm_head.py streams wte in 128-lane
    column blocks), so Mosaic requires n_embd % 128 == 0 and at most 128
    heads. Off-size models (e.g. the tiny dry-run checkpoints) fall back
    to the XLA path, which is shape-agnostic.
    """
    return (cfg is None
            or (cfg.n_embd % 128 == 0 and cfg.n_head <= 128))


def resolve_config(bc: BeamConfig,
                   model_cfg: Optional[gpt2.GPT2Config] = None) -> BeamConfig:
    """Resolve every None (auto) knob to its measured production value
    for the current platform (tested in tests/test_decode.py)."""
    if not kernels_supported(model_cfg):
        # auto-off every Pallas path; explicit opt-ins raise in the kernels
        for knob in ("pallas_reorder", "fused_attention", "chunk_slot_write",
                     "fused_lm_head", "pallas_slot_write"):
            if getattr(bc, knob) is None:
                bc = dataclasses.replace(bc, **{knob: False})
    if bc.pallas_reorder is None:
        bc = dataclasses.replace(bc, pallas_reorder=pallas_autodetect())
    if bc.pallas_slot_write is None:
        bc = dataclasses.replace(bc, pallas_slot_write=False)
    if bc.fused_attention is None:
        bc = dataclasses.replace(
            bc, fused_attention=bc.pallas_reorder and bc.rowmajor_cache)
    if bc.chunk_slot_write is None:
        bc = dataclasses.replace(
            bc, chunk_slot_write=bool(bc.fused_attention))
    if bc.fused_slot_chunks is None:
        # v3 (slot-bounded reads) lost every hardware head-to-head vs the
        # v2 full-read kernel under staged growth (206.7-242.7 vs
        # 232.8-246.7 caps/s at N=512; docs/PERFORMANCE.md round-3
        # tables) — the finer chunk grid's per-program overhead exceeds
        # the DMA it saves. Default to v2; v3 stays opt-in.
        bc = dataclasses.replace(bc, fused_slot_chunks=0)
    if bc.full_alloc is None:
        # full-size allocation + e_cap-bounded reads: measured round-4
        # (same staged read traffic, no grow copies/transient). Fused v2
        # lane path only — v3 (fused_slot_chunks) keeps its own staging.
        # int8 KV keeps staged growth: its cache is half-size (no OOM
        # cliff to kill) and the hardware A/B reads 278.5 caps/s staged
        # vs 265.7 full_alloc at N=512 (docs/PERFORMANCE.md round 4) —
        # the full-width f32 scales blocks the e_cap mode must carry
        # (Mosaic last-dim tiling) eat the grow-copy savings.
        bc = dataclasses.replace(
            bc, full_alloc=bool(bc.fused_attention)
            and not bc.fused_slot_chunks and bc.lane_beams
            and bc.rowmajor_cache and not bc.ancestry
            and not bc.kv_cache_int8)
    if bc.bounded_fork_copy is None:
        # with a full-size cache, whole-row fork copies would move the
        # unwritten tail — bound them by the written-slot count
        bc = dataclasses.replace(
            bc, bounded_fork_copy=bool(bc.fused_slot_chunks or bc.full_alloc)
            and bool(bc.pallas_reorder) and bc.rowmajor_cache)
    if bc.int8_prefix is None:
        bc = dataclasses.replace(
            bc, int8_prefix=bc.kv_cache_int8 and bool(bc.fused_slot_chunks))
    if bc.fused_lm_head is None:
        # measured on hardware: 232.8 -> 246.7 caps/s at N=512 (the
        # [B, V] f32 logits + two reduction passes never touch HBM).
        # TPU only (pallas path); requires temperature == 1.
        bc = dataclasses.replace(
            bc, fused_lm_head=bool(bc.pallas_reorder)
            and (bc.temperature <= 0 or bc.temperature == 1.0))
    if bc.fused_lm_head and bc.temperature > 0 and bc.temperature != 1.0:
        raise ValueError("fused_lm_head requires temperature == 1")
    return bc


def beam_search(params: Any, cfg: gpt2.GPT2Config, prefix_embeds: jnp.ndarray,
                bc: BeamConfig = BeamConfig()
                ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Decode a batch of prefix embeddings [N, K, D].

    Returns (tokens [N,R,E], seq_lengths [N,R], scores [N,R], order [N,R])
    where `order` ranks beams by length-normalized score descending.
    """
    return _beam_search_impl(params, cfg, resolve_config(bc, cfg),
                             prefix_embeds)


def beam_texts(tokenizer, tokens, seq_lengths, order) -> List[List[str]]:
    """Host-side finalization: decode each image's beams in ranked order
    (reference gpt2_prefix_eval.py:110-115)."""
    import numpy as np
    tokens = np.asarray(tokens)
    seq_lengths = np.asarray(seq_lengths)
    order = np.asarray(order)
    out = []
    for n in range(tokens.shape[0]):
        texts = [tokenizer.decode(tokens[n, r, :int(seq_lengths[n, r])])
                 for r in range(tokens.shape[1])]
        out.append([texts[r] for r in order[n]])
    return out


def beam_top_select(tokens, seq_lengths, order
                    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Rank-0 beam per image, selected ON DEVICE: tokens [N,R,E] -> [N,E],
    seq_lengths [N,R] -> [N]. Callers that only need the best caption
    (serving, the eval runner — reference predictions_runner.py:229-232
    takes `generate_beam(...)[0]`) fetch 1/R of the device->host traffic
    vs materializing every beam with beam_texts."""
    rows = jnp.arange(tokens.shape[0])
    top = order[:, 0]
    return tokens[rows, top], seq_lengths[rows, top]


def beam_top_texts(tokenizer, tokens, seq_lengths, order) -> List[str]:
    """Best caption per image — identical to
    `[t[0] for t in beam_texts(...)]` but transfers and detokenizes only
    the ranked-first beam."""
    import numpy as np
    top_toks, top_lens = beam_top_select(tokens, seq_lengths, order)
    t = np.asarray(top_toks)
    ln = np.asarray(top_lens)
    return [tokenizer.decode(t[n, :int(ln[n])]) for n in range(t.shape[0])]
