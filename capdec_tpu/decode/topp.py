"""Top-p (nucleus) filtered decoding — reference `generate2` parity.

The reference (gpt2_prefix_eval.py:118-198) nucleus-filters at top_p=0.8
then takes **argmax** (the multinomial draw is commented out, :177-178), so
its generate2 is exactly greedy decoding — the filter can never remove the
argmax token. We keep that contract as the default (`sample=False`,
fast path skips the sort entirely) and additionally support true nucleus
*sampling* with a PRNG key, which the reference scaffolded but never
enabled.

Stop rule parity: stop token '.' (13) or the hardcoded 764 (' .')
(reference :187), stop token included in the output, 67-step cap.
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
from ..utils.tokenizer import GPT2_DOT_TOKEN, GPT2_SPACE_DOT_TOKEN


@dataclasses.dataclass(frozen=True)
class ToppConfig:
    entry_length: int = 67
    top_p: float = 0.8
    temperature: float = 1.0
    stop_token: int = GPT2_DOT_TOKEN
    extra_stop_token: int = GPT2_SPACE_DOT_TOKEN
    sample: bool = False
    # Fused Pallas decode attention over a row-major cache (the beam
    # engine's v2 kernel with beams_per_image=1 — greedy never reorders,
    # so the kernel applies directly). Measured SLOWER than the XLA path
    # for greedy (822 vs 1047 caps/s at batch 256; re-measured with
    # staged growth at batch 1024: 1004 vs 1470): with R=1 there is no
    # per-image prefix reuse inside a block and the kernel's block
    # overhead dominates — default False; kept as an oracle-tested
    # variant. (The beam engine, R=5, wins big with the same kernel.)
    fused_attention: Optional[bool] = None
    fused_interpret: bool = False  # Pallas interpret mode (CPU tests)
    # Slot-bounded fused-attention reads (kernel v3, chunk-grid — see
    # BeamConfig.fused_slot_chunks): with reads bounded by the decoded
    # length the fused path no longer streams the whole allocation each
    # step, which is what made it lose to XLA here. 0 = full-read v2
    # kernel; only meaningful with fused_attention.
    fused_slot_chunks: int = 0
    # Rows per fused-attention block (R=1 here, so this is images/block).
    fused_block_beams: int = 20
    # Chunked in-place slot write (ops.cache_reorder
    # .write_gen_slot_chunk_seqmajor). Measured SLOWER than the plain
    # dynamic-update-slice here (753 vs 1069 captions/s at batch 256 on
    # TPU v5e): unlike the row-major beam cache, the seq-major [L,B,E,D]
    # slot DUS does not degrade to a whole-cache RMW, so the kernel only
    # adds launch + aliasing-copy overhead. Default False; kept as an
    # oracle-tested variant. (The beam engine's row-major variant of the
    # same kernel wins big: 181 -> 219 caps/s.)
    chunk_slot_write: Optional[bool] = None
    # Staged cache growth (same idea as BeamConfig.cache_stages): run the
    # decode as consecutive while-loops over caches of growing slot
    # capacity, so early steps' attention reads stream a small cache
    # instead of the full entry_length allocation. Greedy streams the
    # whole cache every step (no slot bounding), so this directly cuts
    # the dominant cost. 1 disables. Results identical.
    cache_stages: int = 8
    # int8 KV cache (mirrors BeamConfig.kv_cache_int8). Two routes:
    #   * XLA seq-major path (fused_attention=False): int8 levels +
    #     per-slot scales dequantized inside the XLA attention math.
    #     Measured SLOWER than the exact path (1429 vs 1470 captions/s,
    #     batch 1024, staged) — kept as an oracle-tested variant.
    #   * Fused row-major path (fused_attention=True, requires
    #     fused_slot_chunks): the beam engine's chunked int8 kernel with
    #     R=1 — generated AND (with int8_prefix) prefix caches stream at
    #     half the bytes.
    kv_cache_int8: bool = False
    # int8 PREFIX cache (with kv_cache_int8 + the fused chunked path):
    # greedy streams the full prefix cache every step — its biggest fixed
    # traffic term; int8 halves it. None = auto (on for the fused route).
    int8_prefix: Optional[bool] = None
    # Fused LM-head + top-1 Pallas kernel (ops/lm_head.py): the [B, vocab]
    # logits never reach HBM; argmax-identical to the XLA path (the
    # nucleus-filter-then-argmax contract reduces to argmax). Requires
    # temperature == 1 and sample=False. None = auto (on on TPU;
    # measured 1444.6 -> 1478.3 caps/s at batch 1024).
    fused_lm_head: Optional[bool] = None


def nucleus_filter(logits: jnp.ndarray, top_p: float) -> jnp.ndarray:
    """Mask logits outside the smallest set with cumulative prob > top_p.
    Reference semantics (:166-175): sort desc, cumsum softmax, shift the
    removal mask right by one so the top token always survives."""
    sorted_logits = jnp.sort(logits, axis=-1)[..., ::-1]
    cum = jnp.cumsum(jax.nn.softmax(sorted_logits, axis=-1), axis=-1)
    remove_sorted = cum > top_p
    remove_sorted = jnp.concatenate(
        [jnp.zeros_like(remove_sorted[..., :1]), remove_sorted[..., :-1]],
        axis=-1)
    # threshold value per row: smallest kept logit
    kept = jnp.where(remove_sorted, -jnp.inf, sorted_logits)
    threshold = jnp.min(jnp.where(jnp.isfinite(kept), kept, jnp.inf),
                        axis=-1, keepdims=True)
    return jnp.where(logits < threshold, -jnp.inf, logits)


def _pick(logits, tc: ToppConfig, key):
    if tc.temperature > 0 and tc.temperature != 1.0:
        logits = logits / tc.temperature
    if tc.sample:
        filtered = nucleus_filter(logits.astype(jnp.float32), tc.top_p)
        return jax.random.categorical(key, filtered, axis=-1)
    # argmax of the nucleus-filtered logits == plain argmax.
    return jnp.argmax(logits, axis=-1)


@functools.partial(jax.jit, static_argnums=(1, 2))
def _greedy_impl(params, cfg: gpt2.GPT2Config, tc: ToppConfig,
                 prefix_embeds: jnp.ndarray, key: jnp.ndarray):
    from .beam import cast_params_for_decode

    N, K, D = prefix_embeds.shape
    E = tc.entry_length

    params = cast_params_for_decode(params, cfg)
    logits0, prefix_cache = gpt2.prefill(params, cfg, prefix_embeds)
    key, k0 = jax.random.split(key)
    tok0 = _pick(logits0, tc, k0).astype(jnp.int32)
    tokens = jnp.zeros((N, E), jnp.int32).at[:, 0].set(tok0)
    stopped = jnp.logical_or(tok0 == tc.stop_token,
                             tok0 == tc.extra_stop_token)
    lengths = jnp.ones((N,), jnp.int32)
    fused = bool(tc.fused_attention)
    chunk_write = bool(tc.chunk_slot_write)
    if tc.kv_cache_int8 and fused and not tc.fused_slot_chunks:
        raise ValueError("fused int8 greedy requires fused_slot_chunks")
    if tc.kv_cache_int8 and chunk_write and not fused:
        raise ValueError("kv_cache_int8 on the XLA path is not combinable "
                         "with chunk_slot_write")
    # 8-align the prefix slot count for the fused kernels (same XLA:TPU
    # backend CHECK-crash as the beam engine: K = 4 mod 8 with a
    # single-lane-tile n_embd — gpt2.pad_prefix_cache). No-op at the
    # flagship K=40.
    _k_pad = -(-K // 8) * 8
    prefix_len = None
    if fused and _k_pad != K:
        prefix_cache = gpt2.pad_prefix_cache(prefix_cache, _k_pad)
        prefix_len = K
    if tc.kv_cache_int8 and fused and tc.int8_prefix:
        prefix_cache = gpt2.quantize_prefix_cache(prefix_cache)
    # Slot dim padded to the (8, 128) memref tiling; slots >= step are
    # masked in attention, so padding is free correctness-wise.
    E_pad = -(-E // 8) * 8
    if fused:
        init_cache = (gpt2.init_gen_cache_rowmajor_int8 if tc.kv_cache_int8
                      else gpt2.init_gen_cache_rowmajor)
    elif tc.kv_cache_int8:
        init_cache = gpt2.init_gen_cache_int8
    else:
        init_cache = gpt2.init_gen_cache
    buckets = staging.stage_buckets(E_pad, tc.cache_stages)
    gen_cache = init_cache(cfg, N, buckets[0])
    cur = gpt2.embed_tokens(params, tok0)

    def make_cond(stage_cap):
        def cond(c):
            i, _, stopped, _, _, _, _ = c
            in_range = jnp.logical_and(i < E, i <= stage_cap)
            return jnp.logical_and(in_range,
                                   jnp.logical_not(jnp.all(stopped)))
        return cond

    def body(c):
        i, tokens, stopped, lengths, cur, gen_cache, key = c
        out, gen_cache = gpt2.decode_step(
            params, cfg, cur, prefix_cache, gen_cache, i - 1,
            rowmajor=fused, chunk_slot_write=chunk_write,
            fused_attention=fused, fused_interpret=tc.fused_interpret,
            fused_block_beams=tc.fused_block_beams,
            fused_slot_chunks=tc.fused_slot_chunks if fused else 0,
            return_hidden=bool(tc.fused_lm_head),
            prefix_len=prefix_len)
        key, kp = jax.random.split(key)
        if tc.fused_lm_head:
            from ..ops.lm_head import lm_head_topk
            _, idx, _ = lm_head_topk(out, params["wte"], 1,
                                     interpret=tc.fused_interpret)
            nxt = idx[:, 0]
        else:
            nxt = _pick(out, tc, kp).astype(jnp.int32)
        alive = jnp.logical_not(stopped)
        tokens = tokens.at[:, i].set(jnp.where(alive, nxt, 0))
        lengths = lengths + alive.astype(jnp.int32)
        stopped = jnp.logical_or(
            stopped, jnp.logical_and(
                alive, jnp.logical_or(nxt == tc.stop_token,
                                      nxt == tc.extra_stop_token)))
        cur = gpt2.embed_tokens(params, nxt)
        return (i + 1, tokens, stopped, lengths, cur, gen_cache, key)

    carry = (jnp.asarray(1, jnp.int32), tokens, stopped, lengths, cur,
             gen_cache, key)
    for si, bucket in enumerate(buckets):
        carry = lax.while_loop(make_cond(bucket), body, carry)
        if si + 1 < len(buckets):
            (i, tokens, stopped, lengths, cur, gc, key) = carry
            bigger = init_cache(cfg, N, buckets[si + 1])
            gc = staging.grow_cache(gc, bigger, jnp.all(stopped))
            carry = (i, tokens, stopped, lengths, cur, gc, key)
    _, tokens, stopped, lengths, _, _, _ = carry
    return tokens, lengths


def resolve_config(tc: ToppConfig,
                   model_cfg: Optional[gpt2.GPT2Config] = None) -> ToppConfig:
    """Resolve every None (auto) knob to its measured production value
    for the current platform (tested in tests/test_decode.py)."""
    from .beam import kernels_supported
    if not kernels_supported(model_cfg):
        for knob in ("fused_attention", "chunk_slot_write", "fused_lm_head"):
            if getattr(tc, knob) is None:
                tc = dataclasses.replace(tc, **{knob: False})
    if tc.fused_attention is None:
        tc = dataclasses.replace(tc, fused_attention=False)
    if tc.chunk_slot_write is None:
        # Row-major fused path: the chunked write replaces a whole-cache
        # masked-RMW DUS (same pathology as beam). Seq-major XLA path:
        # the plain DUS is already slim — default off (measured slower).
        tc = dataclasses.replace(tc,
                                 chunk_slot_write=bool(tc.fused_attention))
    if tc.int8_prefix is None:
        tc = dataclasses.replace(
            tc, int8_prefix=tc.kv_cache_int8 and bool(tc.fused_attention)
            and bool(tc.fused_slot_chunks))
    if tc.fused_lm_head is None:
        # measured on hardware: 1444.6 -> 1478.3 caps/s at batch 1024
        # (XLA-attention production config). TPU only; argmax-identical.
        from .beam import pallas_autodetect
        tc = dataclasses.replace(
            tc, fused_lm_head=pallas_autodetect() and not tc.sample
            and (tc.temperature <= 0 or tc.temperature == 1.0))
    if tc.fused_lm_head and (tc.sample or (tc.temperature > 0
                                           and tc.temperature != 1.0)):
        raise ValueError("fused_lm_head requires sample=False and "
                         "temperature == 1")
    return tc


def greedy_topp_search(params: Any, cfg: gpt2.GPT2Config,
                       prefix_embeds: jnp.ndarray,
                       tc: ToppConfig = ToppConfig(),
                       key: Optional[jnp.ndarray] = None
                       ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Decode a batch of prefixes [N, K, D] → (tokens [N, E], lengths [N])."""
    if key is None:
        key = jax.random.PRNGKey(0)
    tc = resolve_config(tc, cfg)
    return _greedy_impl(params, cfg, tc, prefix_embeds, key)


def topp_texts(tokenizer, tokens, lengths) -> List[str]:
    import numpy as np
    tokens, lengths = np.asarray(tokens), np.asarray(lengths)
    return [tokenizer.decode(tokens[n, :int(lengths[n])])
            for n in range(tokens.shape[0])]
