"""GPT-2 decoder-only language model, pure functional JAX.

TPU-first re-design of the decoder CapDec drives through HuggingFace
(`GPT2LMHeadModel.from_pretrained('gpt2')`, reference train.py:266,
gpt2_prefix.py:162). Architecture is the standard GPT-2: learned token +
position embeddings, pre-LN blocks with fused-QKV attention and gelu_new
MLPs, tied LM head.

Design choices (why this is not a port):
  * Parameters are a plain pytree of arrays. All transformer blocks are
    *stacked* along a leading layer axis and the forward pass is a single
    `lax.scan` over layers — one compiled block body instead of 12 unrolled
    ones, which keeps XLA compile time low and makes tensor-parallel
    sharding a single annotation per stacked array.
  * Full-sequence forward (training / prefill) and single-token cached
    decode share one block implementation; the KV cache is a fixed-shape
    pytree carried through the scan, so autoregressive decoding is
    `O(T * L)` matmuls on static shapes — no growing `inputs_embeds`
    re-forward like the reference decode loop (gpt2_prefix_eval.py:76).
  * Matmuls run in a configurable compute dtype (bfloat16 on TPU) with
    float32 accumulation via `preferred_element_type`; layernorm statistics
    and the softmax stay in float32.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from jax import lax

Params = Dict[str, Any]

NEG_INF = -1e9  # additive mask value; large enough at bf16/f32 softmax


@dataclasses.dataclass(frozen=True)
class GPT2Config:
    """Hyperparameters of the decoder. Defaults = GPT-2 base (124M)."""

    vocab_size: int = 50257
    n_positions: int = 1024
    n_embd: int = 768
    n_layer: int = 12
    n_head: int = 12
    layer_norm_epsilon: float = 1e-5
    # dtype used for matmul inputs; float32 params are cast on the fly.
    compute_dtype: Any = jnp.float32

    @property
    def head_dim(self) -> int:
        return self.n_embd // self.n_head


@jax.custom_jvp
def gelu_new(x: jnp.ndarray) -> jnp.ndarray:
    """GPT-2's tanh-approximate GELU (HF `gelu_new`).

    Custom JVP with an analytic derivative: plain AD through the tanh
    chain makes XLA stash ~7 full-width intermediates per MLP for the
    backward pass (profiled: 7× f32[L,B,T,3072] buffers — GBs of HBM
    traffic per train step on GPT-2 base); the custom rule saves one.
    """
    c = jnp.asarray(0.7978845608028654, x.dtype)  # sqrt(2/pi)
    return 0.5 * x * (1.0 + jnp.tanh(c * (x + 0.044715 * x * x * x)))


@gelu_new.defjvp
def _gelu_new_jvp(primals, tangents):
    (x,), (dx,) = primals, tangents
    c = jnp.asarray(0.7978845608028654, x.dtype)
    t = jnp.tanh(c * (x + 0.044715 * x * x * x))
    y = 0.5 * x * (1.0 + t)
    dy_dx = (0.5 * (1.0 + t)
             + 0.5 * x * (1.0 - t * t) * c * (1.0 + 3 * 0.044715 * x * x))
    return y, dy_dx * dx


# ---------------------------------------------------------------------------
# Initialization
# ---------------------------------------------------------------------------


def init_params(key: jax.Array, cfg: GPT2Config, dtype=jnp.float32) -> Params:
    """Random init matching GPT-2's scheme (normal 0.02, zeros for biases)."""
    k_wte, k_wpe, k_blocks = jax.random.split(key, 3)
    D, L, F = cfg.n_embd, cfg.n_layer, 4 * cfg.n_embd

    def normal(k, shape, std=0.02):
        return (jax.random.normal(k, shape) * std).astype(dtype)

    ks = jax.random.split(k_blocks, 4)
    blocks = {
        "ln_1": {"scale": jnp.ones((L, D), dtype), "bias": jnp.zeros((L, D), dtype)},
        "ln_2": {"scale": jnp.ones((L, D), dtype), "bias": jnp.zeros((L, D), dtype)},
        "attn": {
            "c_attn_w": normal(ks[0], (L, D, 3 * D)),
            "c_attn_b": jnp.zeros((L, 3 * D), dtype),
            # residual-projection std scaled by 1/sqrt(2*L) as in GPT-2.
            "c_proj_w": normal(ks[1], (L, D, D), std=0.02 / (2 * L) ** 0.5),
            "c_proj_b": jnp.zeros((L, D), dtype),
        },
        "mlp": {
            "c_fc_w": normal(ks[2], (L, D, F)),
            "c_fc_b": jnp.zeros((L, F), dtype),
            "c_proj_w": normal(ks[3], (L, F, D), std=0.02 / (2 * L) ** 0.5),
            "c_proj_b": jnp.zeros((L, D), dtype),
        },
    }
    return {
        "wte": normal(k_wte, (cfg.vocab_size, D)),
        "wpe": normal(k_wpe, (cfg.n_positions, D), std=0.01),
        "ln_f": {"scale": jnp.ones((D,), dtype), "bias": jnp.zeros((D,), dtype)},
        "blocks": blocks,
    }


# ---------------------------------------------------------------------------
# KV cache
# ---------------------------------------------------------------------------


def init_kv_cache(cfg: GPT2Config, batch: int, max_len: int, dtype=None) -> Params:
    """Fixed-shape per-layer KV cache: [L, B, H, S_max, head_dim]."""
    dtype = dtype or cfg.compute_dtype
    shape = (cfg.n_layer, batch, cfg.n_head, max_len, cfg.head_dim)
    return {"k": jnp.zeros(shape, dtype), "v": jnp.zeros(shape, dtype)}


def reorder_kv_cache(cache: Params, source: jnp.ndarray) -> Params:
    """Gather cache rows along the batch axis (beam-search reordering)."""
    return jax.tree.map(lambda a: jnp.take(a, source, axis=1), cache)


# ---------------------------------------------------------------------------
# Forward
# ---------------------------------------------------------------------------


def _layer_norm(x, scale, bias, eps):
    x32 = x.astype(jnp.float32)
    mu = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x32 - mu), axis=-1, keepdims=True)
    y = (x32 - mu) * lax.rsqrt(var + eps)
    return (y * scale + bias).astype(x.dtype)


def _attention(q, k, v, bias):
    """q: [B,H,T,d]; k,v: [B,H,S,d]; bias: [B,1,T,S] additive (0 / NEG_INF)."""
    scale = 1.0 / (q.shape[-1] ** 0.5)
    scores = jnp.einsum("bhtd,bhsd->bhts", q, k, preferred_element_type=jnp.float32)
    scores = scores * scale + bias
    probs = jax.nn.softmax(scores.astype(jnp.float32), axis=-1).astype(q.dtype)
    return jnp.einsum("bhts,bhsd->bhtd", probs, v, preferred_element_type=jnp.float32)


def _block(x, layer: Params, bias, cfg: GPT2Config,
           cache_kv: Optional[Tuple[jnp.ndarray, jnp.ndarray]] = None,
           cache_index: Optional[jnp.ndarray] = None):
    """One transformer block on [B, T, D]. Returns (y, new_cache_kv).

    With a cache, the block's freshly-computed K/V for the T new positions
    are written at `cache_index` and attention runs over the whole cache.
    """
    B, T, D = x.shape
    H, hd = cfg.n_head, cfg.head_dim
    cdt = cfg.compute_dtype

    h = _layer_norm(x, layer["ln_1"]["scale"], layer["ln_1"]["bias"],
                    cfg.layer_norm_epsilon)
    qkv = jnp.dot(h.astype(cdt), layer["attn"]["c_attn_w"].astype(cdt),
                  preferred_element_type=jnp.float32) + layer["attn"]["c_attn_b"]
    qkv = qkv.astype(cdt)
    q, k, v = jnp.split(qkv, 3, axis=-1)
    # [B, T, D] -> [B, H, T, hd]
    q = q.reshape(B, T, H, hd).transpose(0, 2, 1, 3)
    k = k.reshape(B, T, H, hd).transpose(0, 2, 1, 3)
    v = v.reshape(B, T, H, hd).transpose(0, 2, 1, 3)

    new_cache = None
    if cache_kv is not None:
        ck, cv = cache_kv
        ck = lax.dynamic_update_slice(ck, k.astype(ck.dtype), (0, 0, cache_index, 0))
        cv = lax.dynamic_update_slice(cv, v.astype(cv.dtype), (0, 0, cache_index, 0))
        k, v = ck.astype(cdt), cv.astype(cdt)
        new_cache = (ck, cv)

    attn = _attention(q, k, v, bias)  # [B, H, T, hd] fp32
    attn = attn.transpose(0, 2, 1, 3).reshape(B, T, D).astype(cdt)
    attn = jnp.dot(attn, layer["attn"]["c_proj_w"].astype(cdt),
                   preferred_element_type=jnp.float32) + layer["attn"]["c_proj_b"]
    x = x + attn.astype(x.dtype)

    h = _layer_norm(x, layer["ln_2"]["scale"], layer["ln_2"]["bias"],
                    cfg.layer_norm_epsilon)
    h = jnp.dot(h.astype(cdt), layer["mlp"]["c_fc_w"].astype(cdt),
                preferred_element_type=jnp.float32) + layer["mlp"]["c_fc_b"]
    # gelu in compute dtype: halves the activation (and AD-residual) width
    h = gelu_new(h.astype(cdt))
    h = jnp.dot(h, layer["mlp"]["c_proj_w"].astype(cdt),
                preferred_element_type=jnp.float32) + layer["mlp"]["c_proj_b"]
    x = x + h.astype(x.dtype)
    return x, new_cache


def _final_logits(params: Params, cfg: GPT2Config, x: jnp.ndarray) -> jnp.ndarray:
    x = _layer_norm(x, params["ln_f"]["scale"], params["ln_f"]["bias"],
                    cfg.layer_norm_epsilon)
    cdt = cfg.compute_dtype
    # Tied LM head: logits = x @ wte^T, accumulated in fp32.
    return jnp.dot(x.astype(cdt), params["wte"].astype(cdt).T,
                   preferred_element_type=jnp.float32)


def final_logits(params: Params, cfg: GPT2Config,
                 x: jnp.ndarray) -> jnp.ndarray:
    """ln_f + tied LM head over arbitrary hidden-state slices [.., D]."""
    return _final_logits(params, cfg, x)


def final_hidden(params: Params, cfg: GPT2Config,
                 x: jnp.ndarray) -> jnp.ndarray:
    """ln_f only, cast to the compute dtype — the input contract of the
    fused LM-head kernel (ops/lm_head.py), which performs the tied-head
    matmul itself (same bf16 operands / f32 accumulation as
    `_final_logits`)."""
    x = _layer_norm(x, params["ln_f"]["scale"], params["ln_f"]["bias"],
                    cfg.layer_norm_epsilon)
    return x.astype(cfg.compute_dtype)


def embed_tokens(params: Params, tokens: jnp.ndarray) -> jnp.ndarray:
    """Token embedding lookup (reference `gpt.transformer.wte(tokens)`)."""
    return jnp.take(params["wte"], tokens, axis=0)


def forward_hidden(params: Params, cfg: GPT2Config,
                   inputs_embeds: jnp.ndarray,
                   attention_mask: Optional[jnp.ndarray] = None,
                   position_offset: int | jnp.ndarray = 0,
                   attention_bias: Optional[jnp.ndarray] = None,
                   positions: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Transformer stack only: [B, T, D] -> final hidden states [B, T, D]
    (pre ln_f / LM head). Lets loss paths run the 50k-wide LM-head matmul
    over just the positions they score instead of the whole sequence.

    `attention_bias`: optional additive bias broadcastable to
    [B, H, T, T], REPLACING the default causal mask — the hook for
    sequence packing (block-diagonal causal bias over packed segments).
    `positions`: optional explicit wpe indices [T] (packing resets
    positions per segment); default `position_offset + arange(T)`.
    """
    B, T, D = inputs_embeds.shape
    if positions is None:
        positions = position_offset + jnp.arange(T)
    x = inputs_embeds + jnp.take(params["wpe"], positions, axis=0)
    x = x.astype(cfg.compute_dtype)

    if attention_bias is None:
        causal = jnp.tril(jnp.ones((T, T), jnp.bool_))
        bias = jnp.where(causal, 0.0, NEG_INF)[None, None, :, :]
    else:
        bias = attention_bias
        if bias.ndim == 2:          # [T,T] -> [1,1,T,T]
            bias = bias[None, None]
        elif bias.ndim == 3:        # [B,T,T] -> [B,1,T,T] (batch LEADS:
            bias = bias[:, None]    # per-row masks broadcast over heads,
            # not onto the head axis — [1,B,T,T] would silently apply
            # row i's mask to head i whenever B == H)
    if attention_mask is not None:
        key_bias = jnp.where(attention_mask[:, None, None, :] > 0, 0.0, NEG_INF)
        bias = bias + key_bias
    bias = bias.astype(jnp.float32)

    def scan_body(carry, layer):
        y, _ = _block(carry, layer, bias, cfg)
        return y, None

    x, _ = lax.scan(scan_body, x, params["blocks"])
    return x


def forward(params: Params, cfg: GPT2Config, inputs_embeds: jnp.ndarray,
            attention_mask: Optional[jnp.ndarray] = None,
            position_offset: int | jnp.ndarray = 0) -> jnp.ndarray:
    """Full-sequence forward. inputs_embeds: [B, T, D] -> logits [B, T, V].

    `attention_mask` is an optional [B, T] 1/0 key mask (HF semantics:
    masked keys are removed from attention; queries still produce outputs).
    A causal mask is always applied.
    """
    x = forward_hidden(params, cfg, inputs_embeds, attention_mask,
                       position_offset)
    return _final_logits(params, cfg, x)


def forward_with_cache(params: Params, cfg: GPT2Config, inputs_embeds: jnp.ndarray,
                       cache: Params, cache_index: jnp.ndarray,
                       key_mask: Optional[jnp.ndarray] = None
                       ) -> Tuple[jnp.ndarray, Params]:
    """Cached forward for prefill (T>1) or decode (T=1).

    Writes K/V for the T new positions at `cache_index` and attends over the
    full fixed-size cache. Returns (logits [B, T, V], new_cache).

    `key_mask`: optional [B, S_max] validity mask over cache slots; if None,
    validity is derived from `cache_index` (slots < cache_index + T, with
    causal ordering among the new positions).
    """
    B, T, D = inputs_embeds.shape
    S = cache["k"].shape[3]
    positions = cache_index + jnp.arange(T)
    x = inputs_embeds + jnp.take(params["wpe"], positions, axis=0)
    x = x.astype(cfg.compute_dtype)

    # Validity of each cache slot for each new query position:
    # slot s is visible to query t iff s <= cache_index + t.
    slot_ids = jnp.arange(S)[None, :]        # [1, S]
    query_ids = cache_index + jnp.arange(T)[:, None]  # [T, 1]
    visible = slot_ids <= query_ids           # [T, S]
    bias = jnp.where(visible, 0.0, NEG_INF)[None, None, :, :]
    if key_mask is not None:
        bias = bias + jnp.where(key_mask[:, None, None, :] > 0, 0.0, NEG_INF)
    bias = bias.astype(jnp.float32)

    def scan_body(carry, inputs):
        layer, ck, cv = inputs
        y, new_kv = _block(carry, layer, bias, cfg, cache_kv=(ck, cv),
                           cache_index=cache_index)
        return y, new_kv

    x, (new_k, new_v) = lax.scan(scan_body, x,
                                 (params["blocks"], cache["k"], cache["v"]))
    logits = _final_logits(params, cfg, x)
    return logits, {"k": new_k, "v": new_v}


# ---------------------------------------------------------------------------
# Split-cache decode path (beam search)
#
# Beams of one image share the prefix positions of the KV cache — beam
# reordering permutes only *generated* positions. Splitting the cache into a
# per-image prefix part [L, N, H, K, hd] and a per-beam generated part
# [L, N*R, H, E, hd] removes the prefix from the per-step beam gather
# (the dominant HBM traffic of cached beam decode) and shrinks cache memory
# by ~(R-1)/R * K/(K+E).
# ---------------------------------------------------------------------------


def prefill(params: Params, cfg: GPT2Config, inputs_embeds: jnp.ndarray
            ) -> Tuple[jnp.ndarray, Params]:
    """Run the prompt/prefix [N, K, D] once; return (last-position logits
    [N, V], prefix_cache {k, v: [L, N, K, D]}).

    Cache layout note: K/V live as [*, seq, H*hd] — sequence-major over a
    contiguous 768-lane payload. Decode reads them with VPU
    multiply+group-reduce (no head-axis transposes), and the generated
    cache's per-step write is a contiguous dynamic_update_slice.
    """
    N, K, D = inputs_embeds.shape
    x = inputs_embeds + params["wpe"][:K]
    x = x.astype(cfg.compute_dtype)
    causal = jnp.tril(jnp.ones((K, K), jnp.bool_))
    bias = jnp.where(causal, 0.0, NEG_INF)[None, None, :, :].astype(jnp.float32)

    def body(carry, layer):
        h = _layer_norm(carry, layer["ln_1"]["scale"], layer["ln_1"]["bias"],
                        cfg.layer_norm_epsilon)
        cdt = cfg.compute_dtype
        qkv = jnp.dot(h.astype(cdt), layer["attn"]["c_attn_w"].astype(cdt),
                      preferred_element_type=jnp.float32) + layer["attn"]["c_attn_b"]
        q, k, v = jnp.split(qkv.astype(cdt), 3, axis=-1)
        H, hd = cfg.n_head, cfg.head_dim
        qh = q.reshape(N, K, H, hd).transpose(0, 2, 1, 3)
        kh = k.reshape(N, K, H, hd).transpose(0, 2, 1, 3)
        vh = v.reshape(N, K, H, hd).transpose(0, 2, 1, 3)
        attn = _attention(qh, kh, vh, bias)
        attn = attn.transpose(0, 2, 1, 3).reshape(N, K, D).astype(cdt)
        attn = jnp.dot(attn, layer["attn"]["c_proj_w"].astype(cdt),
                       preferred_element_type=jnp.float32) + layer["attn"]["c_proj_b"]
        y = carry + attn.astype(carry.dtype)
        h = _layer_norm(y, layer["ln_2"]["scale"], layer["ln_2"]["bias"],
                        cfg.layer_norm_epsilon)
        h = jnp.dot(h.astype(cdt), layer["mlp"]["c_fc_w"].astype(cdt),
                    preferred_element_type=jnp.float32) + layer["mlp"]["c_fc_b"]
        h = gelu_new(h).astype(cdt)
        h = jnp.dot(h, layer["mlp"]["c_proj_w"].astype(cdt),
                    preferred_element_type=jnp.float32) + layer["mlp"]["c_proj_b"]
        y = y + h.astype(y.dtype)
        return y, (k, v)  # seq-major [N, K, D]

    x, (pk, pv) = lax.scan(body, x, params["blocks"])
    logits = _final_logits(params, cfg, x[:, -1:, :])[:, 0]
    return logits, {"k": pk, "v": pv}


def init_gen_cache(cfg: GPT2Config, batch: int, max_new: int,
                   dtype=None) -> Params:
    dtype = dtype or cfg.compute_dtype
    shape = (cfg.n_layer, batch, max_new, cfg.n_embd)
    return {"k": jnp.zeros(shape, dtype), "v": jnp.zeros(shape, dtype)}


def init_gen_cache_rowmajor(cfg: GPT2Config, batch: int, max_new: int,
                            dtype=None) -> Params:
    """Row-major gen cache [B, L, E, D]: each beam row's K/V across all
    layers is one contiguous block, so the per-step beam permutation is a
    single whole-row DMA per beam (the [L, B, E, D] layout needs L strided
    segments per row, and the gather is DMA-descriptor-issue-bound —
    measured 260 GB/s vs HBM's ~820)."""
    dtype = dtype or cfg.compute_dtype
    shape = (batch, cfg.n_layer, max_new, cfg.n_embd)
    return {"k": jnp.zeros(shape, dtype), "v": jnp.zeros(shape, dtype)}


def init_gen_cache_rowmajor_int8(cfg: GPT2Config, batch: int,
                                 max_new: int) -> Params:
    """Row-major int8 gen cache: levels [B, L, E, D] int8 plus per-slot
    absmax scales [B, L, 1, E] f32 (value = level * scale). Written by
    ops.cache_reorder.write_gen_slot_chunk_q, read by the quantized fused
    attention kernel — half the streaming bytes of the bf16 cache."""
    shape = (batch, cfg.n_layer, max_new, cfg.n_embd)
    sshape = (batch, cfg.n_layer, 1, max_new)
    return {"k": jnp.zeros(shape, jnp.int8),
            "v": jnp.zeros(shape, jnp.int8),
            "ks": jnp.zeros(sshape, jnp.float32),
            "vs": jnp.zeros(sshape, jnp.float32)}


def init_gen_cache_int8(cfg: GPT2Config, batch: int, max_new: int) -> Params:
    """Seq-major int8 gen cache (greedy/top-p): levels [L, B, E, D] int8
    plus per-slot absmax scales [L, B, 1, E] f32."""
    shape = (cfg.n_layer, batch, max_new, cfg.n_embd)
    sshape = (cfg.n_layer, batch, 1, max_new)
    return {"k": jnp.zeros(shape, jnp.int8),
            "v": jnp.zeros(shape, jnp.int8),
            "ks": jnp.zeros(sshape, jnp.float32),
            "vs": jnp.zeros(sshape, jnp.float32)}


def quantize_prefix_cache(prefix_cache: Params) -> Params:
    """Quantize a prefill prefix cache ([L, N, K, D] k/v) to int8 levels +
    per-(layer, image, slot) absmax scales ([L, N, 1, K] f32).

    The prefix cache is written once and read every decode step by every
    beam — the largest fixed traffic term of the step; int8 halves it.
    Consumed by the chunked int8 fused-attention kernel (int8 serving
    path; NOT token-identical to bf16)."""
    from ..ops.cache_reorder import absmax_int8_quant
    qk, sk = absmax_int8_quant(prefix_cache["k"])   # [L,N,K,D], [L,N,K,1]
    qv, sv = absmax_int8_quant(prefix_cache["v"])
    return {"k": qk, "v": qv,
            "ks": sk[..., 0][:, :, None, :],        # [L, N, 1, K]
            "vs": sv[..., 0][:, :, None, :]}


def pad_prefix_cache(prefix_cache: Params, k_pad: int) -> Params:
    """Zero-pad a prefill prefix cache ({k, v: [L, N, K, D]}) to k_pad
    slots. The XLA:TPU backend CHECK-crashes lowering the fused decode
    attention kernels when K is 4 mod 8 and n_embd is one 128-lane tile
    (ops/decode_attention._mask_padded_prefix has the measured matrix),
    so the beam engine 8-aligns the cache once at prefill and passes the
    true length to the kernels, which NEG_INF-mask the padded slots.
    Call BEFORE quantize_prefix_cache (zero rows quantize to 0*0)."""
    if "ks" in prefix_cache:
        raise ValueError("pad_prefix_cache must run before "
                         "quantize_prefix_cache")
    K = prefix_cache["k"].shape[2]
    if k_pad < K:
        raise ValueError(f"k_pad {k_pad} < prefix length {K}")
    if k_pad == K:
        return prefix_cache
    pad = ((0, 0), (0, 0), (0, k_pad - K), (0, 0))
    return {"k": jnp.pad(prefix_cache["k"], pad),
            "v": jnp.pad(prefix_cache["v"], pad)}


def repeat_prefix_cache(prefix_cache: Params, repeats: int) -> Params:
    """Tile a [L, N, ...] prefix cache to [L, N*R, ...] (unified-cache path)."""
    return jax.tree.map(
        lambda a: jnp.repeat(a, repeats, axis=1), prefix_cache)


def decode_step(params: Params, cfg: GPT2Config, token_embed: jnp.ndarray,
                prefix_cache: Params, gen_cache: Params,
                step: jnp.ndarray,
                anc_oh: Optional[jnp.ndarray] = None,
                rowmajor: bool = False,
                slot_write_kernel: bool = False,
                chunk_slot_write: bool = False,
                fused_attention: bool = False,
                fused_interpret: bool = False,
                fused_block_beams: int = 20,
                fused_slot_chunks: int = 0,
                return_hidden: bool = False,
                e_cap: Optional[int] = None,
                prefix_len: Optional[int] = None
                ) -> Tuple[jnp.ndarray, Params]:
    """One decode step over split caches.

    `prefix_len`: true prefix length when the fused-attention prefix
    cache carries 8-alignment padding (pad_prefix_cache); padded slots
    are NEG_INF-masked inside the fused kernels. None = no padding.

    token_embed: [B, D] embeddings of the tokens decoded at generated
    position `step` (B = N * R beams; prefix_cache holds N rows). Writes
    K/V at gen slot `step`, attends over prefix + gen slots <= step, and
    returns (next-token logits [B, V], updated gen_cache).

    Attention here is deliberately matmul-free: with seq-major [*, S, 768]
    caches, per-head scores/outputs are elementwise multiplies + 64-lane
    group reductions on the VPU. This keeps the cache in its storage layout
    end to end — a head-major batched matmul would make XLA transpose-copy
    the whole cache every step (measured via jax.profiler).

    `anc_oh` [N, R, R, E] (float 0/1) enables ancestry attention for beam
    search WITHOUT physically reordering the cache each step: rows stay
    where they were written and `anc_oh[n, rq, rs, e] == 1` means beam
    rq's slot-e K/V live in cache row rs. Selection via the one-hot is
    exact (bit-identical to a reordered cache) but was MEASURED SLOWER
    than reordering at beam 5 (the R_s sum re-reads the cache ~R times);
    kept as an oracle-tested variant, default off.

    `rowmajor=True` reads a [B, L, E, D] gen cache (init_gen_cache_rowmajor)
    — per-layer slices inside the scan, contiguous per-beam rows outside,
    making the beam permutation one whole-row DMA per beam.

    `e_cap` (static): bound the fused rowmajor kernels' generated-cache
    reads to the first e_cap slots (BeamConfig.full_alloc: full-size
    allocation, stage-bounded reads). Caller guarantees step < e_cap.
    Ignored by the chunked kernels (already step-bounded) and the XLA
    paths (the validity mask handles correctness; their slice costs
    don't scale with the allocation the same way).
    """
    B, D = token_embed.shape
    L, N, K, _ = prefix_cache["k"].shape
    E = gen_cache["k"].shape[2]
    R = B // N
    H, hd = cfg.n_head, cfg.head_dim
    cdt = cfg.compute_dtype
    if prefix_len is not None and not (fused_attention or
                                       (rowmajor and "ks" in gen_cache)):
        # the XLA attention paths have no padded-slot mask — a padded
        # cache would attend over zero K/V rows as if they were real
        raise ValueError("prefix_len (padded prefix cache) requires the "
                         "fused-attention rowmajor path")

    # position of the token being decoded: true prefix length, not the
    # (possibly 8-alignment-padded) cache slot count
    pos = (K if prefix_len is None else prefix_len) + step
    x = token_embed + params["wpe"][pos]
    x = x.astype(cdt)[:, None, :]  # [B, 1, D]

    # Past-slot visibility: slot s valid iff s < step (strictly). The
    # current token's K/V never touch the big cache inside the layer scan —
    # its self-attention contribution is one extra score column. Per-layer
    # new K/V are collected as *small* scan outputs ([L, B, D]) and written
    # with a single contiguous dynamic_update_slice after the scan;
    # updating the full cache inside the scan defeats XLA's in-place buffer
    # aliasing and copies ~GBs per decode step (measured via jax.profiler).
    gen_valid = jnp.arange(E) < step                    # [E]

    def head_out(x):
        """Final projection of the step's hidden state: logits, or the
        ln_f'd hidden when the caller runs the fused LM-head kernel
        (ops/lm_head.py) itself."""
        if return_hidden:
            return final_hidden(params, cfg, x)[:, 0]
        return _final_logits(params, cfg, x)[:, 0]
    scale = 1.0 / (hd ** 0.5)

    def heads(prod):
        """Group-reduce the 768-lane payload into per-head sums.
        prod: [..., D] -> [..., H] (sum over each head's 64 lanes)."""
        return jnp.sum(prod.reshape(prod.shape[:-1] + (H, hd)), axis=-1)

    def spread(p):
        """Inverse of `heads` for probabilities: [..., H] -> [..., D]."""
        return jnp.repeat(p, hd, axis=-1)

    def body_core(x, layer, pk, pv, gk, gv, attn_fn=None, gks=None,
                  gvs=None):
        h = _layer_norm(x, layer["ln_1"]["scale"], layer["ln_1"]["bias"],
                        cfg.layer_norm_epsilon)
        qkv = jnp.dot(h[:, 0].astype(cdt), layer["attn"]["c_attn_w"].astype(cdt),
                      preferred_element_type=jnp.float32) + layer["attn"]["c_attn_b"]
        q, k_new, v_new = jnp.split(qkv.astype(cdt), 3, axis=-1)  # [B, D]

        if attn_fn is not None:
            # Fused Pallas attention (scores+softmax+value over prefix,
            # generated and current slots in one kernel); the remaining
            # XLA attention math below is skipped entirely.
            out = attn_fn(q, k_new, v_new)
            out = jnp.dot(out.astype(cdt),
                          layer["attn"]["c_proj_w"].astype(cdt),
                          preferred_element_type=jnp.float32
                          ) + layer["attn"]["c_proj_b"]
            y = x + out[:, None, :].astype(x.dtype)
            h = _layer_norm(y, layer["ln_2"]["scale"], layer["ln_2"]["bias"],
                            cfg.layer_norm_epsilon)
            h = jnp.dot(h[:, 0].astype(cdt), layer["mlp"]["c_fc_w"].astype(cdt),
                        preferred_element_type=jnp.float32
                        ) + layer["mlp"]["c_fc_b"]
            h = gelu_new(h).astype(cdt)
            h = jnp.dot(h, layer["mlp"]["c_proj_w"].astype(cdt),
                        preferred_element_type=jnp.float32
                        ) + layer["mlp"]["c_proj_b"]
            y = y + h[:, None, :].astype(y.dtype)
            return y, (k_new, v_new)

        q_img = q.reshape(N, R, 1, D)
        # prefix scores [N, R, K, H]: beams share the per-image rows.
        sp = heads((q_img * pk[:, None, :, :].astype(cdt)).astype(jnp.float32))
        # generated-slot scores [B, E, H]. Invalid slots (>= step) may hold
        # arbitrary bits (the bounded reorder skips them), so masking must
        # be NaN-proof: `where`, never additive bias, and the value-side
        # products are zeroed through `where` as well (0 * NaN == NaN).
        if anc_oh is None:
            sg = heads((q[:, None, :] * gk.astype(cdt)).astype(jnp.float32))
        else:
            # Pairwise scores over the image's R source rows, then exact
            # one-hot ancestry selection (adds zeros only — bit-identical
            # to the reordered-row score).
            gk_img = gk.reshape(N, R, E, D).astype(cdt)
            sg_all = heads((q_img[:, :, None, :, :] *
                            gk_img[:, None, :, :, :]).astype(jnp.float32))
            sg = jnp.sum(sg_all * anc_oh[..., None], axis=2).reshape(B, E, H)
        if gks is not None:
            # int8 cache: per-slot K dequant scale factors out of the
            # head reduction (f32, applied before masking)
            sg = sg * gks[:, :, None]
        sg = jnp.where(gen_valid[None, :, None], sg * scale, NEG_INF)
        # current token attends to itself [B, 1, H].
        sc = heads((q * k_new).astype(jnp.float32))[:, None, :]
        scores = jnp.concatenate(
            [sp.reshape(B, K, H) * scale, sg, sc * scale],
            axis=1)                                     # [B, K+E+1, H]
        probs = jax.nn.softmax(scores, axis=1)
        if gvs is not None:
            # fold the V dequant scales into the probabilities (the value
            # reduction is linear), in f32 before the compute-dtype cast
            mult = jnp.concatenate(
                [jnp.ones((B, K), jnp.float32), gvs,
                 jnp.ones((B, 1), jnp.float32)], axis=1)
            probs = probs * mult[:, :, None]
        p_p = spread(probs[:, :K, :].astype(cdt))        # [B, K, D]
        p_g = spread(probs[:, K:K + E, :].astype(cdt))   # [B, E, D]
        p_c = spread(probs[:, K + E, :].astype(cdt))     # [B, D]
        out = jnp.sum(p_p.reshape(N, R, K, D) * pv[:, None, :, :].astype(cdt),
                      axis=2).reshape(B, D)
        if anc_oh is None:
            gv_sel = gv.astype(cdt)
        else:
            # Ancestry-select each beam's V rows: the one-hot sum picks one
            # value and adds exact zeros (1.0 and 0.0 are exact in cdt) —
            # identical to the reordered gv, no precision caveat.
            gv_img = gv.reshape(N, 1, R, E, D).astype(cdt)
            gv_sel = jnp.sum(gv_img * anc_oh[..., None].astype(cdt), axis=2
                             ).reshape(B, E, D)
        out = out + jnp.sum(
            jnp.where(gen_valid[None, :, None], p_g * gv_sel, 0.0),
            axis=1)
        out = out + p_c * v_new
        out = jnp.dot(out.astype(cdt), layer["attn"]["c_proj_w"].astype(cdt),
                      preferred_element_type=jnp.float32) + layer["attn"]["c_proj_b"]
        y = x + out[:, None, :].astype(x.dtype)
        h = _layer_norm(y, layer["ln_2"]["scale"], layer["ln_2"]["bias"],
                        cfg.layer_norm_epsilon)
        h = jnp.dot(h[:, 0].astype(cdt), layer["mlp"]["c_fc_w"].astype(cdt),
                    preferred_element_type=jnp.float32) + layer["mlp"]["c_fc_b"]
        h = gelu_new(h).astype(cdt)
        h = jnp.dot(h, layer["mlp"]["c_proj_w"].astype(cdt),
                    preferred_element_type=jnp.float32) + layer["mlp"]["c_proj_b"]
        y = y + h[:, None, :].astype(y.dtype)
        return y, (k_new, v_new)

    if rowmajor:
        genk, genv = gen_cache["k"], gen_cache["v"]  # [B, L, E, D]
        int8_cache = "ks" in gen_cache

        if int8_cache:
            # int8 levels + per-slot scales: quantized fused attention and
            # the quantizing chunk write (write_gen_slot_chunk_q) are the
            # only supported paths for this cache layout.
            from ..ops.cache_reorder import write_gen_slot_chunk_q
            from ..ops.decode_attention import (
                beam_decode_attention_chunked_q,
                beam_decode_attention_rowmajor_q)
            pk_all = prefix_cache["k"]
            pv_all = prefix_cache["v"]
            gks, gvs = gen_cache["ks"], gen_cache["vs"]

            pks_all = prefix_cache.get("ks")  # int8 prefix cache scales
            pvs_all = prefix_cache.get("vs")
            if pks_all is not None and not fused_slot_chunks:
                raise ValueError("int8 prefix cache requires the chunked "
                                 "fused kernel (fused_slot_chunks > 0)")

            def body_q(x, inputs):
                layer, l = inputs

                def attn_fn(q, k_new, v_new):
                    if fused_slot_chunks:
                        return beam_decode_attention_chunked_q(
                            q, k_new, v_new, pk_all, pv_all, genk, genv,
                            gks, gvs, step, l, beams_per_image=R,
                            head_dim=hd, block_beams=fused_block_beams,
                            chunk=fused_slot_chunks,
                            pks=pks_all, pvs=pvs_all,
                            interpret=fused_interpret, k_true=prefix_len)
                    return beam_decode_attention_rowmajor_q(
                        q, k_new, v_new, pk_all, pv_all, genk, genv,
                        gks, gvs, step, l, beams_per_image=R, head_dim=hd,
                        block_beams=fused_block_beams,
                        interpret=fused_interpret, e_cap=e_cap,
                        k_true=prefix_len)

                return body_core(x, layer, None, None, None, None,
                                 attn_fn=attn_fn)

            x, (ks, vs) = lax.scan(
                body_q, x, (params["blocks"], jnp.arange(L)))
            upd = write_gen_slot_chunk_q(
                genk, genv, gks, gvs, ks.transpose(1, 0, 2),
                vs.transpose(1, 0, 2), step, interpret=fused_interpret)
            logits = head_out(x)
            return logits, upd

        if fused_attention:
            from ..ops.decode_attention import (
                beam_decode_attention_chunked, beam_decode_attention_rowmajor)
            pk_all = prefix_cache["k"]
            pv_all = prefix_cache["v"]

            def body_fused(x, inputs):
                layer, l = inputs

                def attn_fn(q, k_new, v_new):
                    if fused_slot_chunks:
                        # v3: slot-bounded chunk-grid reads — per step only
                        # ceil(step/chunk) chunks of the generated cache
                        # leave HBM (ops/decode_attention.py).
                        return beam_decode_attention_chunked(
                            q, k_new, v_new, pk_all, pv_all, genk, genv,
                            step, l, beams_per_image=R, head_dim=hd,
                            block_beams=fused_block_beams,
                            chunk=fused_slot_chunks,
                            interpret=fused_interpret, k_true=prefix_len)
                    return beam_decode_attention_rowmajor(
                        q, k_new, v_new, pk_all, pv_all, genk, genv,
                        step, l, beams_per_image=R, head_dim=hd,
                        block_beams=fused_block_beams,
                        interpret=fused_interpret, e_cap=e_cap,
                        k_true=prefix_len)

                return body_core(x, layer, None, None, None, None,
                                 attn_fn=attn_fn)

            x, (ks, vs) = lax.scan(
                body_fused, x, (params["blocks"], jnp.arange(L)))
        else:
            def body_rm(x, inputs):
                layer, pk, pv, l = inputs
                gk = lax.dynamic_index_in_dim(genk, l, axis=1, keepdims=False)
                gv = lax.dynamic_index_in_dim(genv, l, axis=1, keepdims=False)
                return body_core(x, layer, pk, pv, gk, gv)

            x, (ks, vs) = lax.scan(
                body_rm, x, (params["blocks"], prefix_cache["k"],
                             prefix_cache["v"], jnp.arange(L)))

        if chunk_slot_write:
            # Chunked in-place slot write (Pallas): stream only the
            # aligned 8-slot chunk containing `step` instead of XLA's
            # whole-cache masked RMW (~2 ms/step at batch 640, E=80).
            # Requires E % 8 == 0 (beam.py's stage buckets are 8-aligned).
            from ..ops.cache_reorder import write_gen_slot_chunk
            upd_cache = write_gen_slot_chunk(
                genk, genv, ks.transpose(1, 0, 2), vs.transpose(1, 0, 2),
                step, interpret=fused_interpret)
            new_k, new_v = upd_cache["k"], upd_cache["v"]
        elif slot_write_kernel:
            # Strided-DMA write of the new slot (Pallas, in place). XLA's
            # dynamic-update-slice at a dynamic slot index in the tiled
            # sublane dim lowers to a whole-cache masked RMW pass
            # (measured 2.4 ms/step at batch 640) — the DMA writes only
            # the B*L new rows.
            from ..ops.cache_reorder import write_gen_slot
            upd_cache = write_gen_slot(genk, genv, ks.transpose(1, 0, 2),
                                       vs.transpose(1, 0, 2), step)
            new_k, new_v = upd_cache["k"], upd_cache["v"]
        else:
            def upd(cache, slim):  # slim [L, B, D] -> cache [B, L, E, D]
                return lax.dynamic_update_slice(
                    cache, slim.transpose(1, 0, 2)[:, :, None, :].astype(
                        cache.dtype), (0, 0, step, 0))

            new_k, new_v = upd(genk, ks), upd(genv, vs)
    elif "ks" in gen_cache:
        # Seq-major int8 cache [L, B, E, D] + scales [L, B, 1, E]
        # (greedy/top-p serving knob): dequant rides the XLA attention
        # math in body_core; the slot write quantizes in XLA.
        def body_q8(x, inputs):
            layer, pk, pv, gk, gv, sk, sv = inputs
            return body_core(x, layer, pk, pv, gk, gv,
                             gks=sk[:, 0, :], gvs=sv[:, 0, :])

        x, (ks, vs) = lax.scan(
            body_q8, x, (params["blocks"], prefix_cache["k"],
                         prefix_cache["v"], gen_cache["k"],
                         gen_cache["v"], gen_cache["ks"],
                         gen_cache["vs"]))

        from ..ops.cache_reorder import absmax_int8_quant
        qk, sk_new = absmax_int8_quant(ks)   # [L, B, D] -> levels, scales
        qv, sv_new = absmax_int8_quant(vs)
        new_k = lax.dynamic_update_slice(
            gen_cache["k"], qk[:, :, None, :], (0, 0, step, 0))
        new_v = lax.dynamic_update_slice(
            gen_cache["v"], qv[:, :, None, :], (0, 0, step, 0))
        new_ks = lax.dynamic_update_slice(
            gen_cache["ks"], sk_new[:, :, None, :], (0, 0, 0, step))
        new_vs = lax.dynamic_update_slice(
            gen_cache["vs"], sv_new[:, :, None, :], (0, 0, 0, step))
        logits = head_out(x)
        return logits, {"k": new_k, "v": new_v,
                        "ks": new_ks, "vs": new_vs}
    else:
        def body(x, inputs):
            layer, pk, pv, gk, gv = inputs
            return body_core(x, layer, pk, pv, gk, gv)

        x, (ks, vs) = lax.scan(
            body, x, (params["blocks"], prefix_cache["k"],
                      prefix_cache["v"], gen_cache["k"], gen_cache["v"]))
        if chunk_slot_write:
            # Same masked-RMW pathology as the row-major layout: the DUS
            # below streams the whole [L, B, E, D] cache per step; the
            # chunk kernel streams only the aligned 8-slot chunk.
            from ..ops.cache_reorder import write_gen_slot_chunk_seqmajor
            upd_cache = write_gen_slot_chunk_seqmajor(
                gen_cache["k"], gen_cache["v"], ks, vs, step,
                interpret=fused_interpret)
            new_k, new_v = upd_cache["k"], upd_cache["v"]
        else:
            new_k = lax.dynamic_update_slice(
                gen_cache["k"],
                ks[:, :, None, :].astype(gen_cache["k"].dtype),
                (0, 0, step, 0))
            new_v = lax.dynamic_update_slice(
                gen_cache["v"],
                vs[:, :, None, :].astype(gen_cache["v"].dtype),
                (0, 0, step, 0))
    logits = head_out(x)
    return logits, {"k": new_k, "v": new_v}


# ---------------------------------------------------------------------------
# HuggingFace / torch state_dict conversion
# ---------------------------------------------------------------------------

def params_from_torch_state_dict(state_dict: Dict[str, Any], cfg: GPT2Config,
                                 prefix: str = "", dtype=jnp.float32) -> Params:
    """Build a params pytree from a HF GPT2LMHeadModel state_dict.

    `prefix` handles nesting (CapDec checkpoints store the LM under `gpt.`,
    reference train.py:266 / checkpoint key structure `gpt.*`). HF stores
    attention/MLP weights as Conv1D ([in, out]) so no transpose is needed.
    Accepts torch tensors or numpy arrays.
    """
    import numpy as np

    def get(name):
        t = state_dict[prefix + name]
        if hasattr(t, "detach"):
            t = t.detach().cpu().numpy()
        return jnp.asarray(np.asarray(t), dtype=dtype)

    L = cfg.n_layer

    def stack(fmt):
        return jnp.stack([get(fmt.format(i)) for i in range(L)])

    return {
        "wte": get("transformer.wte.weight"),
        "wpe": get("transformer.wpe.weight"),
        "ln_f": {"scale": get("transformer.ln_f.weight"),
                 "bias": get("transformer.ln_f.bias")},
        "blocks": {
            "ln_1": {"scale": stack("transformer.h.{}.ln_1.weight"),
                     "bias": stack("transformer.h.{}.ln_1.bias")},
            "ln_2": {"scale": stack("transformer.h.{}.ln_2.weight"),
                     "bias": stack("transformer.h.{}.ln_2.bias")},
            "attn": {
                "c_attn_w": stack("transformer.h.{}.attn.c_attn.weight"),
                "c_attn_b": stack("transformer.h.{}.attn.c_attn.bias"),
                "c_proj_w": stack("transformer.h.{}.attn.c_proj.weight"),
                "c_proj_b": stack("transformer.h.{}.attn.c_proj.bias"),
            },
            "mlp": {
                "c_fc_w": stack("transformer.h.{}.mlp.c_fc.weight"),
                "c_fc_b": stack("transformer.h.{}.mlp.c_fc.bias"),
                "c_proj_w": stack("transformer.h.{}.mlp.c_proj.weight"),
                "c_proj_b": stack("transformer.h.{}.mlp.c_proj.bias"),
            },
        },
    }


def config_from_torch_state_dict(state_dict: Dict[str, Any], prefix: str = "",
                                 compute_dtype: Any = jnp.float32) -> GPT2Config:
    """Infer the decoder architecture from checkpoint shapes alone.

    Mirrors the CLIP-side `config_from_openai_state_dict`: the reference
    never stores a config next to its `.pt` (train.py:367-371 saves the raw
    state_dict), so shapes are the only source of truth. `n_head` is not
    recoverable from the fused c_attn shape; every released GPT-2 size uses
    head_dim 64 (124M: 768/12 … XL: 1600/25), so `n_embd // 64` recovers all
    of them. For non-standard widths (< 64) fall back to one head.
    """
    def shape(name):
        return tuple(state_dict[prefix + name].shape)

    vocab_size, n_embd = shape("transformer.wte.weight")
    seg = (prefix + "transformer.h.").count(".")
    n_layer = len({k.split(".")[seg] for k in state_dict
                   if k.startswith(prefix + "transformer.h.")})
    return GPT2Config(vocab_size=vocab_size,
                      n_positions=shape("transformer.wpe.weight")[0],
                      n_embd=n_embd, n_layer=n_layer,
                      n_head=max(1, n_embd // 64),
                      compute_dtype=compute_dtype)


def params_to_torch_state_dict(params: Params, prefix: str = "") -> Dict[str, Any]:
    """Inverse of `params_from_torch_state_dict` (numpy arrays as values)."""
    import numpy as np

    out = {}

    def put(name, arr):
        out[prefix + name] = np.asarray(arr)

    put("transformer.wte.weight", params["wte"])
    put("transformer.wpe.weight", params["wpe"])
    put("transformer.ln_f.weight", params["ln_f"]["scale"])
    put("transformer.ln_f.bias", params["ln_f"]["bias"])
    put("lm_head.weight", params["wte"])  # tied head
    b = params["blocks"]
    L = b["ln_1"]["scale"].shape[0]
    for i in range(L):
        put(f"transformer.h.{i}.ln_1.weight", b["ln_1"]["scale"][i])
        put(f"transformer.h.{i}.ln_1.bias", b["ln_1"]["bias"][i])
        put(f"transformer.h.{i}.ln_2.weight", b["ln_2"]["scale"][i])
        put(f"transformer.h.{i}.ln_2.bias", b["ln_2"]["bias"][i])
        put(f"transformer.h.{i}.attn.c_attn.weight", b["attn"]["c_attn_w"][i])
        put(f"transformer.h.{i}.attn.c_attn.bias", b["attn"]["c_attn_b"][i])
        put(f"transformer.h.{i}.attn.c_proj.weight", b["attn"]["c_proj_w"][i])
        put(f"transformer.h.{i}.attn.c_proj.bias", b["attn"]["c_proj_b"][i])
        put(f"transformer.h.{i}.mlp.c_fc.weight", b["mlp"]["c_fc_w"][i])
        put(f"transformer.h.{i}.mlp.c_fc.bias", b["mlp"]["c_fc_b"][i])
        put(f"transformer.h.{i}.mlp.c_proj.weight", b["mlp"]["c_proj_w"][i])
        put(f"transformer.h.{i}.mlp.c_proj.bias", b["mlp"]["c_proj_b"][i])
    return out
