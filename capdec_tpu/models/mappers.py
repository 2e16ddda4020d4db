"""CLIP→GPT-2 prefix mapper networks, pure functional JAX.

Re-designs of the reference mapper family (behavioral contract in
SURVEY.md C8/C9):
  * `mlp`                  — Tanh MLP, sizes (prefix_size, 768*K/2, 768*K)
                             (reference train.py:106-118, 269-270)
  * `transformer`          — TransformerMapper: linear → clip_length pseudo
    (= `transformer_encoder`) tokens, concat a learned prefix_const, run a
                             pre-LN self-attention transformer (8 heads,
                             mlp_ratio 2.0), return the last prefix_length
                             slots (reference train.py:229-243,
                             transformer_mapper.py:113-127)
  * `transformer_decoder`  — TransformerEncoderDecoder: linear → 512-d ref
                             tokens → self-attn encoder → decoder of
                             interleaved cross/self layers seeded from
                             prefix_const (transformer_mapper.py:130-145)
  * `mapping_network`      — 7-layer LeakyReLU MLP (gpt2_prefix.py:129-136;
                             unused by the reference CLI, kept for parity)

TPU-first notes: transformer layers are stacked on a leading layer axis and
executed with one `lax.scan` (pairs of (cross, self) layers for the
enc-dec variant); attention uses fp32-accumulated einsums on the MXU. All
shapes are static.

Weight-layout convention: matrices are stored [in, out] so application is
`x @ W`; the torch converters transpose from `nn.Linear`'s [out, in].
"""
from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from jax import lax

Params = Dict[str, Any]


@dataclasses.dataclass(frozen=True)
class MapperConfig:
    mapping_type: str = "transformer"  # mlp|transformer|transformer_encoder|transformer_decoder|mapping_network
    dim_clip: int = 640                # CLIP embedding dim (640 RN50x4 / 512 ViT-B/32)
    dim_embedding: int = 768           # GPT-2 embedding dim
    prefix_length: int = 40            # K — number of GPT-2 prefix slots produced
    clip_length: int = 40              # pseudo-token count from the CLIP embedding
    num_layers: int = 8
    num_heads: int = 8
    mlp_ratio: float = 2.0
    enc_dec_dim_ref: int = 512         # encoder width of the enc-dec variant

    def canonical_type(self) -> str:
        t = self.mapping_type
        return "transformer" if t == "transformer_encoder" else t


# ---------------------------------------------------------------------------
# Linear / MLP helpers
# ---------------------------------------------------------------------------


def _init_linear(key, d_in, d_out, bias=True, dtype=jnp.float32):
    # Kaiming-uniform fan_in (torch nn.Linear default) keeps init statistics
    # comparable to the reference without copying its framework.
    bound = (1.0 / d_in) ** 0.5
    kw, kb = jax.random.split(key)
    p = {"w": jax.random.uniform(kw, (d_in, d_out), dtype, -bound * 3 ** 0.5,
                                 bound * 3 ** 0.5)}
    if bias:
        p["b"] = jax.random.uniform(kb, (d_out,), dtype, -bound, bound)
    return p


def _linear(p, x):
    y = jnp.dot(x, p["w"], preferred_element_type=jnp.float32)
    if "b" in p:
        y = y + p["b"]
    return y.astype(x.dtype)


def init_mlp(key, sizes: Tuple[int, ...], dtype=jnp.float32) -> Params:
    keys = jax.random.split(key, len(sizes) - 1)
    return {"layers": [
        _init_linear(keys[i], sizes[i], sizes[i + 1], dtype=dtype)
        for i in range(len(sizes) - 1)]}


def apply_mlp(params: Params, x: jnp.ndarray, act=jnp.tanh) -> jnp.ndarray:
    layers = params["layers"]
    for i, p in enumerate(layers):
        x = _linear(p, x)
        if i < len(layers) - 1:
            x = act(x)
    return x


def _leaky_relu(x):
    return jax.nn.leaky_relu(x, negative_slope=0.01)


# ---------------------------------------------------------------------------
# Transformer layers (pre-LN, fused-KV attention, no q/kv bias)
# ---------------------------------------------------------------------------


def _init_layer(key, dim_self, dim_ref, mlp_hidden, dtype=jnp.float32) -> Params:
    ks = jax.random.split(key, 5)
    return {
        "norm1": {"scale": jnp.ones((dim_self,), dtype),
                  "bias": jnp.zeros((dim_self,), dtype)},
        "attn": {
            "wq": _init_linear(ks[0], dim_self, dim_self, bias=False, dtype=dtype)["w"],
            "wkv": _init_linear(ks[1], dim_ref, 2 * dim_self, bias=False, dtype=dtype)["w"],
            "proj": _init_linear(ks[2], dim_self, dim_self, dtype=dtype),
        },
        "norm2": {"scale": jnp.ones((dim_self,), dtype),
                  "bias": jnp.zeros((dim_self,), dtype)},
        "mlp": {
            "fc1": _init_linear(ks[3], dim_self, mlp_hidden, dtype=dtype),
            "fc2": _init_linear(ks[4], mlp_hidden, dim_self, dtype=dtype),
        },
    }


def _layer_norm(x, p, eps=1e-5):
    x32 = x.astype(jnp.float32)
    mu = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x32 - mu), axis=-1, keepdims=True)
    return (((x32 - mu) * lax.rsqrt(var + eps)) * p["scale"] + p["bias"]).astype(x.dtype)


def _mha(p: Params, x: jnp.ndarray, y: jnp.ndarray, num_heads: int) -> jnp.ndarray:
    """Fused-KV multi-head attention; x queries attend over y (full, unmasked)."""
    B, N, C = x.shape
    M = y.shape[1]
    hd = C // num_heads
    q = jnp.dot(x, p["wq"], preferred_element_type=jnp.float32)
    kv = jnp.dot(y, p["wkv"], preferred_element_type=jnp.float32)
    k, v = jnp.split(kv, 2, axis=-1)
    q = q.reshape(B, N, num_heads, hd)
    k = k.reshape(B, M, num_heads, hd)
    v = v.reshape(B, M, num_heads, hd)
    scores = jnp.einsum("bnhd,bmhd->bhnm", q, k,
                        preferred_element_type=jnp.float32) * (hd ** -0.5)
    probs = jax.nn.softmax(scores.astype(jnp.float32), axis=-1)
    out = jnp.einsum("bhnm,bmhd->bnhd", probs.astype(x.dtype), v.astype(x.dtype),
                     preferred_element_type=jnp.float32)
    out = out.reshape(B, N, C).astype(x.dtype)
    return _linear(p["proj"], out)


def _layer_apply(p: Params, x: jnp.ndarray, y: Optional[jnp.ndarray],
                 num_heads: int) -> jnp.ndarray:
    """Pre-LN block: x += attn(norm1(x), y); x += mlp(norm2(x)).

    Matches the reference residual structure where only the *query* side is
    layer-normed and the reference side `y` is consumed raw
    (train.py:178-181).
    """
    ref = y if y is not None else _layer_norm(x, p["norm1"])
    x = x + _mha(p["attn"], _layer_norm(x, p["norm1"]), ref, num_heads)
    h = _layer_norm(x, p["norm2"])
    h = _linear(p["mlp"]["fc2"], jax.nn.relu(_linear(p["mlp"]["fc1"], h)))
    return x + h


def _init_stack(key, num_layers, dim_self, dim_ref, mlp_hidden, dtype=jnp.float32):
    keys = jax.random.split(key, num_layers)
    layers = [_init_layer(k, dim_self, dim_ref, mlp_hidden, dtype) for k in keys]
    return jax.tree.map(lambda *xs: jnp.stack(xs), *layers)


def _apply_stack_self(params: Params, x: jnp.ndarray, num_heads: int) -> jnp.ndarray:
    """Self-attention stack via lax.scan over the stacked layer axis."""

    def body(carry, layer):
        return _layer_apply(layer, carry, None, num_heads), None

    # Fully unrolled: mapper layers are tiny ([B,80,768] matmuls), so the
    # scan's per-iteration weight slicing + sequencing overhead dominates
    # actual compute (~3.8 ms of the 27 ms train step, profiled); unrolling
    # lets XLA pipeline across layers at negligible compile cost.
    x, _ = lax.scan(body, x, params, unroll=True)
    return x


def _apply_stack_enc_dec(cross_params: Params, self_params: Params,
                         x: jnp.ndarray, y: jnp.ndarray,
                         num_heads: int) -> jnp.ndarray:
    """Interleaved (cross, self) pairs — the reference `enc_dec` schedule
    (train.py:201-226): even layers cross-attend to y, odd layers self-attend.
    Scanned over pairs; the encoder output y is a loop invariant."""

    def body(carry, pair):
        cross, self_ = pair
        h = _layer_apply(cross, carry, y, num_heads)
        # Reference quirk (train.py:204-205 / transformer_mapper.py:89-90):
        # enc_dec self layers pass the RAW residual stream as keys/values
        # (`layer(x, x, mask)`), unlike plain self-attention which keys off
        # the layer-normed stream.
        h = _layer_apply(self_, h, h, num_heads)
        return h, None

    x, _ = lax.scan(body, x, (cross_params, self_params), unroll=True)
    return x


# ---------------------------------------------------------------------------
# Mapper init / apply
# ---------------------------------------------------------------------------


def init_mapper(key: jax.Array, cfg: MapperConfig, dtype=jnp.float32) -> Params:
    t = cfg.canonical_type()
    D, K, C = cfg.dim_embedding, cfg.prefix_length, cfg.clip_length
    if t == "mlp":
        return init_mlp(key, (cfg.dim_clip, (D * K) // 2, D * K), dtype)
    if t == "mapping_network":
        return init_mlp(key, tuple([cfg.dim_clip] * 7 + [K * D]), dtype)
    if t == "transformer":
        k1, k2, k3 = jax.random.split(key, 3)
        return {
            "linear": _init_linear(k1, cfg.dim_clip, C * D, dtype=dtype),
            "prefix_const": jax.random.normal(k2, (K, D), dtype),
            "layers": _init_stack(k3, cfg.num_layers, D, D,
                                  int(D * cfg.mlp_ratio), dtype),
        }
    if t == "transformer_decoder":
        k1, k2, k3, k4, k5 = jax.random.split(key, 5)
        R = cfg.enc_dec_dim_ref
        return {
            "linear": _init_linear(k1, cfg.dim_clip, C * R, dtype=dtype),
            "prefix_const": jax.random.normal(k2, (K, D), dtype),
            "encoder": _init_stack(k3, cfg.num_layers, R, R,
                                   int(R * cfg.mlp_ratio), dtype),
            "dec_cross": _init_stack(k4, cfg.num_layers, D, R,
                                     int(D * cfg.mlp_ratio), dtype),
            "dec_self": _init_stack(k5, cfg.num_layers, D, D,
                                    int(D * cfg.mlp_ratio), dtype),
        }
    raise ValueError(f"unknown mapping_type: {cfg.mapping_type}")


def apply_mapper(params: Params, cfg: MapperConfig, x: jnp.ndarray) -> jnp.ndarray:
    """Map CLIP embeddings [B, dim_clip] → prefix embeddings [B, K, 768]."""
    t = cfg.canonical_type()
    B = x.shape[0]
    D, K, C = cfg.dim_embedding, cfg.prefix_length, cfg.clip_length
    if t == "mlp":
        return apply_mlp(params, x, act=jnp.tanh).reshape(B, K, D)
    if t == "mapping_network":
        return apply_mlp(params, x, act=_leaky_relu).reshape(B, K, D)
    if t == "transformer":
        h = _linear(params["linear"], x).reshape(B, C, D)
        const = jnp.broadcast_to(params["prefix_const"][None], (B, K, D))
        h = jnp.concatenate([h, const], axis=1)
        h = _apply_stack_self(params["layers"], h, cfg.num_heads)
        return h[:, C:]
    if t == "transformer_decoder":
        R = cfg.enc_dec_dim_ref
        ref = _linear(params["linear"], x).reshape(B, C, R)
        ref = _apply_stack_self(params["encoder"], ref, cfg.num_heads)
        const = jnp.broadcast_to(params["prefix_const"][None], (B, K, D))
        return _apply_stack_enc_dec(params["dec_cross"], params["dec_self"],
                                    const, ref, cfg.num_heads)
    raise ValueError(f"unknown mapping_type: {cfg.mapping_type}")


# ---------------------------------------------------------------------------
# torch state_dict conversion (`clip_project.*` keys)
# ---------------------------------------------------------------------------


def _np(t):
    import numpy as np
    if hasattr(t, "detach"):
        t = t.detach().cpu().numpy()
    return np.asarray(t)


def _layer_from_torch(sd, base, dtype):
    g = lambda n: jnp.asarray(_np(sd[f"{base}.{n}"]), dtype=dtype)
    return {
        "norm1": {"scale": g("norm1.weight"), "bias": g("norm1.bias")},
        "attn": {
            "wq": g("attn.to_queries.weight").T,
            "wkv": g("attn.to_keys_values.weight").T,
            "proj": {"w": g("attn.project.weight").T, "b": g("attn.project.bias")},
        },
        "norm2": {"scale": g("norm2.weight"), "bias": g("norm2.bias")},
        "mlp": {
            "fc1": {"w": g("mlp.fc1.weight").T, "b": g("mlp.fc1.bias")},
            "fc2": {"w": g("mlp.fc2.weight").T, "b": g("mlp.fc2.bias")},
        },
    }


def _stack_layers(layers):
    return jax.tree.map(lambda *xs: jnp.stack(xs), *layers)


def mapper_from_torch_state_dict(sd: Dict[str, Any], cfg: MapperConfig,
                                 prefix: str = "clip_project.",
                                 dtype=jnp.float32) -> Params:
    """Convert reference `clip_project.*` checkpoint keys to our pytree.

    MLP variant keys: `model.{2i}.weight/bias` (Sequential with activations
    at odd indices). Transformer variant: `linear.*`, `prefix_const`,
    `transformer.layers.{i}.*`. Enc-dec variant: `ref_encoder.layers.{i}.*`,
    `prefix_decoder.layers.{2i|2i+1}.*`.
    """
    t = cfg.canonical_type()
    g = lambda n: jnp.asarray(_np(sd[prefix + n]), dtype=dtype)
    if t in ("mlp", "mapping_network"):
        # Sequential indices: linears at even slots, activations at odd.
        # MappingNetwork nests its MLP under `mlp.` (gpt2_prefix.py:136).
        base = "model" if t == "mlp" else "mlp.model"
        n_linear = 2 if t == "mlp" else 7
        layers = [{"w": g(f"{base}.{2 * i}.weight").T, "b": g(f"{base}.{2 * i}.bias")}
                  for i in range(n_linear)]
        return {"layers": layers}
    if t == "transformer":
        layers = [_layer_from_torch(sd, f"{prefix}transformer.layers.{i}", dtype)
                  for i in range(cfg.num_layers)]
        return {
            "linear": {"w": g("linear.weight").T, "b": g("linear.bias")},
            "prefix_const": g("prefix_const"),
            "layers": _stack_layers(layers),
        }
    if t == "transformer_decoder":
        enc = [_layer_from_torch(sd, f"{prefix}ref_encoder.layers.{i}", dtype)
               for i in range(cfg.num_layers)]
        cross = [_layer_from_torch(sd, f"{prefix}prefix_decoder.layers.{2 * i}", dtype)
                 for i in range(cfg.num_layers)]
        self_ = [_layer_from_torch(sd, f"{prefix}prefix_decoder.layers.{2 * i + 1}", dtype)
                 for i in range(cfg.num_layers)]
        return {
            "linear": {"w": g("linear.weight").T, "b": g("linear.bias")},
            "prefix_const": g("prefix_const"),
            "encoder": _stack_layers(enc),
            "dec_cross": _stack_layers(cross),
            "dec_self": _stack_layers(self_),
        }
    raise ValueError(f"unknown mapping_type: {cfg.mapping_type}")


def _layer_to_torch(out, base, layer, i):
    import numpy as np
    idx = lambda a: np.asarray(a[i])
    out[f"{base}.norm1.weight"] = idx(layer["norm1"]["scale"])
    out[f"{base}.norm1.bias"] = idx(layer["norm1"]["bias"])
    out[f"{base}.attn.to_queries.weight"] = idx(layer["attn"]["wq"]).T
    out[f"{base}.attn.to_keys_values.weight"] = idx(layer["attn"]["wkv"]).T
    out[f"{base}.attn.project.weight"] = idx(layer["attn"]["proj"]["w"]).T
    out[f"{base}.attn.project.bias"] = idx(layer["attn"]["proj"]["b"])
    out[f"{base}.norm2.weight"] = idx(layer["norm2"]["scale"])
    out[f"{base}.norm2.bias"] = idx(layer["norm2"]["bias"])
    out[f"{base}.mlp.fc1.weight"] = idx(layer["mlp"]["fc1"]["w"]).T
    out[f"{base}.mlp.fc1.bias"] = idx(layer["mlp"]["fc1"]["b"])
    out[f"{base}.mlp.fc2.weight"] = idx(layer["mlp"]["fc2"]["w"]).T
    out[f"{base}.mlp.fc2.bias"] = idx(layer["mlp"]["fc2"]["b"])


def mapper_to_torch_state_dict(params: Params, cfg: MapperConfig,
                               prefix: str = "clip_project.") -> Dict[str, Any]:
    import numpy as np
    t = cfg.canonical_type()
    out: Dict[str, Any] = {}
    if t in ("mlp", "mapping_network"):
        base = "model" if t == "mlp" else "mlp.model"
        for j, p in enumerate(params["layers"]):
            out[f"{prefix}{base}.{2 * j}.weight"] = np.asarray(p["w"]).T
            out[f"{prefix}{base}.{2 * j}.bias"] = np.asarray(p["b"])
        return out
    out[f"{prefix}linear.weight"] = np.asarray(params["linear"]["w"]).T
    out[f"{prefix}linear.bias"] = np.asarray(params["linear"]["b"])
    out[f"{prefix}prefix_const"] = np.asarray(params["prefix_const"])
    if t == "transformer":
        for i in range(cfg.num_layers):
            _layer_to_torch(out, f"{prefix}transformer.layers.{i}",
                            params["layers"], i)
        return out
    if t == "transformer_decoder":
        for i in range(cfg.num_layers):
            _layer_to_torch(out, f"{prefix}ref_encoder.layers.{i}",
                            params["encoder"], i)
            _layer_to_torch(out, f"{prefix}prefix_decoder.layers.{2 * i}",
                            params["dec_cross"], i)
            _layer_to_torch(out, f"{prefix}prefix_decoder.layers.{2 * i + 1}",
                            params["dec_self"], i)
        return out
    raise ValueError(f"unknown mapping_type: {cfg.mapping_type}")
