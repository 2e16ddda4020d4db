"""CLIP encoders (text, ViT, modified-ResNet) in pure functional JAX.

The reference leans on the OpenAI `clip` package for embedding extraction
(embeddings_generator.py:3,49) and inference-time image encoding
(predictions_runner.py:157-161). Here the encoders are native JAX so the
whole embedding pipeline is batched and jitted on TPU (the reference
encodes one caption at a time — SURVEY.md §3.1 calls this out as the
biggest throughput sin).

Supported backbones (reference choices, embeddings_generator.py:113):
RN50, RN101, RN50x4, ViT-B/32. Weights convert from an OpenAI CLIP
checkpoint state_dict (the `.pt` the user downloads); random init exists
for tests. Inference-only: batchnorm runs in eval mode.

Conventions: images are NHWC float32 (already CLIP-normalized); conv
weights stored HWIO; linears stored [in, out].
"""
from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

Params = Dict[str, Any]


# ---------------------------------------------------------------------------
# Configs
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class CLIPTextConfig:
    vocab_size: int = 49408
    context_length: int = 77
    width: int = 512
    heads: int = 8
    layers: int = 12
    embed_dim: int = 512


@dataclasses.dataclass(frozen=True)
class CLIPViTConfig:
    image_resolution: int = 224
    patch_size: int = 32
    width: int = 768
    layers: int = 12
    heads: int = 12
    embed_dim: int = 512


@dataclasses.dataclass(frozen=True)
class CLIPResNetConfig:
    layers: Tuple[int, ...] = (4, 6, 10, 6)
    width: int = 80
    image_resolution: int = 288
    embed_dim: int = 640

    @property
    def heads(self) -> int:
        return self.width * 32 // 64


@dataclasses.dataclass(frozen=True)
class CLIPConfig:
    name: str
    text: CLIPTextConfig
    vision: Any  # CLIPViTConfig | CLIPResNetConfig

    @property
    def is_resnet(self) -> bool:
        return isinstance(self.vision, CLIPResNetConfig)


MODEL_CONFIGS: Dict[str, CLIPConfig] = {
    "ViT-B/32": CLIPConfig(
        "ViT-B/32",
        CLIPTextConfig(width=512, heads=8, layers=12, embed_dim=512),
        CLIPViTConfig(224, 32, 768, 12, 12, 512)),
    "RN50": CLIPConfig(
        "RN50",
        CLIPTextConfig(width=512, heads=8, layers=12, embed_dim=1024),
        CLIPResNetConfig((3, 4, 6, 3), 64, 224, 1024)),
    "RN101": CLIPConfig(
        "RN101",
        CLIPTextConfig(width=512, heads=8, layers=12, embed_dim=512),
        CLIPResNetConfig((3, 4, 23, 3), 64, 224, 512)),
    "RN50x4": CLIPConfig(
        "RN50x4",
        CLIPTextConfig(width=640, heads=10, layers=12, embed_dim=640),
        CLIPResNetConfig((4, 6, 10, 6), 80, 288, 640)),
}


def quick_gelu(x):
    return x * jax.nn.sigmoid(1.702 * x)


def _layer_norm(x, p, eps=1e-5):
    x32 = x.astype(jnp.float32)
    mu = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x32 - mu), axis=-1, keepdims=True)
    return (((x32 - mu) * lax.rsqrt(var + eps)) * p["scale"] + p["bias"]
            ).astype(x.dtype)


def _linear(p, x):
    y = jnp.dot(x, p["w"], preferred_element_type=jnp.float32)
    if p.get("b") is not None:
        y = y + p["b"]
    return y.astype(x.dtype)


# ---------------------------------------------------------------------------
# Transformer blocks (shared by text encoder and ViT)
# ---------------------------------------------------------------------------


def _mha(p: Params, x: jnp.ndarray, heads: int,
         causal_bias: Optional[jnp.ndarray]) -> jnp.ndarray:
    B, T, W = x.shape
    hd = W // heads
    qkv = _linear(p["in_proj"], x)  # [B, T, 3W]
    q, k, v = jnp.split(qkv, 3, axis=-1)
    q = q.reshape(B, T, heads, hd).transpose(0, 2, 1, 3)
    k = k.reshape(B, T, heads, hd).transpose(0, 2, 1, 3)
    v = v.reshape(B, T, heads, hd).transpose(0, 2, 1, 3)
    scores = jnp.einsum("bhtd,bhsd->bhts", q, k,
                        preferred_element_type=jnp.float32) * (hd ** -0.5)
    if causal_bias is not None:
        scores = scores + causal_bias
    probs = jax.nn.softmax(scores.astype(jnp.float32), axis=-1).astype(x.dtype)
    out = jnp.einsum("bhts,bhsd->bhtd", probs, v,
                     preferred_element_type=jnp.float32)
    out = out.transpose(0, 2, 1, 3).reshape(B, T, W).astype(x.dtype)
    return _linear(p["out_proj"], out)


def _resblock(p: Params, x: jnp.ndarray, heads: int,
              causal_bias: Optional[jnp.ndarray]) -> jnp.ndarray:
    x = x + _mha(p["attn"], _layer_norm(x, p["ln_1"]), heads, causal_bias)
    h = _layer_norm(x, p["ln_2"])
    h = _linear(p["mlp"]["c_proj"], quick_gelu(_linear(p["mlp"]["c_fc"], h)))
    return x + h


def _transformer(params_stack: Params, x: jnp.ndarray, heads: int,
                 causal: bool) -> jnp.ndarray:
    T = x.shape[1]
    bias = None
    if causal:
        mask = jnp.tril(jnp.ones((T, T), jnp.bool_))
        bias = jnp.where(mask, 0.0, -1e9)[None, None].astype(jnp.float32)

    def body(carry, layer):
        return _resblock(layer, carry, heads, bias), None

    x, _ = lax.scan(body, x, params_stack)
    return x


# ---------------------------------------------------------------------------
# Text encoder
# ---------------------------------------------------------------------------


def encode_text(params: Params, cfg: CLIPTextConfig,
                tokens: jnp.ndarray) -> jnp.ndarray:
    """tokens [B, 77] int32 → embeddings [B, embed_dim] (unnormalized,
    matching `clip_model.encode_text`)."""
    x = jnp.take(params["token_embedding"], tokens, axis=0)
    x = x + params["positional_embedding"][: x.shape[1]]
    x = _transformer(params["resblocks"], x, cfg.heads, causal=True)
    x = _layer_norm(x, params["ln_final"])
    # features at the EOT token (highest id in each row)
    eot = jnp.argmax(tokens, axis=-1)
    feats = jnp.take_along_axis(x, eot[:, None, None], axis=1)[:, 0]
    return jnp.dot(feats, params["text_projection"],
                   preferred_element_type=jnp.float32)


# ---------------------------------------------------------------------------
# ViT image encoder
# ---------------------------------------------------------------------------


def encode_image_vit(params: Params, cfg: CLIPViTConfig,
                     images: jnp.ndarray) -> jnp.ndarray:
    """images [B, H, W, 3] (CLIP-normalized) → [B, embed_dim]."""
    B = images.shape[0]
    x = lax.conv_general_dilated(
        images, params["conv1"],
        window_strides=(cfg.patch_size, cfg.patch_size), padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    x = x.reshape(B, -1, cfg.width)
    cls = jnp.broadcast_to(params["class_embedding"][None, None],
                           (B, 1, cfg.width)).astype(x.dtype)
    x = jnp.concatenate([cls, x], axis=1)
    x = x + params["positional_embedding"]
    x = _layer_norm(x, params["ln_pre"])
    x = _transformer(params["resblocks"], x, cfg.heads, causal=False)
    x = _layer_norm(x[:, :1], params["ln_post"])[:, 0]
    return jnp.dot(x, params["proj"], preferred_element_type=jnp.float32)


# ---------------------------------------------------------------------------
# Modified-ResNet image encoder (RN50 / RN101 / RN50x4)
# ---------------------------------------------------------------------------


def _bn(p, x, eps=1e-5):
    inv = lax.rsqrt(p["var"] + eps)
    return (x - p["mean"]) * inv * p["scale"] + p["bias"]


def _conv(w, x, stride=1, padding="SAME"):
    return lax.conv_general_dilated(
        x, w, window_strides=(stride, stride), padding=padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def _avg_pool(x, k):
    return lax.reduce_window(
        x, 0.0, lax.add, (1, k, k, 1), (1, k, k, 1), "VALID") / (k * k)


def _bottleneck(p: Params, x: jnp.ndarray, stride: int) -> jnp.ndarray:
    """CLIP's anti-aliased Bottleneck: stride-1 convs with an avgpool where
    torchvision would stride (openai CLIP model.py Bottleneck)."""
    out = jax.nn.relu(_bn(p["bn1"], _conv(p["conv1"], x)))
    out = jax.nn.relu(_bn(p["bn2"], _conv(p["conv2"], out)))
    if stride > 1:
        out = _avg_pool(out, stride)
    out = _bn(p["bn3"], _conv(p["conv3"], out))
    identity = x
    if "downsample" in p:
        identity = _avg_pool(x, stride) if stride > 1 else x
        identity = _bn(p["downsample"]["bn"],
                       _conv(p["downsample"]["conv"], identity))
    return jax.nn.relu(out + identity)


def _attention_pool(p: Params, x: jnp.ndarray, heads: int) -> jnp.ndarray:
    """AttentionPool2d: mean token queries all positions (+pos embed)."""
    B, H, W, C = x.shape
    x = x.reshape(B, H * W, C)
    x = jnp.concatenate([x.mean(axis=1, keepdims=True), x], axis=1)
    x = x + p["positional_embedding"][None]
    T = x.shape[1]
    hd = C // heads
    q = _linear(p["q_proj"], x[:, :1])
    k = _linear(p["k_proj"], x)
    v = _linear(p["v_proj"], x)
    q = q.reshape(B, 1, heads, hd).transpose(0, 2, 1, 3)
    k = k.reshape(B, T, heads, hd).transpose(0, 2, 1, 3)
    v = v.reshape(B, T, heads, hd).transpose(0, 2, 1, 3)
    scores = jnp.einsum("bhtd,bhsd->bhts", q, k,
                        preferred_element_type=jnp.float32) * (hd ** -0.5)
    probs = jax.nn.softmax(scores.astype(jnp.float32), axis=-1).astype(x.dtype)
    out = jnp.einsum("bhts,bhsd->bhtd", probs, v,
                     preferred_element_type=jnp.float32)
    out = out.transpose(0, 2, 1, 3).reshape(B, 1, C).astype(x.dtype)
    return _linear(p["c_proj"], out)[:, 0]


def encode_image_resnet(params: Params, cfg: CLIPResNetConfig,
                        images: jnp.ndarray) -> jnp.ndarray:
    x = images
    for i in (1, 2, 3):
        x = jax.nn.relu(_bn(params[f"bn{i}"],
                            _conv(params[f"conv{i}"], x,
                                  stride=2 if i == 1 else 1)))
    x = _avg_pool(x, 2)
    for stage in range(4):
        blocks = params[f"layer{stage + 1}"]
        stride = 1 if stage == 0 else 2
        for j, blk in enumerate(blocks):
            x = _bottleneck(blk, x, stride if j == 0 else 1)
    return _attention_pool(params["attnpool"], x, cfg.heads)


def encode_image(params: Params, cfg: CLIPConfig,
                 images: jnp.ndarray) -> jnp.ndarray:
    if cfg.is_resnet:
        return encode_image_resnet(params["visual"], cfg.vision, images)
    return encode_image_vit(params["visual"], cfg.vision, images)


# ---------------------------------------------------------------------------
# Weight conversion from an OpenAI CLIP checkpoint state_dict
# ---------------------------------------------------------------------------


def _np_(t):
    if hasattr(t, "detach"):
        t = t.detach().cpu().float().numpy()
    return np.asarray(t)


def _lin(sd, name, dtype, transpose=True):
    w = jnp.asarray(_np_(sd[f"{name}.weight"]), dtype=dtype)
    p = {"w": w.T if transpose else w}
    b = sd.get(f"{name}.bias")
    p["b"] = jnp.asarray(_np_(b), dtype=dtype) if b is not None else None
    return p


def _ln(sd, name, dtype):
    return {"scale": jnp.asarray(_np_(sd[f"{name}.weight"]), dtype=dtype),
            "bias": jnp.asarray(_np_(sd[f"{name}.bias"]), dtype=dtype)}


def _bn_params(sd, name, dtype):
    return {"scale": jnp.asarray(_np_(sd[f"{name}.weight"]), dtype=dtype),
            "bias": jnp.asarray(_np_(sd[f"{name}.bias"]), dtype=dtype),
            "mean": jnp.asarray(_np_(sd[f"{name}.running_mean"]), dtype=dtype),
            "var": jnp.asarray(_np_(sd[f"{name}.running_var"]), dtype=dtype)}


def _conv_w(sd, name, dtype):
    # torch OIHW -> HWIO
    return jnp.asarray(_np_(sd[f"{name}.weight"]).transpose(2, 3, 1, 0),
                       dtype=dtype)


def _resblock_from_sd(sd, base, dtype):
    in_w = jnp.asarray(_np_(sd[f"{base}.attn.in_proj_weight"]), dtype=dtype)
    in_b = jnp.asarray(_np_(sd[f"{base}.attn.in_proj_bias"]), dtype=dtype)
    return {
        "ln_1": _ln(sd, f"{base}.ln_1", dtype),
        "attn": {"in_proj": {"w": in_w.T, "b": in_b},
                 "out_proj": _lin(sd, f"{base}.attn.out_proj", dtype)},
        "ln_2": _ln(sd, f"{base}.ln_2", dtype),
        "mlp": {"c_fc": _lin(sd, f"{base}.mlp.c_fc", dtype),
                "c_proj": _lin(sd, f"{base}.mlp.c_proj", dtype)},
    }


def _stack(trees):
    return jax.tree.map(lambda *xs: jnp.stack(xs), *trees)


def params_from_openai_state_dict(sd: Dict[str, Any], cfg: CLIPConfig,
                                  dtype=jnp.float32) -> Params:
    """Convert an OpenAI CLIP state_dict (torch tensors or numpy) to our
    pytree. Accepts the raw `model.state_dict()` of the jit=False model."""
    text = {
        "token_embedding": jnp.asarray(_np_(sd["token_embedding.weight"]),
                                       dtype=dtype),
        "positional_embedding": jnp.asarray(_np_(sd["positional_embedding"]),
                                            dtype=dtype),
        "resblocks": _stack([
            _resblock_from_sd(sd, f"transformer.resblocks.{i}", dtype)
            for i in range(cfg.text.layers)]),
        "ln_final": _ln(sd, "ln_final", dtype),
        "text_projection": jnp.asarray(_np_(sd["text_projection"]), dtype=dtype),
    }
    if cfg.is_resnet:
        v: Params = {}
        for i in (1, 2, 3):
            v[f"conv{i}"] = _conv_w(sd, f"visual.conv{i}", dtype)
            v[f"bn{i}"] = _bn_params(sd, f"visual.bn{i}", dtype)
        for stage in range(4):
            blocks = []
            j = 0
            while f"visual.layer{stage + 1}.{j}.conv1.weight" in sd:
                base = f"visual.layer{stage + 1}.{j}"
                blk = {
                    "conv1": _conv_w(sd, f"{base}.conv1", dtype),
                    "bn1": _bn_params(sd, f"{base}.bn1", dtype),
                    "conv2": _conv_w(sd, f"{base}.conv2", dtype),
                    "bn2": _bn_params(sd, f"{base}.bn2", dtype),
                    "conv3": _conv_w(sd, f"{base}.conv3", dtype),
                    "bn3": _bn_params(sd, f"{base}.bn3", dtype),
                }
                if f"{base}.downsample.1.weight" in sd:
                    # downsample = Sequential(AvgPool2d, Conv2d, BatchNorm2d)
                    blk["downsample"] = {
                        "conv": _conv_w(sd, f"{base}.downsample.1", dtype),
                        "bn": _bn_params(sd, f"{base}.downsample.2", dtype),
                    }
                blocks.append(blk)
                j += 1
            v[f"layer{stage + 1}"] = blocks
        v["attnpool"] = {
            "positional_embedding": jnp.asarray(
                _np_(sd["visual.attnpool.positional_embedding"]), dtype=dtype),
            "q_proj": _lin(sd, "visual.attnpool.q_proj", dtype),
            "k_proj": _lin(sd, "visual.attnpool.k_proj", dtype),
            "v_proj": _lin(sd, "visual.attnpool.v_proj", dtype),
            "c_proj": _lin(sd, "visual.attnpool.c_proj", dtype),
        }
    else:
        v = {
            "conv1": _conv_w(sd, "visual.conv1", dtype),
            "class_embedding": jnp.asarray(_np_(sd["visual.class_embedding"]),
                                           dtype=dtype),
            "positional_embedding": jnp.asarray(
                _np_(sd["visual.positional_embedding"]), dtype=dtype),
            "ln_pre": _ln(sd, "visual.ln_pre", dtype),
            "resblocks": _stack([
                _resblock_from_sd(sd, f"visual.transformer.resblocks.{i}", dtype)
                for i in range(cfg.vision.layers)]),
            "ln_post": _ln(sd, "visual.ln_post", dtype),
            "proj": jnp.asarray(_np_(sd["visual.proj"]), dtype=dtype),
        }
    return {"text": text, "visual": v}


def config_from_openai_state_dict(sd, name: str = "custom") -> CLIPConfig:
    """Infer the architecture from checkpoint shapes — the same rules as
    OpenAI's `clip.model.build_model` (the reference loads checkpoints
    through `clip.load`, which never takes an explicit config). Besides
    matching the reference's loading contract for the four zoo backbones,
    this lets arbitrary-size checkpoints (e.g. the tiny synthetic one
    `scripts/zoo_parity.sh --dry-run` fabricates) flow through the real
    `--clip_checkpoint` code path."""
    def shape(k):
        return tuple(sd[k].shape)

    def n_blocks(prefix):
        # block index = the path segment right after `prefix`
        seg = prefix.count(".") + 1
        return len({k.split(".")[seg] for k in sd
                    if k.startswith(prefix + ".")})

    embed_dim = shape("text_projection")[1]
    text = CLIPTextConfig(
        vocab_size=shape("token_embedding.weight")[0],
        context_length=shape("positional_embedding")[0],
        width=shape("ln_final.weight")[0],
        heads=shape("ln_final.weight")[0] // 64,
        layers=n_blocks("transformer.resblocks"),
        embed_dim=embed_dim)
    if "visual.proj" in sd:  # ViT tower
        patch = shape("visual.conv1.weight")[-1]
        grid = int(round((shape("visual.positional_embedding")[0] - 1)
                         ** 0.5))
        vision = CLIPViTConfig(
            image_resolution=patch * grid, patch_size=patch,
            width=shape("visual.conv1.weight")[0],
            layers=n_blocks("visual.transformer.resblocks"),
            heads=shape("visual.conv1.weight")[0] // 64,
            embed_dim=embed_dim)
    else:  # modified-ResNet tower
        layers = tuple(
            len({k.split(".")[2] for k in sd
                 if k.startswith(f"visual.layer{b}.")}) for b in (1, 2, 3, 4))
        out_hw = int(round((shape("visual.attnpool.positional_embedding")[0]
                            - 1) ** 0.5))
        vision = CLIPResNetConfig(
            layers=layers, width=shape("visual.layer1.0.conv1.weight")[0],
            image_resolution=out_hw * 32, embed_dim=embed_dim)
    return CLIPConfig(name, text, vision)


def load_openai_checkpoint(path: str, model_name: Optional[str] = None,
                           dtype=jnp.float32) -> Tuple[Params, CLIPConfig]:
    """Load an OpenAI CLIP `.pt` checkpoint (torchscript archive or plain
    state_dict) and convert. The architecture is inferred from the
    checkpoint itself (like the reference's `clip.load`); `model_name`
    only labels the config — for the four zoo backbones the inferred
    config equals the MODEL_CONFIGS entry of the same name."""
    import torch
    try:
        model = torch.jit.load(path, map_location="cpu")
        sd = model.state_dict()
    except Exception:
        sd = torch.load(path, map_location="cpu")
        if hasattr(sd, "state_dict"):
            sd = sd.state_dict()
    cfg = config_from_openai_state_dict(sd, model_name or "custom")
    if model_name in MODEL_CONFIGS and cfg != MODEL_CONFIGS[model_name]:
        raise ValueError(
            f"checkpoint architecture {cfg} does not match the requested "
            f"{model_name}; pass the right --is_rn / model name")
    return params_from_openai_state_dict(sd, cfg, dtype), cfg


def params_to_openai_state_dict(params: Params, cfg: CLIPConfig) -> Dict[str, Any]:
    """Inverse of `params_from_openai_state_dict`: emit an OpenAI-layout
    CLIP state_dict (numpy values, torch shape/transpose conventions).

    Round-trips with the loader — used to fabricate valid tiny checkpoints
    for `scripts/zoo_parity.sh --dry-run` and to write back edited weights
    in the reference's on-disk format.
    """
    out: Dict[str, Any] = {}

    def put_lin(name, p, transpose=True):
        w = np.asarray(p["w"])
        out[f"{name}.weight"] = w.T if transpose else w
        if p.get("b") is not None:
            out[f"{name}.bias"] = np.asarray(p["b"])

    def put_ln(name, p):
        out[f"{name}.weight"] = np.asarray(p["scale"])
        out[f"{name}.bias"] = np.asarray(p["bias"])

    def put_bn(name, p):
        out[f"{name}.weight"] = np.asarray(p["scale"])
        out[f"{name}.bias"] = np.asarray(p["bias"])
        out[f"{name}.running_mean"] = np.asarray(p["mean"])
        out[f"{name}.running_var"] = np.asarray(p["var"])

    def put_conv(name, w):
        # HWIO -> torch OIHW
        out[f"{name}.weight"] = np.asarray(w).transpose(3, 2, 0, 1)

    def put_resblocks(base, stacked, n):
        for i in range(n):
            blk = jax.tree.map(lambda a: a[i], stacked)
            b = f"{base}.{i}"
            put_ln(f"{b}.ln_1", blk["ln_1"])
            out[f"{b}.attn.in_proj_weight"] = np.asarray(
                blk["attn"]["in_proj"]["w"]).T
            out[f"{b}.attn.in_proj_bias"] = np.asarray(
                blk["attn"]["in_proj"]["b"])
            put_lin(f"{b}.attn.out_proj", blk["attn"]["out_proj"])
            put_ln(f"{b}.ln_2", blk["ln_2"])
            put_lin(f"{b}.mlp.c_fc", blk["mlp"]["c_fc"])
            put_lin(f"{b}.mlp.c_proj", blk["mlp"]["c_proj"])

    t = params["text"]
    out["token_embedding.weight"] = np.asarray(t["token_embedding"])
    out["positional_embedding"] = np.asarray(t["positional_embedding"])
    put_resblocks("transformer.resblocks", t["resblocks"], cfg.text.layers)
    put_ln("ln_final", t["ln_final"])
    out["text_projection"] = np.asarray(t["text_projection"])

    v = params["visual"]
    if cfg.is_resnet:
        for i in (1, 2, 3):
            put_conv(f"visual.conv{i}", v[f"conv{i}"])
            put_bn(f"visual.bn{i}", v[f"bn{i}"])
        for stage in range(4):
            for j, blk in enumerate(v[f"layer{stage + 1}"]):
                b = f"visual.layer{stage + 1}.{j}"
                for c in (1, 2, 3):
                    put_conv(f"{b}.conv{c}", blk[f"conv{c}"])
                    put_bn(f"{b}.bn{c}", blk[f"bn{c}"])
                if "downsample" in blk:
                    put_conv(f"{b}.downsample.1", blk["downsample"]["conv"])
                    put_bn(f"{b}.downsample.2", blk["downsample"]["bn"])
        out["visual.attnpool.positional_embedding"] = np.asarray(
            v["attnpool"]["positional_embedding"])
        for n in ("q_proj", "k_proj", "v_proj", "c_proj"):
            put_lin(f"visual.attnpool.{n}", v["attnpool"][n])
    else:
        put_conv("visual.conv1", v["conv1"])
        out["visual.class_embedding"] = np.asarray(v["class_embedding"])
        out["visual.positional_embedding"] = np.asarray(
            v["positional_embedding"])
        put_ln("visual.ln_pre", v["ln_pre"])
        put_resblocks("visual.transformer.resblocks", v["resblocks"],
                      cfg.vision.layers)
        put_ln("visual.ln_post", v["ln_post"])
        out["visual.proj"] = np.asarray(v["proj"])
    return out


# ---------------------------------------------------------------------------
# Random init (tests only — tiny configs)
# ---------------------------------------------------------------------------


def init_text_params(key, cfg: CLIPTextConfig, dtype=jnp.float32) -> Params:
    ks = jax.random.split(key, 4 + cfg.layers)
    W = cfg.width

    def lin(k, i, o, scale=0.02):
        kw, kb = jax.random.split(k)
        return {"w": jax.random.normal(kw, (i, o), dtype) * scale,
                "b": jnp.zeros((o,), dtype)}

    blocks = []
    for li in range(cfg.layers):
        k1, k2, k3, k4 = jax.random.split(ks[4 + li], 4)
        blocks.append({
            "ln_1": {"scale": jnp.ones((W,), dtype), "bias": jnp.zeros((W,), dtype)},
            "attn": {"in_proj": lin(k1, W, 3 * W), "out_proj": lin(k2, W, W)},
            "ln_2": {"scale": jnp.ones((W,), dtype), "bias": jnp.zeros((W,), dtype)},
            "mlp": {"c_fc": lin(k3, W, 4 * W), "c_proj": lin(k4, 4 * W, W)},
        })
    return {
        "token_embedding": jax.random.normal(ks[0], (cfg.vocab_size, W), dtype) * 0.02,
        "positional_embedding": jax.random.normal(ks[1], (cfg.context_length, W), dtype) * 0.01,
        "resblocks": _stack(blocks),
        "ln_final": {"scale": jnp.ones((W,), dtype), "bias": jnp.zeros((W,), dtype)},
        "text_projection": jax.random.normal(ks[2], (W, cfg.embed_dim), dtype) * 0.02,
    }


def _init_resblocks(key, n_layers, W, dtype):
    def lin(k, i, o, scale=0.02):
        kw, _ = jax.random.split(k)
        return {"w": jax.random.normal(kw, (i, o), dtype) * scale,
                "b": jnp.zeros((o,), dtype)}

    blocks = []
    for li in range(n_layers):
        k1, k2, k3, k4 = jax.random.split(jax.random.fold_in(key, li), 4)
        blocks.append({
            "ln_1": {"scale": jnp.ones((W,), dtype),
                     "bias": jnp.zeros((W,), dtype)},
            "attn": {"in_proj": lin(k1, W, 3 * W),
                     "out_proj": lin(k2, W, W)},
            "ln_2": {"scale": jnp.ones((W,), dtype),
                     "bias": jnp.zeros((W,), dtype)},
            "mlp": {"c_fc": lin(k3, W, 4 * W),
                    "c_proj": lin(k4, 4 * W, W)},
        })
    return _stack(blocks)


def init_vit_params(key, cfg: CLIPViTConfig, dtype=jnp.float32) -> Params:
    """Random ViT image-tower params (tests/benchmarks; real weights come
    from `params_from_openai_state_dict`)."""
    ks = jax.random.split(key, 5)
    W = cfg.width
    n_pos = (cfg.image_resolution // cfg.patch_size) ** 2 + 1
    return {
        "conv1": jax.random.normal(
            ks[0], (cfg.patch_size, cfg.patch_size, 3, W), dtype) * 0.02,
        "class_embedding": jax.random.normal(ks[1], (W,), dtype) * 0.02,
        "positional_embedding": jax.random.normal(
            ks[2], (n_pos, W), dtype) * 0.01,
        "ln_pre": {"scale": jnp.ones((W,), dtype),
                   "bias": jnp.zeros((W,), dtype)},
        "resblocks": _init_resblocks(ks[3], cfg.layers, W, dtype),
        "ln_post": {"scale": jnp.ones((W,), dtype),
                    "bias": jnp.zeros((W,), dtype)},
        "proj": jax.random.normal(ks[4], (W, cfg.embed_dim), dtype) * 0.02,
    }


def init_resnet_params(key, cfg: CLIPResNetConfig,
                       dtype=jnp.float32) -> Params:
    """Random modified-ResNet image-tower params (OpenAI CLIP topology:
    3-conv stem, anti-aliased bottlenecks, attention pool)."""
    def bn(c):
        return {"scale": jnp.ones((c,), dtype),
                "bias": jnp.zeros((c,), dtype),
                "mean": jnp.zeros((c,), dtype),
                "var": jnp.ones((c,), dtype)}

    def conv(k, kh, kw, ci, co):
        fan = kh * kw * ci
        return jax.random.normal(k, (kh, kw, ci, co), dtype) * fan ** -0.5

    def lin(k, i, o):
        return {"w": jax.random.normal(k, (i, o), dtype) * i ** -0.5,
                "b": jnp.zeros((o,), dtype)}

    W = cfg.width
    p: Params = {
        "conv1": conv(jax.random.fold_in(key, 0), 3, 3, 3, W // 2),
        "bn1": bn(W // 2),
        "conv2": conv(jax.random.fold_in(key, 1), 3, 3, W // 2, W // 2),
        "bn2": bn(W // 2),
        "conv3": conv(jax.random.fold_in(key, 2), 3, 3, W // 2, W),
        "bn3": bn(W),
    }
    inplanes = W
    for stage, n_blocks in enumerate(cfg.layers):
        planes = W * 2 ** stage
        blocks = []
        for j in range(n_blocks):
            # nested fold_in: a flat `10*stage + j` scheme collides when
            # a stage has more than 10 blocks (e.g. RN50x16's 18)
            k = jax.random.fold_in(jax.random.fold_in(key, 10 + stage), j)
            blk = {
                "conv1": conv(jax.random.fold_in(k, 0), 1, 1, inplanes,
                              planes),
                "bn1": bn(planes),
                "conv2": conv(jax.random.fold_in(k, 1), 3, 3, planes,
                              planes),
                "bn2": bn(planes),
                "conv3": conv(jax.random.fold_in(k, 2), 1, 1, planes,
                              planes * 4),
                "bn3": bn(planes * 4),
            }
            if j == 0:
                blk["downsample"] = {
                    "conv": conv(jax.random.fold_in(k, 3), 1, 1, inplanes,
                                 planes * 4),
                    "bn": bn(planes * 4),
                }
                inplanes = planes * 4
            blocks.append(blk)
        p[f"layer{stage + 1}"] = blocks
    C = W * 32
    n_pos = (cfg.image_resolution // 32) ** 2 + 1
    kp = jax.random.fold_in(key, 99)
    p["attnpool"] = {
        "positional_embedding": jax.random.normal(
            jax.random.fold_in(kp, 0), (n_pos, C), dtype) * C ** -0.5,
        "q_proj": lin(jax.random.fold_in(kp, 1), C, C),
        "k_proj": lin(jax.random.fold_in(kp, 2), C, C),
        "v_proj": lin(jax.random.fold_in(kp, 3), C, C),
        "c_proj": lin(jax.random.fold_in(kp, 4), C, cfg.embed_dim),
    }
    return p
