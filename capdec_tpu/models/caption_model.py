"""The CapDec caption model: mapper prefix + GPT-2 prefix-LM, in one place.

The reference split this across two drifted stacks (train.py:246-284 vs
gpt2_prefix.py:139-186, see SURVEY.md §1); here there is ONE definition
used by both training and inference, with converters that accept either
stack's checkpoints (their state_dict key structure is identical).

Forward contract (reference train.py:251-260):
    embedding_cat = concat(mapper(prefix_clip) -> [B,K,768],
                           wte(tokens)        -> [B,T,768])
    logits = gpt2(inputs_embeds=embedding_cat, attention_mask=mask)

Loss contract (train.py:349-350): cross-entropy of logits[:, K-1:-1]
against `tokens` with ignore_index=0 (padded positions hold token 0).
"""
from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp

from . import gpt2
from . import mappers

Params = Dict[str, Any]


@dataclasses.dataclass(frozen=True)
class CaptionModelConfig:
    prefix_length: int = 40
    clip_length: int = 40
    prefix_size: int = 640           # 640 for RN50x4, 512 for ViT-B/32
    num_layers: int = 8
    mapping_type: str = "transformer"
    only_prefix: bool = False        # freeze GPT-2; train the mapper only
    # Chunked+rematerialized CE (loss_forward): compute the LM-head +
    # cross-entropy in row chunks of this size under jax.checkpoint, so
    # the [B, T, vocab] f32 logits never materialize at once (that buffer
    # is what caps large-batch training throughput — 4.1 GB at bs=512).
    # Backward recomputes each chunk's logits (one extra head matmul —
    # cheap vs the HBM saved). 0 = single-shot. Bit-level: the masked
    # mean is accumulated in f32 either way; values agree to float eps.
    ce_chunk_rows: int = 0
    gpt2: gpt2.GPT2Config = dataclasses.field(default_factory=gpt2.GPT2Config)

    @property
    def mapper(self) -> mappers.MapperConfig:
        return mappers.MapperConfig(
            mapping_type=self.mapping_type,
            dim_clip=self.prefix_size,
            dim_embedding=self.gpt2.n_embd,
            prefix_length=self.prefix_length,
            clip_length=self.clip_length,
            num_layers=self.num_layers,
        )


def init_params(key: jax.Array, cfg: CaptionModelConfig,
                dtype=jnp.float32) -> Params:
    k_gpt, k_map = jax.random.split(key)
    return {
        "gpt": gpt2.init_params(k_gpt, cfg.gpt2, dtype),
        "clip_project": mappers.init_mapper(k_map, cfg.mapper, dtype),
    }


def map_prefix(params: Params, cfg: CaptionModelConfig,
               prefix: jnp.ndarray) -> jnp.ndarray:
    """CLIP embedding [B, prefix_size] → prefix embeddings [B, K, 768]."""
    return mappers.apply_mapper(params["clip_project"], cfg.mapper, prefix)


def forward(params: Params, cfg: CaptionModelConfig, tokens: jnp.ndarray,
            prefix: jnp.ndarray, mask: Optional[jnp.ndarray] = None
            ) -> jnp.ndarray:
    """Training forward: logits [B, K+T, V]."""
    tok_embeds = gpt2.embed_tokens(params["gpt"], tokens)
    prefix_embeds = map_prefix(params, cfg, prefix).astype(tok_embeds.dtype)
    embeds = jnp.concatenate([prefix_embeds, tok_embeds], axis=1)
    return gpt2.forward(params["gpt"], cfg.gpt2, embeds, mask)


def loss_fn(logits: jnp.ndarray, tokens: jnp.ndarray,
            prefix_length: int) -> jnp.ndarray:
    """Masked-mean CE over logits[:, K-1:-1] vs tokens, ignore_index=0."""
    shifted = logits[:, prefix_length - 1:-1]
    logp = jax.nn.log_softmax(shifted.astype(jnp.float32), axis=-1)
    nll = -jnp.take_along_axis(logp, tokens[..., None], axis=-1)[..., 0]
    valid = (tokens != 0).astype(jnp.float32)
    return jnp.sum(nll * valid) / jnp.maximum(jnp.sum(valid), 1.0)


def loss_forward(params: Params, cfg: CaptionModelConfig,
                 tokens: jnp.ndarray, prefix: jnp.ndarray,
                 mask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """forward + loss_fn fused: the LM head runs only over the scored slice.

    `forward` produces logits for all K+T positions, but the loss
    (reference train.py:349-350) scores only the T positions K-1..K+T-2 —
    for K=T=40 half the 50k-wide LM-head matmul (and its backward) is
    discarded. Slicing the final hidden states first halves that matmul
    and avoids materializing the [B, K+T, V] f32 logits. Same math as
    `loss_fn(forward(...))`: the LM head is row-independent and the CE is
    the identical logsumexp-minus-gather form.
    """
    K = cfg.prefix_length
    tok_embeds = gpt2.embed_tokens(params["gpt"], tokens)
    prefix_embeds = map_prefix(params, cfg, prefix).astype(tok_embeds.dtype)
    embeds = jnp.concatenate([prefix_embeds, tok_embeds], axis=1)
    hidden = gpt2.forward_hidden(params["gpt"], cfg.gpt2, embeds, mask)
    scored = hidden[:, K - 1:-1]

    def nll_sums(hid, toks):
        """(sum of masked nll, valid count) for rows hid/toks."""
        logits = gpt2.final_logits(params["gpt"], cfg.gpt2,
                                   hid).astype(jnp.float32)
        # lse-minus-gather CE: same value as log_softmax+gather without
        # materializing a second [B, T, V] f32 buffer for the log-probs.
        lse = jax.nn.logsumexp(logits, axis=-1)
        picked = jnp.take_along_axis(logits, toks[..., None],
                                     axis=-1)[..., 0]
        valid = (toks != 0).astype(jnp.float32)
        return jnp.sum((lse - picked) * valid), jnp.sum(valid)

    B = tokens.shape[0]
    C = cfg.ce_chunk_rows
    if C and B > C:
        # Row-chunked CE under jax.checkpoint: the [B, T, V] logits exist
        # only one chunk at a time (forward AND backward — the chunk's
        # logits are recomputed in the VJP instead of stashed). A batch
        # that doesn't divide by C runs the B//C full chunks through the
        # scan plus ONE ragged tail chunk with its own static shape — the
        # knob is never silently dropped.
        f = jax.checkpoint(nll_sums)

        def body(carry, xs):
            s, v = f(*xs)
            return (carry[0] + s, carry[1] + v), None

        T = tokens.shape[1]
        nfull = B // C
        hid_c = scored[:nfull * C].reshape(nfull, C, T, scored.shape[-1])
        tok_c = tokens[:nfull * C].reshape(nfull, C, T)
        (s, v), _ = jax.lax.scan(body, (jnp.float32(0.0), jnp.float32(0.0)),
                                 (hid_c, tok_c))
        if B % C:
            ts, tv = f(scored[nfull * C:], tokens[nfull * C:])
            s = s + ts
            v = v + tv
    else:
        s, v = nll_sums(scored, tokens)
    return s / jnp.maximum(v, 1.0)


# ---------------------------------------------------------------------------
# torch checkpoint conversion (reference `.pt` state_dicts)
# ---------------------------------------------------------------------------


def params_from_torch_state_dict(sd: Dict[str, Any], cfg: CaptionModelConfig,
                                 dtype=jnp.float32) -> Params:
    """Load a reference CapDec checkpoint (keys `gpt.*` + `clip_project.*`)."""
    return {
        "gpt": gpt2.params_from_torch_state_dict(sd, cfg.gpt2, prefix="gpt.",
                                                 dtype=dtype),
        "clip_project": mappers.mapper_from_torch_state_dict(
            sd, cfg.mapper, prefix="clip_project.", dtype=dtype),
    }


def config_from_torch_state_dict(sd: Dict[str, Any],
                                 compute_dtype: Any = jnp.float32,
                                 **overrides) -> CaptionModelConfig:
    """Infer the full caption-model architecture from checkpoint shapes.

    The reference never stores a config inside its `.pt` — eval hardcodes
    the architecture flags and they must match the checkpoint by convention
    (predictions_runner.py:436-460). Shape inference removes that footgun
    and lets arbitrary-size checkpoints (e.g. the tiny synthetic one
    `scripts/zoo_parity.sh --dry-run` fabricates) flow through the real
    CLI path. `num_heads`/`mlp_ratio` of the mapper stay at the reference's
    fixed 8 / 2.0 (train.py:212, transformer_mapper.py:96) — they are not
    recoverable from fused projection shapes.
    """
    def shape(key):
        return tuple(sd[key].shape)

    gcfg = gpt2.config_from_torch_state_dict(sd, prefix="gpt.",
                                             compute_dtype=compute_dtype)
    d_emb = gcfg.n_embd

    def n_layers(base):
        seg = base.count(".")
        return len({k.split(".")[seg] for k in sd if k.startswith(base)})

    if "clip_project.transformer.layers.0.norm1.weight" in sd:
        mapping_type = "transformer"
        prefix_length = shape("clip_project.prefix_const")[0]
        out_dim, prefix_size = shape("clip_project.linear.weight")
        clip_length = out_dim // d_emb
        num_layers = n_layers("clip_project.transformer.layers.")
    elif "clip_project.ref_encoder.layers.0.norm1.weight" in sd:
        mapping_type = "transformer_decoder"
        prefix_length = shape("clip_project.prefix_const")[0]
        dim_ref = shape("clip_project.ref_encoder.layers.0.norm1.weight")[0]
        if dim_ref != mappers.MapperConfig.enc_dec_dim_ref:
            # MapperConfig cannot represent another encoder width (the
            # reference hardcodes 512 too — model.py TransformerMapperAllFeatures);
            # proceeding would build a config whose params silently mis-load.
            raise ValueError(
                f"transformer_decoder checkpoint has encoder width "
                f"{dim_ref}, but only "
                f"{mappers.MapperConfig.enc_dec_dim_ref} is supported")
        out_dim, prefix_size = shape("clip_project.linear.weight")
        clip_length = out_dim // dim_ref
        num_layers = n_layers("clip_project.ref_encoder.layers.")
    else:
        # Sequential MLP: `model.*` (mlp) or `mlp.model.*` (mapping_network)
        base = ("clip_project.mlp.model."
                if "clip_project.mlp.model.0.weight" in sd
                else "clip_project.model.")
        mapping_type = ("mapping_network" if base.count(".") == 3 else "mlp")
        idx = sorted(int(k[len(base):].split(".")[0]) for k in sd
                     if k.startswith(base) and k.endswith(".weight"))
        prefix_size = shape(f"{base}{idx[0]}.weight")[1]
        prefix_length = shape(f"{base}{idx[-1]}.weight")[0] // d_emb
        clip_length = prefix_length
        num_layers = len(idx)
    cfg = CaptionModelConfig(
        prefix_length=prefix_length, clip_length=clip_length,
        prefix_size=prefix_size, num_layers=num_layers,
        mapping_type=mapping_type, gpt2=gcfg)
    return dataclasses.replace(cfg, **overrides) if overrides else cfg


def params_to_torch_state_dict(params: Params,
                               cfg: CaptionModelConfig) -> Dict[str, Any]:
    out = gpt2.params_to_torch_state_dict(params["gpt"], prefix="gpt.")
    out.update(mappers.mapper_to_torch_state_dict(
        params["clip_project"], cfg.mapper, prefix="clip_project."))
    return out


def trainable_mask(params: Params, cfg: CaptionModelConfig) -> Params:
    """Pytree of booleans: which params receive gradients.

    only_prefix=True mirrors `ClipCaptionPrefix` (train.py:276-284): GPT-2
    is frozen and only the mapper trains.
    """
    return {
        "gpt": jax.tree.map(lambda _: not cfg.only_prefix, params["gpt"]),
        "clip_project": jax.tree.map(lambda _: True, params["clip_project"]),
    }
