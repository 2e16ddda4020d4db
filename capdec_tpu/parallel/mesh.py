"""Device mesh construction and sharding rules.

The reference is strictly single-GPU (`cuda:0` hardcoded, reference
train.py:15; no torch.distributed anywhere — SURVEY.md §2). Scaling here is
TPU-native: a `jax.sharding.Mesh` over the slice with two axes,

    dp — data parallel: the global batch is sharded over ICI; XLA inserts
         the gradient all-reduce automatically from sharding annotations.
    tp — tensor parallel (Megatron-style): attention heads and MLP hidden
         width of every stacked GPT-2 block are sharded; XLA inserts the
         per-block collectives. GPT-2 base (124M) fits one chip, so tp=1 is
         the common case, but the mesh API is general.

Pipeline, sequence/context, and expert parallelism are intentionally not
implemented: sequences are ≤ ~110 tokens and there is no MoE — see
SURVEY.md §2's parallelism checklist. The mesh is shaped so adding axes
later is additive.
"""
from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DP_AXIS = "dp"
TP_AXIS = "tp"


def make_mesh(dp: Optional[int] = None, tp: int = 1,
              devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if dp is None:
        dp = n // tp
    if dp * tp != n:
        raise ValueError(f"dp*tp={dp * tp} != device count {n}")
    arr = np.asarray(devices).reshape(dp, tp)
    return Mesh(arr, (DP_AXIS, TP_AXIS))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Batch arrays are sharded over dp on their leading axis."""
    return NamedSharding(mesh, P(DP_AXIS))


def stacked_batch_sharding(mesh: Mesh) -> NamedSharding:
    """[K, batch, ...] stacks (multi-step dispatch): dp shards axis 1."""
    return NamedSharding(mesh, P(None, DP_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def gpt2_param_specs() -> Dict[str, Any]:
    """PartitionSpecs for the stacked GPT-2 params pytree ([L, ...] arrays).

    Megatron-style TP: fused QKV and MLP fc shard their output (head/hidden)
    dim; the following projections shard their input dim, so each block
    needs one all-reduce per sublayer which XLA derives from the specs.
    Embeddings, layernorms, and biases of the residual stream replicate.
    """
    return {
        "wte": P(),
        "wpe": P(),
        "ln_f": {"scale": P(), "bias": P()},
        "blocks": {
            "ln_1": {"scale": P(), "bias": P()},
            "ln_2": {"scale": P(), "bias": P()},
            "attn": {
                "c_attn_w": P(None, None, TP_AXIS),
                "c_attn_b": P(None, TP_AXIS),
                "c_proj_w": P(None, TP_AXIS, None),
                "c_proj_b": P(),
            },
            "mlp": {
                "c_fc_w": P(None, None, TP_AXIS),
                "c_fc_b": P(None, TP_AXIS),
                "c_proj_w": P(None, TP_AXIS, None),
                "c_proj_b": P(),
            },
        },
    }


def mapper_param_specs(params: Any) -> Any:
    """Mapper params are small (≤ ~70M for the MLP variant) — replicate,
    except the big MLP matrices which shard their wide dim over tp."""

    def spec_for(path, leaf):
        if leaf.ndim >= 2 and leaf.shape[-1] >= 4096:
            return P(*([None] * (leaf.ndim - 1) + [TP_AXIS]))
        return P()

    return jax.tree_util.tree_map_with_path(spec_for, params)


def caption_model_param_specs(params: Any) -> Any:
    """Specs for the full caption-model pytree {gpt, clip_project}."""
    return {
        "gpt": gpt2_param_specs(),
        "clip_project": mapper_param_specs(params["clip_project"]),
    }


def shard_params(params: Any, mesh: Mesh, specs: Any) -> Any:
    def place(p, s):
        return jax.device_put(p, NamedSharding(mesh, s))

    return jax.tree.map(place, params, specs,
                        is_leaf=lambda x: isinstance(x, P))


def sharding_tree(mesh: Mesh, specs: Any) -> Any:
    return jax.tree.map(lambda s: NamedSharding(mesh, s), specs,
                        is_leaf=lambda x: isinstance(x, P))
