"""The jitted train step: noise → forward → CE → AdamW, one XLA program.

The reference does this as ~6 separate torch calls per step with H2D
copies in the loop (train.py:344-354). Here the whole step — including
fresh noise sampling from a folded-in PRNG key — is a single compiled
program with donated buffers; under a mesh, the batch is dp-sharded and
XLA derives the gradient all-reduce over ICI from the sharding
annotations.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Callable, Dict, Optional

import jax
import jax.numpy as jnp
import optax
from jax import lax

from ..models import caption_model
from ..ops import noise as noise_ops


@dataclasses.dataclass(frozen=True)
class NoiseConfig:
    variance: float = 0.0
    uniform_noise: bool = False
    dont_norm: bool = False
    # Optional [1, D] modality offset (train.py:332-334); closed over as a
    # compile-time constant.
    modality_offset: Optional[Any] = None


def _make_step_fn(cfg: caption_model.CaptionModelConfig,
                  tx: optax.GradientTransformation,
                  noise_cfg: NoiseConfig) -> Callable:
    """The un-jitted step body shared by the single- and multi-step APIs."""
    offset = (jnp.asarray(noise_cfg.modality_offset)
              if noise_cfg.modality_offset is not None else None)

    def loss_fn(params, batch, key):
        if cfg.only_prefix:
            # Frozen GPT-2 (reference ClipCaptionPrefix): stop_gradient on
            # the frozen subtree lets XLA elide its weight-gradient matmuls
            # (~1/3 of the step FLOPs). The optimizer mask already zeroes
            # these updates, so results are unchanged.
            mask = caption_model.trainable_mask(params, cfg)
            params = jax.tree.map(
                lambda p, m: p if m else jax.lax.stop_gradient(p),
                params, mask)
        prefix = noise_ops.noise_injection(
            key, batch["prefix"].astype(jnp.float32),
            variance=noise_cfg.variance,
            modality_offset=offset,
            uniform_noise=noise_cfg.uniform_noise,
            dont_norm=noise_cfg.dont_norm)
        # Fused loss path: the LM head runs only over the scored slice
        # (half the 50k-wide matmul at K=T=40); same math as
        # loss_fn(forward(...)).
        return caption_model.loss_forward(params, cfg, batch["tokens"],
                                          prefix, batch["mask"])

    def step_fn(state, batch, key):
        # Fresh per-step noise from one base key — folding happens inside
        # the compiled program (an eager host-side split per step costs a
        # full device dispatch on some backends).
        noise_key = jax.random.fold_in(key, state["step"])
        loss, grads = jax.value_and_grad(loss_fn)(state["params"], batch,
                                                  noise_key)
        updates, opt_state = tx.update(grads, state["opt_state"], state["params"])
        if cfg.only_prefix:
            # Frozen leaves pass through IDENTICALLY (not p + 0): the
            # zero-add would read+write ~500 MB of frozen GPT-2 every
            # step; identity keeps them loop-invariant under the
            # multi-step scan. Results are unchanged (updates are hard
            # zeros for frozen leaves).
            mask = caption_model.trainable_mask(state["params"], cfg)
            params = jax.tree.map(
                lambda p, u, m: optax.apply_updates(p, u) if m else p,
                state["params"], updates, mask)
        else:
            params = optax.apply_updates(state["params"], updates)
        return {"params": params, "opt_state": opt_state,
                "step": state["step"] + 1}, loss

    return step_fn


def make_train_step(cfg: caption_model.CaptionModelConfig,
                    tx: optax.GradientTransformation,
                    noise_cfg: NoiseConfig,
                    donate: bool = True) -> Callable:
    """Returns step(state, batch, key) -> (state, loss). state is a dict
    {params, opt_state, step}; batch is {tokens, mask, prefix}."""
    return jax.jit(_make_step_fn(cfg, tx, noise_cfg),
                   donate_argnums=(0,) if donate else ())


def make_train_multi_step(cfg: caption_model.CaptionModelConfig,
                          tx: optax.GradientTransformation,
                          noise_cfg: NoiseConfig,
                          donate: bool = True) -> Callable:
    """K sequential optimizer steps in ONE compiled program via lax.scan.

    multi(state, batches, key) -> (state, losses [K]) where every leaf of
    `batches` is stacked [K, ...]. Bit-identical to K calls of the single
    step (same per-step noise keys, folded by the running step counter);
    amortizes per-dispatch host/runtime overhead K-fold, which dominates
    the single-step wall time for this model size.
    """
    single = _make_step_fn(cfg, tx, noise_cfg)

    def multi(state, batches, key):
        def body(st, batch):
            st, loss = single(st, batch, key)
            return st, loss

        return lax.scan(body, state, batches)

    return jax.jit(multi, donate_argnums=(0,) if donate else ())


def make_eval_step(cfg: caption_model.CaptionModelConfig) -> Callable:
    """Validation loss — no noise injection (reference train.py:372-389)."""

    @jax.jit
    def eval_fn(params, batch):
        return caption_model.loss_forward(
            params, cfg, batch["tokens"],
            batch["prefix"].astype(jnp.float32), batch["mask"])

    return eval_fn


def init_train_state(params: Any, tx: optax.GradientTransformation) -> Dict:
    return {"params": params, "opt_state": tx.init(params),
            "step": jnp.zeros((), jnp.int32)}
