"""Noise injection — the core CapDec trick, as pure functions of a PRNG key.

Simulates the CLIP image/text modality gap during text-only training by
perturbing the caption's CLIP embedding (reference train.py:18-39):
L2-normalize, add Gaussian noise of std sqrt(variance) (or uniform-ball
noise of radius sqrt(variance)), optionally add a precomputed modality
offset, and re-normalize.

Unlike the reference (implicit global torch RNG), noise here is a pure
function of an explicit PRNG key, so a jitted train step folds fresh noise
in per step with zero host round-trips and reproducible statistics.
"""
from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp

# torch.nn.functional.normalize clamps the denominator at eps=1e-12.
_NORM_EPS = 1e-12


def l2_normalize(x: jnp.ndarray, axis: int = -1) -> jnp.ndarray:
    norm = jnp.linalg.norm(x, axis=axis, keepdims=True)
    return x / jnp.maximum(norm, _NORM_EPS)


def uniform_ball_noise(key: jax.Array, shape, radius: float = 0.1) -> jnp.ndarray:
    """Uniform sample inside an L2 ball of `radius` (train.py:18-24).

    Direction = normalized Gaussian; radius scaled by U^(1/dim) so the
    density is uniform over the ball's volume.
    """
    k_dir, k_rad = jax.random.split(key)
    direction = l2_normalize(jax.random.normal(k_dir, shape), axis=1)
    u = jax.random.uniform(k_rad, (shape[0],)) ** (1.0 / shape[1])
    return direction * (u * radius)[:, None]


def noise_injection(key: jax.Array, x: jnp.ndarray, variance: float = 0.001,
                    modality_offset: Optional[jnp.ndarray] = None,
                    uniform_noise: bool = False,
                    dont_norm: bool = False) -> jnp.ndarray:
    """Reference-parity noise injection (train.py:27-39).

    `variance` is a static Python float: variance == 0.0 is an exact
    passthrough (no normalization), matching the reference early-return.
    """
    if variance == 0.0:
        return x
    std = math.sqrt(variance)
    if not dont_norm:
        x = l2_normalize(x, axis=1)
    if uniform_noise:
        x = x + uniform_ball_noise(key, x.shape, radius=std)
    else:
        x = x + jax.random.normal(key, x.shape, dtype=x.dtype) * std
    if modality_offset is not None:
        x = x + modality_offset
    return l2_normalize(x, axis=1)
