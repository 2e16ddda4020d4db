"""Statistical unit tests for noise injection (SURVEY.md §7 step 2)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from capdec_tpu.ops import noise


def test_zero_variance_is_passthrough():
    x = jnp.asarray(np.random.RandomState(0).randn(4, 8).astype(np.float32)) * 3
    out = noise.noise_injection(jax.random.PRNGKey(0), x, variance=0.0)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(x))


def test_output_is_unit_norm():
    x = jnp.asarray(np.random.RandomState(1).randn(16, 64).astype(np.float32))
    out = noise.noise_injection(jax.random.PRNGKey(1), x, variance=0.016)
    norms = np.linalg.norm(np.asarray(out), axis=1)
    np.testing.assert_allclose(norms, 1.0, atol=1e-5)


def test_gaussian_noise_statistics():
    """Pre-renorm displacement ~ N(0, sqrt(var)) per coordinate."""
    var = 0.016
    x = jnp.zeros((4096, 64)) + jnp.asarray([1.0] + [0.0] * 63)
    key = jax.random.PRNGKey(2)
    # Reconstruct the internal displacement: normalize(x) + eps, then renorm.
    normalized = noise.l2_normalize(x, axis=1)
    eps = jax.random.normal(key, x.shape) * np.sqrt(var)
    manual = noise.l2_normalize(normalized + eps, axis=1)
    out = noise.noise_injection(key, x, variance=var)
    np.testing.assert_allclose(np.asarray(out), np.asarray(manual), atol=1e-6)
    assert abs(np.std(np.asarray(eps)) - np.sqrt(var)) < 1e-3


def test_uniform_ball_radius_bound():
    radius = 0.3
    samples = noise.uniform_ball_noise(jax.random.PRNGKey(3), (8192, 16), radius)
    norms = np.linalg.norm(np.asarray(samples), axis=1)
    assert norms.max() <= radius + 1e-6
    # U^(1/d) scaling => expected norm = r * d/(d+1)
    expected = radius * 16 / 17
    assert abs(norms.mean() - expected) < 0.01


def test_modality_offset_applied_before_final_norm():
    x = jnp.asarray(np.random.RandomState(2).randn(8, 32).astype(np.float32))
    offset = jnp.ones((1, 32)) * 0.5
    key = jax.random.PRNGKey(4)
    with_off = noise.noise_injection(key, x, variance=0.016,
                                     modality_offset=offset)
    without = noise.noise_injection(key, x, variance=0.016)
    assert not np.allclose(np.asarray(with_off), np.asarray(without))
    np.testing.assert_allclose(np.linalg.norm(np.asarray(with_off), axis=1),
                               1.0, atol=1e-5)


def test_dont_norm_skips_first_normalization():
    x = jnp.asarray(np.random.RandomState(3).randn(8, 32).astype(np.float32)) * 5
    key = jax.random.PRNGKey(5)
    eps = jax.random.normal(key, x.shape) * np.sqrt(0.1)
    manual = noise.l2_normalize(x + eps, axis=1)
    out = noise.noise_injection(key, x, variance=0.1, dont_norm=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(manual), atol=1e-6)


def test_torch_parity_of_loss_semantics():
    """CE(ignore_index=0) parity of caption_model.loss_fn vs torch."""
    torch = pytest.importorskip("torch")
    from capdec_tpu.models import caption_model

    rng = np.random.RandomState(7)
    B, K, T, V = 3, 4, 6, 11
    logits = rng.randn(B, K + T, V).astype(np.float32)
    tokens = rng.randint(0, V, size=(B, T))
    tokens[0, -2:] = 0

    got = float(caption_model.loss_fn(jnp.asarray(logits), jnp.asarray(tokens), K))
    sl = torch.tensor(logits[:, K - 1:-1])
    ref = torch.nn.functional.cross_entropy(
        sl.reshape(-1, V), torch.tensor(tokens).flatten(), ignore_index=0)
    assert abs(got - float(ref)) < 1e-5
