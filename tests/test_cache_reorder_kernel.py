"""Pallas cache-reorder kernel vs jnp.take (interpret mode on CPU)."""
import numpy as np

import jax.numpy as jnp

from capdec_tpu.ops.cache_reorder import reorder_cache_rows


def test_reorder_matches_take():
    rng = np.random.RandomState(0)
    L, B, E, D = 2, 10, 8, 256
    k = rng.randn(L, B, E, D).astype(np.float32)
    v = rng.randn(L, B, E, D).astype(np.float32)
    src = np.asarray([3, 3, 0, 9, 1, 5, 5, 5, 2, 0], np.int32)
    out = reorder_cache_rows(jnp.asarray(k), jnp.asarray(v),
                             jnp.asarray(src), interpret=True)
    np.testing.assert_array_equal(np.asarray(out["k"]), k[:, src])
    np.testing.assert_array_equal(np.asarray(out["v"]), v[:, src])


def test_bounded_reorder_matches_take_on_valid_slots():
    from capdec_tpu.ops.cache_reorder import reorder_cache_rows_bounded
    rng = np.random.RandomState(1)
    L, B, E, D = 2, 10, 40, 256
    k = rng.randn(L, B, E, D).astype(np.float32)
    v = rng.randn(L, B, E, D).astype(np.float32)
    src = np.asarray([3, 3, 0, 9, 1, 5, 5, 5, 2, 0], np.int32)
    for count in (1, 16, 17, 33, 40):
        out = reorder_cache_rows_bounded(
            jnp.asarray(k), jnp.asarray(v), jnp.asarray(src),
            jnp.asarray(count, jnp.int32), chunk=16, interpret=True)
        np.testing.assert_array_equal(np.asarray(out["k"])[:, :, :count],
                                      k[:, src][:, :, :count], f"count={count}")
        np.testing.assert_array_equal(np.asarray(out["v"])[:, :, :count],
                                      v[:, src][:, :, :count])
