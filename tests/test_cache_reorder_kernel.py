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
