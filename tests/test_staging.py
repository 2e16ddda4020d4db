"""Staged-growth helper invariants (decode/staging.py) — shared by the
beam and greedy engines, so the bucket contract is pinned here once."""
import numpy as np

import jax.numpy as jnp

from capdec_tpu.decode import staging


def test_bucket_invariants():
    for e_pad in (8, 16, 24, 72, 80, 96):
        for stages in (1, 2, 4, 8, 16):
            bks = staging.stage_buckets(e_pad, stages, align=8)
            assert bks[-1] == e_pad, (e_pad, stages, bks)
            assert all(b % 8 == 0 for b in bks)
            assert bks == sorted(set(bks))
            assert all(b > 0 for b in bks)
            assert len(bks) <= max(1, stages)


def test_grow_cache_copies_or_skips():
    small = {"k": jnp.arange(2 * 2 * 4 * 3, dtype=jnp.float32
                             ).reshape(2, 2, 4, 3),
             "ks": jnp.arange(2 * 2 * 1 * 4, dtype=jnp.float32
                              ).reshape(2, 2, 1, 4)}
    big = {"k": jnp.zeros((2, 2, 8, 3)), "ks": jnp.zeros((2, 2, 1, 8))}
    grown = staging.grow_cache(small, big, jnp.asarray(False))
    np.testing.assert_array_equal(np.asarray(grown["k"])[:, :, :4],
                                  np.asarray(small["k"]))
    np.testing.assert_array_equal(np.asarray(grown["k"])[:, :, 4:], 0.0)
    np.testing.assert_array_equal(np.asarray(grown["ks"])[..., :4],
                                  np.asarray(small["ks"]))
    skipped = staging.grow_cache(small, big, jnp.asarray(True))
    np.testing.assert_array_equal(np.asarray(skipped["k"]), 0.0)
