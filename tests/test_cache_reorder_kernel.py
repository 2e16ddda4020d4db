"""Pallas cache-reorder kernel vs jnp.take (interpret mode on CPU)."""
import numpy as np

import jax.numpy as jnp

from capdec_tpu.ops.cache_reorder import reorder_cache_rows
import pytest


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


def test_write_gen_slot_chunk_matches_dus():
    """Chunked in-place slot write (the production beam slot write on TPU)
    == plain dynamic_update_slice, across chunk boundaries and for
    non-divisible block_rows."""
    from capdec_tpu.ops.cache_reorder import write_gen_slot_chunk
    rng = np.random.RandomState(3)
    B, L, E, D = 10, 3, 48, 256
    k = rng.randn(B, L, E, D).astype(np.float32)
    v = rng.randn(B, L, E, D).astype(np.float32)
    kn = rng.randn(B, L, D).astype(np.float32)
    vn = rng.randn(B, L, D).astype(np.float32)
    for chunk in (8, 16):
        for step in (0, 7, 8, 15, 16, 31, 47):
            out = write_gen_slot_chunk(jnp.asarray(k), jnp.asarray(v),
                                       jnp.asarray(kn), jnp.asarray(vn),
                                       jnp.asarray(step, jnp.int32),
                                       block_rows=4, chunk=chunk,
                                       interpret=True)
            ref_k, ref_v = k.copy(), v.copy()
            ref_k[:, :, step, :] = kn
            ref_v[:, :, step, :] = vn
            np.testing.assert_array_equal(np.asarray(out["k"]), ref_k,
                                          f"step={step} chunk={chunk}")
            np.testing.assert_array_equal(np.asarray(out["v"]), ref_v)


def test_write_gen_slot_chunk_seqmajor_matches_dus():
    """Seq-major variant (greedy decode's [L, B, E, D] cache layout)."""
    from capdec_tpu.ops.cache_reorder import write_gen_slot_chunk_seqmajor
    rng = np.random.RandomState(4)
    L, B, E, D = 3, 10, 24, 256
    k = rng.randn(L, B, E, D).astype(np.float32)
    v = rng.randn(L, B, E, D).astype(np.float32)
    kn = rng.randn(L, B, D).astype(np.float32)
    vn = rng.randn(L, B, D).astype(np.float32)
    for step in (0, 7, 8, 23):
        out = write_gen_slot_chunk_seqmajor(
            jnp.asarray(k), jnp.asarray(v), jnp.asarray(kn),
            jnp.asarray(vn), jnp.asarray(step, jnp.int32),
            block_rows=4, interpret=True)
        ref_k, ref_v = k.copy(), v.copy()
        ref_k[:, :, step, :] = kn
        ref_v[:, :, step, :] = vn
        np.testing.assert_array_equal(np.asarray(out["k"]), ref_k,
                                      f"step={step}")
        np.testing.assert_array_equal(np.asarray(out["v"]), ref_v)


def test_write_gen_slot_matches_dus():
    from capdec_tpu.ops.cache_reorder import write_gen_slot
    rng = np.random.RandomState(2)
    B, L, E, D = 10, 3, 16, 256
    for _ in (0,):
        for step in (0, 7, 15):
            k = rng.randn(B, L, E, D).astype(np.float32)
            v = rng.randn(B, L, E, D).astype(np.float32)
            kn = rng.randn(B, L, D).astype(np.float32)
            vn = rng.randn(B, L, D).astype(np.float32)
            out = write_gen_slot(jnp.asarray(k), jnp.asarray(v),
                                 jnp.asarray(kn), jnp.asarray(vn),
                                 jnp.asarray(step, jnp.int32),
                                 interpret=True)
            ref_k, ref_v = k.copy(), v.copy()
            ref_k[:, :, step, :] = kn
            ref_v[:, :, step, :] = vn
            np.testing.assert_array_equal(np.asarray(out["k"]), ref_k,
                                          f"step={step}")
            np.testing.assert_array_equal(np.asarray(out["v"]), ref_v)


@pytest.mark.slow
def test_copy_forked_rows_bounded_matches_gather_on_valid_slots():
    """Bounded fork copy: rows with src[b] != b receive row src[b]'s
    slots < count; src[b] == b rows and tail slots are untouched (the
    lane invariant guarantees no written row is ever a source)."""
    from capdec_tpu.ops.cache_reorder import copy_forked_rows_bounded
    rng = np.random.RandomState(2)
    B, L, E, D = 10, 2, 24, 256
    k = rng.randn(B, L, E, D).astype(np.float32)
    v = rng.randn(B, L, E, D).astype(np.float32)
    # lane-invariant source map: forked targets (1, 4, 9) are nobody's src
    src = np.asarray([0, 3, 2, 3, 0, 5, 6, 7, 8, 5], np.int32)
    for count in (1, 8, 9, 24):
        out = copy_forked_rows_bounded(
            jnp.asarray(k), jnp.asarray(v), jnp.asarray(src),
            jnp.asarray(count, jnp.int32), chunk=8, wave=4, interpret=True)
        ref_k, ref_v = k.copy(), v.copy()
        for b in range(B):
            if src[b] != b:
                ref_k[b, :, :count] = k[src[b], :, :count]
                ref_v[b, :, :count] = v[src[b], :, :count]
        np.testing.assert_array_equal(
            np.asarray(out["k"])[:, :, :count], ref_k[:, :, :count],
            f"count={count}")
        np.testing.assert_array_equal(
            np.asarray(out["v"])[:, :, :count], ref_v[:, :, :count])
        # unforked rows keep their tails too
        np.testing.assert_array_equal(np.asarray(out["k"])[0], ref_k[0])
