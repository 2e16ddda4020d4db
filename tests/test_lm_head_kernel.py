"""Oracle tests for ops/lm_head.py — the fused LM-head + logsumexp +
top-R kernel, in BOTH grid orders (batch-outer v1, vocab-outer v2).

Oracle: XLA's f32 `h @ w^T` -> `lax.top_k` / `logsumexp`. The kernel
contract is EXACT selection (top-R indices, incl. lowest-index ties);
values/lse agree to f32-reduction-order tolerance — the kernel's
per-chunk matmuls and the oracle's single full-shape matmul reduce the
D axis in different orders, so values can differ by ~1 ULP. (Engine-
level token-identity lives in tests/test_decode.py.)
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from capdec_tpu.ops.lm_head import lm_head_topk


def _oracle(h, w, r):
    logits = (h.astype(jnp.float32) @ w.astype(jnp.float32).T)
    vals, idx = jax.lax.top_k(logits, r)
    lse = jax.nn.logsumexp(logits, axis=-1)
    return np.asarray(vals), np.asarray(idx), np.asarray(lse)


def _check(B, V, D, r, dtype, seed, vocab_outer, block_rows=8,
           vocab_chunk=64):
    rng = np.random.RandomState(seed)
    h = jnp.asarray(rng.randn(B, D), dtype)
    w = jnp.asarray(rng.randn(V, D), dtype)
    vals, idx, lse = jax.tree.map(
        np.asarray,
        lm_head_topk(h, w, r, block_rows=block_rows,
                     vocab_chunk=vocab_chunk, interpret=True,
                     vocab_outer=vocab_outer))
    ov, oi, ol = _oracle(h, w, r)
    np.testing.assert_array_equal(idx, oi)
    np.testing.assert_allclose(vals, ov, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(lse, ol, rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("vocab_outer", [False, True])
def test_exact_topr_and_lse(vocab_outer):
    _check(B=16, V=200, D=32, r=5, dtype=jnp.float32, seed=0,
           vocab_outer=vocab_outer)


@pytest.mark.parametrize("vocab_outer", [False, True])
def test_ragged_vocab_and_r1(vocab_outer):
    # V not a multiple of vocab_chunk (the 50257 case); greedy's R=1
    _check(B=8, V=131, D=16, r=1, dtype=jnp.float32, seed=1,
           vocab_outer=vocab_outer)


@pytest.mark.parametrize("vocab_outer", [False, True])
def test_bf16_inputs_f32_accumulation(vocab_outer):
    # bf16 h/w with f32 MXU accumulation — the production decode dtype.
    # The oracle casts to f32 FIRST, which is what
    # preferred_element_type=f32 dot_general computes.
    _check(B=8, V=96, D=32, r=3, dtype=jnp.bfloat16, seed=2,
           vocab_outer=vocab_outer)


@pytest.mark.parametrize("vocab_outer", [False, True])
def test_all_ties_lowest_index_wins(vocab_outer):
    # identical logits everywhere: top-R indices must be 0..R-1 in order
    B, V, D, r = 4, 100, 8, 5
    h = jnp.zeros((B, D), jnp.float32)
    w = jnp.ones((V, D), jnp.float32)
    vals, idx, lse = jax.tree.map(
        np.asarray, lm_head_topk(h, w, r, block_rows=4, vocab_chunk=32,
                                 interpret=True, vocab_outer=vocab_outer))
    np.testing.assert_array_equal(idx, np.tile(np.arange(r), (B, 1)))
    np.testing.assert_array_equal(vals, np.zeros((B, r), np.float32))
    np.testing.assert_allclose(lse, np.full(B, np.log(V)), rtol=1e-6)


@pytest.mark.parametrize("vocab_outer", [False, True])
def test_ties_across_chunk_boundaries(vocab_outer):
    # duplicate rows in w so equal logits straddle vocab chunks; the
    # LOWEST global index must win each tie round, matching lax.top_k.
    rng = np.random.RandomState(3)
    base = rng.randn(40, 16)
    w = jnp.asarray(np.concatenate([base, base[:20], base[:10]]),
                    jnp.float32)  # 70 rows with cross-chunk duplicates
    h = jnp.asarray(rng.randn(6, 16), jnp.float32)
    vals, idx, lse = jax.tree.map(
        np.asarray, lm_head_topk(h, w, 6, block_rows=3, vocab_chunk=32,
                                 interpret=True, vocab_outer=vocab_outer))
    ov, oi, ol = _oracle(h, w, 6)
    np.testing.assert_array_equal(idx, oi)
    np.testing.assert_allclose(vals, ov, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(lse, ol, rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("vocab_outer", [False, True])
def test_lanes_merge_exact(vocab_outer):
    # two-level lane merge (merge="lanes"): 128-lane column blocks, so
    # vocab_chunk must be a 128-multiple; ragged vocab exercises the
    # NEG-padded lanes of the last chunk.
    rng = np.random.RandomState(7)
    h = jnp.asarray(rng.randn(8, 32), jnp.float32)
    w = jnp.asarray(rng.randn(300, 32), jnp.float32)
    vals, idx, lse = jax.tree.map(
        np.asarray, lm_head_topk(h, w, 5, block_rows=4, vocab_chunk=128,
                                 interpret=True, vocab_outer=vocab_outer,
                                 merge="lanes"))
    ov, oi, ol = _oracle(h, w, 5)
    np.testing.assert_array_equal(idx, oi)
    np.testing.assert_allclose(vals, ov, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(lse, ol, rtol=1e-5, atol=1e-5)


def test_lanes_merge_ties_and_r1():
    # cross-chunk duplicate logits: lowest global index must win each
    # round under the lane merge's two-level tie-breaking; plus greedy's
    # R=1 case with a multi-block phase A (vocab_chunk=256 -> G=2).
    rng = np.random.RandomState(8)
    base = rng.randn(150, 16)
    w = jnp.asarray(np.concatenate([base, base[:90], base[:40]]),
                    jnp.float32)  # 280 rows, duplicates straddle chunks
    h = jnp.asarray(rng.randn(6, 16), jnp.float32)
    for r, vc in ((6, 128), (1, 256)):
        vals, idx, lse = jax.tree.map(
            np.asarray, lm_head_topk(h, w, r, block_rows=3,
                                     vocab_chunk=vc, interpret=True,
                                     merge="lanes"))
        ov, oi, ol = _oracle(h, w, r)
        np.testing.assert_array_equal(idx, oi)
        np.testing.assert_allclose(vals, ov, rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(lse, ol, rtol=1e-5, atol=1e-5)


def test_lanes_merge_all_equal_logits():
    # the all-ties worst case: indices must be 0..R-1 like lax.top_k
    B, V, D, r = 4, 384, 8, 5
    h = jnp.zeros((B, D), jnp.float32)
    w = jnp.ones((V, D), jnp.float32)
    vals, idx, lse = jax.tree.map(
        np.asarray, lm_head_topk(h, w, r, block_rows=4, vocab_chunk=128,
                                 interpret=True, merge="lanes"))
    np.testing.assert_array_equal(idx, np.tile(np.arange(r), (B, 1)))
    np.testing.assert_array_equal(vals, np.zeros((B, r), np.float32))
    np.testing.assert_allclose(lse, np.full(B, np.log(V)), rtol=1e-6)


@pytest.mark.parametrize("B,V,D,r,vc,br,seed", [
    (6, 129, 16, 2, 128, 3, 10),    # last chunk has ONE real column
    (5, 1024, 24, 7, 256, 5, 11),   # B indivisible by block_rows
    (4, 100, 8, 4, 128, 4, 12),     # V smaller than one chunk
    (3, 640, 16, 16, 512, 3, 13),   # r == G (per-lane rounds exhausted)
    (8, 257, 8, 1, 256, 8, 14),     # greedy R=1, ragged tail chunk
])
@pytest.mark.slow
def test_lanes_merge_shape_stress(B, V, D, r, vc, br, seed):
    # awkward-shape sweep for the two-level merge: ragged last chunks,
    # block_rows not dividing B, single-chunk vocab, r at the per-lane
    # round budget. Low-entropy values force heavy tie traffic.
    rng = np.random.RandomState(seed)
    h = jnp.asarray(rng.randint(-2, 3, (B, D)), jnp.float32)
    w = jnp.asarray(rng.randint(-2, 3, (V, D)), jnp.float32)
    vals, idx, lse = jax.tree.map(
        np.asarray, lm_head_topk(h, w, r, block_rows=br, vocab_chunk=vc,
                                 interpret=True, merge="lanes"))
    ov, oi, ol = _oracle(h, w, r)
    np.testing.assert_array_equal(idx, oi)
    np.testing.assert_allclose(vals, ov, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(lse, ol, rtol=1e-5, atol=1e-5)


def test_lanes_merge_rejects_unaligned_chunk():
    h = jnp.zeros((4, 8), jnp.float32)
    w = jnp.ones((64, 8), jnp.float32)
    with pytest.raises(ValueError):
        lm_head_topk(h, w, 2, block_rows=4, vocab_chunk=32,
                     interpret=True, merge="lanes")


@pytest.mark.slow
def test_auto_grid_order_thresholds():
    # auto (None) resolves to the batch-outer grid; the flag only ever
    # changes the grid schedule, never the results
    rng = np.random.RandomState(4)
    h = jnp.asarray(rng.randn(8, 16), jnp.float32)
    w = jnp.asarray(rng.randn(64, 16), jnp.float32)
    a = jax.tree.map(np.asarray,
                     lm_head_topk(h, w, 2, block_rows=4, vocab_chunk=32,
                                  interpret=True))
    b = jax.tree.map(np.asarray,
                     lm_head_topk(h, w, 2, block_rows=4, vocab_chunk=32,
                                  interpret=True, vocab_outer=False))
    for x, y in zip(a, b):
        np.testing.assert_array_equal(x, y)
