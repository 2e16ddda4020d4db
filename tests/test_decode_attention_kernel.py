"""Pallas beam-decode-attention kernel vs a plain numpy oracle
(interpret mode — runs on the CPU backend)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from capdec_tpu.ops.decode_attention import beam_decode_attention


def oracle(q, k_new, v_new, pk, pv, gk, gv, step, R, hd):
    B, D = q.shape
    N, K, _ = pk.shape
    E = gk.shape[1]
    H = D // hd
    scale = 1.0 / np.sqrt(hd)
    out = np.zeros((B, D), np.float32)
    for b in range(B):
        n = b // R
        keys = np.concatenate([pk[n], gk[b][:step], k_new[b][None]], axis=0)
        vals = np.concatenate([pv[n], gv[b][:step], v_new[b][None]], axis=0)
        S = keys.shape[0]
        qh = q[b].reshape(H, hd)
        kh = keys.reshape(S, H, hd)
        vh = vals.reshape(S, H, hd)
        scores = np.einsum("hd,shd->sh", qh, kh) * scale
        scores = scores - scores.max(axis=0, keepdims=True)
        p = np.exp(scores)
        p = p / p.sum(axis=0, keepdims=True)
        out[b] = np.einsum("sh,shd->hd", p, vh).reshape(D)
    return out


@pytest.mark.parametrize("step", [0, 3, 7])
def test_kernel_matches_oracle(step):
    rng = np.random.RandomState(step)
    N, R, K, E, D, hd = 2, 5, 6, 8, 256, 64
    B = N * R
    q = rng.randn(B, D).astype(np.float32) * 0.3
    k_new = rng.randn(B, D).astype(np.float32) * 0.3
    v_new = rng.randn(B, D).astype(np.float32) * 0.3
    pk = rng.randn(N, K, D).astype(np.float32) * 0.3
    pv = rng.randn(N, K, D).astype(np.float32) * 0.3
    gk = rng.randn(B, E, D).astype(np.float32) * 0.3
    gv = rng.randn(B, E, D).astype(np.float32) * 0.3
    gk[:, step:] = 0.0  # slots >= step not yet written
    gv[:, step:] = 0.0

    out, gk2, gv2 = beam_decode_attention(
        jnp.asarray(q), jnp.asarray(k_new), jnp.asarray(v_new),
        jnp.asarray(pk), jnp.asarray(pv), jnp.asarray(gk), jnp.asarray(gv),
        jnp.asarray(step, jnp.int32), beams_per_image=R, head_dim=hd,
        block_beams=R, interpret=True)

    ref = oracle(q, k_new, v_new, pk, pv, gk, gv, step, R, hd)
    np.testing.assert_allclose(np.asarray(out), ref, atol=5e-2, rtol=5e-2)

    # slot write
    np.testing.assert_allclose(np.asarray(gk2[:, step]), k_new, atol=1e-2)
    np.testing.assert_allclose(np.asarray(gv2[:, step]), v_new, atol=1e-2)
    # other slots untouched
    np.testing.assert_array_equal(np.asarray(gk2[:, :step]), gk[:, :step])


def test_kernel_beam_size_larger_than_block(monkeypatch):
    """Beam sizes > block_beams must pick a valid block (the old search
    decremented past zero -> ZeroDivisionError)."""
    rng = np.random.RandomState(0)
    N, R, K, E, D, hd = 1, 24, 4, 8, 128, 64
    B = N * R
    step = 2
    mk = lambda *s: rng.randn(*s).astype(np.float32) * 0.3
    gk, gv = mk(B, E, D), mk(B, E, D)
    gk[:, step:] = 0.0
    gv[:, step:] = 0.0
    out, gk2, gv2 = beam_decode_attention(
        jnp.asarray(mk(B, D)), jnp.asarray(mk(B, D)), jnp.asarray(mk(B, D)),
        jnp.asarray(mk(N, K, D)), jnp.asarray(mk(N, K, D)),
        jnp.asarray(gk), jnp.asarray(gv),
        jnp.asarray(step, jnp.int32), beams_per_image=R, head_dim=hd,
        block_beams=20, interpret=True)
    assert out.shape == (B, D)


def test_kernel_nan_safe_with_garbage_tail_slots():
    """Slots >= step may hold uninitialized garbage (bounded reorder);
    NaN/Inf there must not poison the value sum."""
    rng = np.random.RandomState(1)
    N, R, K, E, D, hd = 2, 5, 4, 8, 128, 64
    B = N * R
    step = 3
    mk = lambda *s: rng.randn(*s).astype(np.float32) * 0.3
    gk, gv = mk(B, E, D), mk(B, E, D)
    gk[:, step:] = np.nan
    gv[:, step:] = np.inf
    out, _, _ = beam_decode_attention(
        jnp.asarray(mk(B, D)), jnp.asarray(mk(B, D)), jnp.asarray(mk(B, D)),
        jnp.asarray(mk(N, K, D)), jnp.asarray(mk(N, K, D)),
        jnp.asarray(gk), jnp.asarray(gv),
        jnp.asarray(step, jnp.int32), beams_per_image=R, head_dim=hd,
        interpret=True)
    assert np.isfinite(np.asarray(out)).all()


@pytest.mark.parametrize("step,layer", [(0, 0), (3, 1), (7, 2)])
def test_rowmajor_kernel_matches_oracle(step, layer):
    from capdec_tpu.ops.decode_attention import beam_decode_attention_rowmajor
    rng = np.random.RandomState(10 + step)
    N, R, K, E, D, hd, L = 2, 5, 6, 8, 256, 64, 3
    B = N * R
    mk = lambda *s: rng.randn(*s).astype(np.float32) * 0.3
    q, k_new, v_new = mk(B, D), mk(B, D), mk(B, D)
    pk, pv = mk(L, N, K, D), mk(L, N, K, D)
    gk, gv = mk(B, L, E, D), mk(B, L, E, D)
    gk[:, :, step:] = 0.0
    gv[:, :, step:] = 0.0

    out = beam_decode_attention_rowmajor(
        jnp.asarray(q), jnp.asarray(k_new), jnp.asarray(v_new),
        jnp.asarray(pk), jnp.asarray(pv), jnp.asarray(gk), jnp.asarray(gv),
        jnp.asarray(step, jnp.int32), jnp.asarray(layer, jnp.int32),
        beams_per_image=R, head_dim=hd, block_beams=R, interpret=True)

    ref = oracle(q, k_new, v_new, pk[layer], pv[layer], gk[:, layer],
                 gv[:, layer], step, R, hd)
    np.testing.assert_allclose(np.asarray(out), ref, atol=5e-2, rtol=5e-2)


def test_rowmajor_kernel_nan_safe():
    from capdec_tpu.ops.decode_attention import beam_decode_attention_rowmajor
    rng = np.random.RandomState(3)
    N, R, K, E, D, hd, L = 2, 5, 4, 8, 128, 64, 2
    B = N * R
    step, layer = 3, 1
    mk = lambda *s: rng.randn(*s).astype(np.float32) * 0.3
    gk, gv = mk(B, L, E, D), mk(B, L, E, D)
    gk[:, :, step:] = np.nan
    gv[:, :, step:] = np.inf
    out = beam_decode_attention_rowmajor(
        jnp.asarray(mk(B, D)), jnp.asarray(mk(B, D)), jnp.asarray(mk(B, D)),
        jnp.asarray(mk(L, N, K, D)), jnp.asarray(mk(L, N, K, D)),
        jnp.asarray(gk), jnp.asarray(gv),
        jnp.asarray(step, jnp.int32), jnp.asarray(layer, jnp.int32),
        beams_per_image=R, head_dim=hd, interpret=True)
    assert np.isfinite(np.asarray(out)).all()


def test_decode_step_fused_matches_xla_path():
    """decode_step(fused_attention=True) vs the XLA attention path —
    same logits (bf16-reassociation tolerance) and identical cache
    writes."""
    from capdec_tpu.models import gpt2

    cfg = gpt2.GPT2Config(n_layer=2, n_head=4, n_embd=256, vocab_size=512,
                          n_positions=128)
    params = gpt2.init_params(jax.random.PRNGKey(0), cfg)
    rng = np.random.RandomState(0)
    N, R, K, E = 2, 5, 6, 16
    B = N * R
    prefix = jnp.asarray(rng.randn(N, K, cfg.n_embd) * 0.3, jnp.float32)
    _, prefix_cache = gpt2.prefill(params, cfg, prefix)
    gen = gpt2.init_gen_cache_rowmajor(cfg, B, E)
    tok = jnp.asarray(rng.randn(B, cfg.n_embd) * 0.3, jnp.float32)
    step = jnp.asarray(3, jnp.int32)
    # pre-populate slots < step so attention has history
    hist = rng.randn(B, cfg.n_layer, 3, cfg.n_embd).astype(np.float32) * 0.3
    gen = {kk: vv.at[:, :, :3].set(hist) for kk, vv in gen.items()}

    logits_ref, cache_ref = gpt2.decode_step(
        params, cfg, tok, prefix_cache, gen, step, rowmajor=True)
    logits_f, cache_f = gpt2.decode_step(
        params, cfg, tok, prefix_cache, gen, step, rowmajor=True,
        fused_attention=True, fused_interpret=True)

    np.testing.assert_allclose(np.asarray(logits_f), np.asarray(logits_ref),
                               atol=5e-2, rtol=5e-2)
    for kk in ("k", "v"):
        np.testing.assert_allclose(np.asarray(cache_f[kk]),
                                   np.asarray(cache_ref[kk]),
                                   atol=2e-2, rtol=2e-2)


def _quantize(x):
    """Per-(row[, layer]) absmax int8 quantization over the last axis."""
    amax = np.abs(x).max(axis=-1, keepdims=True)
    s = np.where(amax > 0, amax / 127.0, 1.0)
    q = np.clip(np.round(x / s), -127, 127).astype(np.int8)
    return q, s[..., 0].astype(np.float32)


@pytest.mark.parametrize("step,layer", [(0, 0), (3, 1), (7, 2)])
def test_rowmajor_q_kernel_matches_dequant_oracle(step, layer):
    """int8 fused attention == the fp oracle evaluated on the DEQUANTIZED
    cache (level * scale): the quantization is the only approximation."""
    from capdec_tpu.ops.decode_attention import (
        beam_decode_attention_rowmajor_q)
    rng = np.random.RandomState(20 + step)
    N, R, K, E, D, hd, L = 2, 5, 6, 8, 256, 64, 3
    B = N * R
    mk = lambda *s: rng.randn(*s).astype(np.float32) * 0.3
    q, k_new, v_new = mk(B, D), mk(B, D), mk(B, D)
    pk, pv = mk(L, N, K, D), mk(L, N, K, D)
    gk, gv = mk(B, L, E, D), mk(B, L, E, D)
    qk, sk = _quantize(gk)   # [B, L, E, D] int8, [B, L, E] f32
    qv, sv = _quantize(gv)

    out = beam_decode_attention_rowmajor_q(
        jnp.asarray(q), jnp.asarray(k_new), jnp.asarray(v_new),
        jnp.asarray(pk), jnp.asarray(pv), jnp.asarray(qk), jnp.asarray(qv),
        jnp.asarray(sk[:, :, None, :]), jnp.asarray(sv[:, :, None, :]),
        jnp.asarray(step, jnp.int32), jnp.asarray(layer, jnp.int32),
        beams_per_image=R, head_dim=hd, block_beams=R, interpret=True)

    deq_k = qk[:, layer].astype(np.float32) * sk[:, layer, :, None]
    deq_v = qv[:, layer].astype(np.float32) * sv[:, layer, :, None]
    ref = oracle(q, k_new, v_new, pk[layer], pv[layer], deq_k, deq_v,
                 step, R, hd)
    np.testing.assert_allclose(np.asarray(out), ref, atol=5e-2, rtol=5e-2)


def test_write_gen_slot_chunk_q_matches_reference():
    """Quantizing chunk write == python absmax-int8 reference, in place,
    across chunk boundaries; untouched slots and scales preserved."""
    from capdec_tpu.ops.cache_reorder import write_gen_slot_chunk_q
    rng = np.random.RandomState(5)
    B, L, E, D = 10, 3, 24, 256
    k = rng.randint(-127, 128, (B, L, E, D)).astype(np.int8)
    v = rng.randint(-127, 128, (B, L, E, D)).astype(np.int8)
    ks = rng.rand(B, L, 1, E).astype(np.float32)
    vs = rng.rand(B, L, 1, E).astype(np.float32)
    nk = rng.randn(B, L, D).astype(np.float32) * 0.3
    nv = rng.randn(B, L, D).astype(np.float32) * 0.3
    for step in (0, 7, 8, 23):
        out = write_gen_slot_chunk_q(
            jnp.asarray(k), jnp.asarray(v), jnp.asarray(ks),
            jnp.asarray(vs), jnp.asarray(nk), jnp.asarray(nv),
            jnp.asarray(step, jnp.int32), block_rows=4, interpret=True)
        qk, sk = _quantize(nk)
        qv, sv = _quantize(nv)
        ref_k, ref_ks = k.copy(), ks.copy()
        ref_v, ref_vs = v.copy(), vs.copy()
        ref_k[:, :, step] = qk
        ref_v[:, :, step] = qv
        ref_ks[:, :, 0, step] = sk
        ref_vs[:, :, 0, step] = sv
        np.testing.assert_array_equal(np.asarray(out["k"]), ref_k,
                                      f"step={step}")
        np.testing.assert_array_equal(np.asarray(out["v"]), ref_v)
        np.testing.assert_allclose(np.asarray(out["ks"]), ref_ks,
                                   rtol=1e-6)
        np.testing.assert_allclose(np.asarray(out["vs"]), ref_vs,
                                   rtol=1e-6)


@pytest.mark.parametrize("step,layer", [(0, 0), (3, 1), (8, 2), (9, 0),
                                        (15, 1), (16, 2)])
def test_chunked_kernel_matches_oracle(step, layer):
    """v3 slot-bounded kernel (chunk grid + online softmax) vs the numpy
    oracle, at steps inside / at / across chunk boundaries."""
    from capdec_tpu.ops.decode_attention import beam_decode_attention_chunked
    rng = np.random.RandomState(30 + step)
    N, R, K, E, D, hd, L = 2, 5, 6, 24, 256, 64, 3
    B = N * R
    mk = lambda *s: rng.randn(*s).astype(np.float32) * 0.3
    q, k_new, v_new = mk(B, D), mk(B, D), mk(B, D)
    pk, pv = mk(L, N, K, D), mk(L, N, K, D)
    gk, gv = mk(B, L, E, D), mk(B, L, E, D)
    gk[:, :, step:] = 0.0
    gv[:, :, step:] = 0.0

    out = beam_decode_attention_chunked(
        jnp.asarray(q), jnp.asarray(k_new), jnp.asarray(v_new),
        jnp.asarray(pk), jnp.asarray(pv), jnp.asarray(gk), jnp.asarray(gv),
        jnp.asarray(step, jnp.int32), jnp.asarray(layer, jnp.int32),
        beams_per_image=R, head_dim=hd, block_beams=R, chunk=8,
        interpret=True)

    ref = oracle(q, k_new, v_new, pk[layer], pv[layer], gk[:, layer],
                 gv[:, layer], step, R, hd)
    np.testing.assert_allclose(np.asarray(out), ref, atol=5e-2, rtol=5e-2)


def test_chunked_kernel_nan_safe():
    """Unwritten tail slots and whole unreached chunks may hold NaN/Inf:
    the online accumulation must never ingest them."""
    from capdec_tpu.ops.decode_attention import beam_decode_attention_chunked
    rng = np.random.RandomState(31)
    N, R, K, E, D, hd, L = 2, 5, 4, 16, 128, 64, 2
    B = N * R
    step, layer = 3, 1
    mk = lambda *s: rng.randn(*s).astype(np.float32) * 0.3
    gk, gv = mk(B, L, E, D), mk(B, L, E, D)
    gk[:, :, step:] = np.nan
    gv[:, :, step:] = np.inf
    out = beam_decode_attention_chunked(
        jnp.asarray(mk(B, D)), jnp.asarray(mk(B, D)), jnp.asarray(mk(B, D)),
        jnp.asarray(mk(L, N, K, D)), jnp.asarray(mk(L, N, K, D)),
        jnp.asarray(gk), jnp.asarray(gv),
        jnp.asarray(step, jnp.int32), jnp.asarray(layer, jnp.int32),
        beams_per_image=R, head_dim=hd, chunk=8, interpret=True)
    assert np.isfinite(np.asarray(out)).all()


@pytest.mark.parametrize("step,layer", [(0, 0), (7, 1), (9, 2), (23, 0)])
def test_chunked_q_kernel_matches_dequant_oracle(step, layer):
    """int8 v3 kernel == fp oracle on the dequantized cache; the in-kernel
    one-hot chunk-select of the scales must track the chunk index."""
    from capdec_tpu.ops.decode_attention import (
        beam_decode_attention_chunked_q)
    rng = np.random.RandomState(40 + step)
    N, R, K, E, D, hd, L = 2, 5, 6, 24, 256, 64, 3
    B = N * R
    mk = lambda *s: rng.randn(*s).astype(np.float32) * 0.3
    q, k_new, v_new = mk(B, D), mk(B, D), mk(B, D)
    pk, pv = mk(L, N, K, D), mk(L, N, K, D)
    gk, gv = mk(B, L, E, D), mk(B, L, E, D)
    qk, sk = _quantize(gk)
    qv, sv = _quantize(gv)

    out = beam_decode_attention_chunked_q(
        jnp.asarray(q), jnp.asarray(k_new), jnp.asarray(v_new),
        jnp.asarray(pk), jnp.asarray(pv), jnp.asarray(qk), jnp.asarray(qv),
        jnp.asarray(sk[:, :, None, :]), jnp.asarray(sv[:, :, None, :]),
        jnp.asarray(step, jnp.int32), jnp.asarray(layer, jnp.int32),
        beams_per_image=R, head_dim=hd, block_beams=R, chunk=8,
        interpret=True)

    deq_k = qk[:, layer].astype(np.float32) * sk[:, layer, :, None]
    deq_v = qv[:, layer].astype(np.float32) * sv[:, layer, :, None]
    ref = oracle(q, k_new, v_new, pk[layer], pv[layer], deq_k, deq_v,
                 step, R, hd)
    np.testing.assert_allclose(np.asarray(out), ref, atol=5e-2, rtol=5e-2)


@pytest.mark.parametrize("step,layer", [(0, 1), (9, 2), (23, 0)])
def test_chunked_q_int8_prefix_matches_dequant_oracle(step, layer):
    """Full-int8 path (generated AND prefix caches quantized): kernel ==
    fp oracle on the dequantized caches."""
    from capdec_tpu.ops.decode_attention import (
        beam_decode_attention_chunked_q)
    rng = np.random.RandomState(50 + step)
    N, R, K, E, D, hd, L = 2, 5, 6, 24, 256, 64, 3
    B = N * R
    mk = lambda *s: rng.randn(*s).astype(np.float32) * 0.3
    q, k_new, v_new = mk(B, D), mk(B, D), mk(B, D)
    pk, pv = mk(L, N, K, D), mk(L, N, K, D)
    gk, gv = mk(B, L, E, D), mk(B, L, E, D)
    qk, sk = _quantize(gk)
    qv, sv = _quantize(gv)
    qpk, spk = _quantize(pk)   # [L, N, K, D] int8, [L, N, K] f32
    qpv, spv = _quantize(pv)

    out = beam_decode_attention_chunked_q(
        jnp.asarray(q), jnp.asarray(k_new), jnp.asarray(v_new),
        jnp.asarray(qpk), jnp.asarray(qpv), jnp.asarray(qk),
        jnp.asarray(qv),
        jnp.asarray(sk[:, :, None, :]), jnp.asarray(sv[:, :, None, :]),
        jnp.asarray(step, jnp.int32), jnp.asarray(layer, jnp.int32),
        beams_per_image=R, head_dim=hd, block_beams=R, chunk=8,
        pks=jnp.asarray(spk[:, :, None, :]),
        pvs=jnp.asarray(spv[:, :, None, :]), interpret=True)

    deq_k = qk[:, layer].astype(np.float32) * sk[:, layer, :, None]
    deq_v = qv[:, layer].astype(np.float32) * sv[:, layer, :, None]
    deq_pk = qpk[layer].astype(np.float32) * spk[layer, :, :, None]
    deq_pv = qpv[layer].astype(np.float32) * spv[layer, :, :, None]
    ref = oracle(q, k_new, v_new, deq_pk, deq_pv, deq_k, deq_v,
                 step, R, hd)
    np.testing.assert_allclose(np.asarray(out), ref, atol=5e-2, rtol=5e-2)


@pytest.mark.parametrize("step,layer", [(0, 0), (9, 1), (23, 2)])
def test_chunked_kernel_vector_reduce_matches_oracle(step, layer):
    """vector_reduce variant (VPU reshape+sum / lane-repeat instead of
    the head-grouping G-matmuls) == the numpy oracle."""
    from capdec_tpu.ops.decode_attention import beam_decode_attention_chunked
    rng = np.random.RandomState(60 + step)
    N, R, K, E, D, hd, L = 2, 5, 6, 24, 256, 64, 3
    B = N * R
    mk = lambda *s: rng.randn(*s).astype(np.float32) * 0.3
    q, k_new, v_new = mk(B, D), mk(B, D), mk(B, D)
    pk, pv = mk(L, N, K, D), mk(L, N, K, D)
    gk, gv = mk(B, L, E, D), mk(B, L, E, D)
    gk[:, :, step:] = 0.0
    gv[:, :, step:] = 0.0
    out = beam_decode_attention_chunked(
        jnp.asarray(q), jnp.asarray(k_new), jnp.asarray(v_new),
        jnp.asarray(pk), jnp.asarray(pv), jnp.asarray(gk), jnp.asarray(gv),
        jnp.asarray(step, jnp.int32), jnp.asarray(layer, jnp.int32),
        beams_per_image=R, head_dim=hd, block_beams=R, chunk=8,
        vector_reduce=True, interpret=True)
    ref = oracle(q, k_new, v_new, pk[layer], pv[layer], gk[:, layer],
                 gv[:, layer], step, R, hd)
    np.testing.assert_allclose(np.asarray(out), ref, atol=5e-2, rtol=5e-2)


@pytest.mark.parametrize("step,layer", [(0, 0), (3, 1), (7, 2)])
def test_rowmajor_kernel_vector_reduce_matches_oracle(step, layer):
    """v2 one-pass kernel with vector_reduce (shared _reduce_fns VPU
    path) == the numpy oracle."""
    from capdec_tpu.ops.decode_attention import beam_decode_attention_rowmajor
    rng = np.random.RandomState(80 + step)
    N, R, K, E, D, hd, L = 2, 5, 6, 8, 256, 64, 3
    B = N * R
    mk = lambda *s: rng.randn(*s).astype(np.float32) * 0.3
    q, k_new, v_new = mk(B, D), mk(B, D), mk(B, D)
    pk, pv = mk(L, N, K, D), mk(L, N, K, D)
    gk, gv = mk(B, L, E, D), mk(B, L, E, D)
    gk[:, :, step:] = 0.0
    gv[:, :, step:] = 0.0

    out = beam_decode_attention_rowmajor(
        jnp.asarray(q), jnp.asarray(k_new), jnp.asarray(v_new),
        jnp.asarray(pk), jnp.asarray(pv), jnp.asarray(gk), jnp.asarray(gv),
        jnp.asarray(step, jnp.int32), jnp.asarray(layer, jnp.int32),
        beams_per_image=R, head_dim=hd, block_beams=R, interpret=True,
        vector_reduce=True)

    ref = oracle(q, k_new, v_new, pk[layer], pv[layer], gk[:, layer],
                 gv[:, layer], step, R, hd)
    np.testing.assert_allclose(np.asarray(out), ref, atol=5e-2, rtol=5e-2)
