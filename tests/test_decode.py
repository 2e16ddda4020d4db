"""Decode-engine parity tests.

Oracle: a deliberately naive beam/greedy implementation on top of the
*HuggingFace torch* model — full re-forward over the growing
inputs_embeds each step, exactly the reference's decode structure
(gpt2_prefix_eval.py:50-198) — compared token-for-token against our
KV-cached fixed-shape engines through the weight converter.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from capdec_tpu.decode import (BeamConfig, ToppConfig, beam_search,
                               greedy_topp_search)
from capdec_tpu.models import gpt2

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

SMALL = dict(vocab_size=97, n_positions=96, n_embd=48, n_layer=3, n_head=4)


@pytest.fixture(scope="module")
def models():
    torch.manual_seed(0)
    hf_cfg = transformers.GPT2Config(
        vocab_size=SMALL["vocab_size"], n_positions=SMALL["n_positions"],
        n_embd=SMALL["n_embd"], n_layer=SMALL["n_layer"], n_head=SMALL["n_head"],
        attn_pdrop=0.0, embd_pdrop=0.0, resid_pdrop=0.0)
    tm = transformers.GPT2LMHeadModel(hf_cfg).eval()
    cfg = gpt2.GPT2Config(**SMALL)
    params = gpt2.params_from_torch_state_dict(tm.state_dict(), cfg)
    return tm, params, cfg


def oracle_beam(tm, embed, beam_size, entry_length, stop_token):
    """Reference-semantics beam (naive full re-forward, torch)."""
    with torch.no_grad():
        generated = embed  # [1, K, D]
        scores = None
        tokens = None
        seq_lengths = torch.ones(beam_size)
        is_stopped = torch.zeros(beam_size, dtype=torch.bool)
        for i in range(entry_length):
            logits = tm(inputs_embeds=generated).logits[:, -1, :]
            logp = logits.softmax(-1).log()
            if scores is None:
                scores, next_tokens = logp.topk(beam_size, -1)
                generated = generated.expand(beam_size, *generated.shape[1:])
                next_tokens, scores = next_tokens.permute(1, 0), scores.squeeze(0)
                tokens = next_tokens
            else:
                logp[is_stopped] = -float("inf")
                logp[is_stopped, 0] = 0
                scores_sum = scores[:, None] + logp
                seq_lengths[~is_stopped] += 1
                avg = scores_sum / seq_lengths[:, None]
                avg, idx = avg.view(-1).topk(beam_size, -1)
                src = idx // scores_sum.shape[1]
                seq_lengths = seq_lengths[src]
                next_tokens = (idx % scores_sum.shape[1]).unsqueeze(1)
                tokens = torch.cat((tokens[src], next_tokens), dim=1)
                generated = generated[src]
                scores = avg * seq_lengths
                is_stopped = is_stopped[src]
            emb = tm.transformer.wte(next_tokens.squeeze()).view(
                generated.shape[0], 1, -1)
            generated = torch.cat((generated, emb), dim=1)
            is_stopped = is_stopped | next_tokens.eq(stop_token).squeeze()
            if is_stopped.all():
                break
        final = scores / seq_lengths
        return (tokens.numpy(), seq_lengths.numpy(), final.numpy(),
                np.argsort(-final.numpy()))


def oracle_greedy(tm, embed, entry_length, stop_tokens):
    with torch.no_grad():
        generated = embed
        out = []
        for _ in range(entry_length):
            logits = tm(inputs_embeds=generated).logits[:, -1, :]
            nxt = int(torch.argmax(logits, -1))
            out.append(nxt)
            emb = tm.transformer.wte(torch.tensor([[nxt]]))
            generated = torch.cat((generated, emb), dim=1)
            if nxt in stop_tokens:
                break
        return out


def _random_prefixes(n, k, d, seed):
    return np.random.RandomState(seed).randn(n, k, d).astype(np.float32) * 0.05


@pytest.mark.parametrize("stop_token", [13, None])
def test_beam_parity(models, stop_token):
    tm, params, cfg = models
    K, E, R = 6, 12, 4
    prefixes = _random_prefixes(3, K, SMALL["n_embd"], seed=42)
    if stop_token is None:
        # force stops: pick whichever token the greedy path emits at step 2
        g = oracle_greedy(tm, torch.tensor(prefixes[:1]), 5, set())
        stop_token = g[2]
    bc = BeamConfig(beam_size=R, entry_length=E, stop_token=stop_token)
    toks, lens, scores, order = jax.tree.map(
        np.asarray, beam_search(params, cfg, jnp.asarray(prefixes), bc))
    for n in range(prefixes.shape[0]):
        rt, rl, rs, ro = oracle_beam(tm, torch.tensor(prefixes[n:n + 1]),
                                     R, E, stop_token)
        got_L = rt.shape[1]
        np.testing.assert_array_equal(toks[n, :, :got_L], rt,
                                      err_msg=f"image {n}")
        np.testing.assert_array_equal(lens[n], rl)
        np.testing.assert_allclose(scores[n], rs, atol=1e-4)
        np.testing.assert_array_equal(order[n], ro)


def test_greedy_parity(models):
    tm, params, cfg = models
    K, E = 5, 10
    prefixes = _random_prefixes(4, K, SMALL["n_embd"], seed=7)
    tc = ToppConfig(entry_length=E, stop_token=13, extra_stop_token=764)
    toks, lens = jax.tree.map(
        np.asarray,
        greedy_topp_search(params, cfg, jnp.asarray(prefixes), tc))
    for n in range(4):
        ref = oracle_greedy(tm, torch.tensor(prefixes[n:n + 1]), E, {13, 764})
        assert list(toks[n, :lens[n]]) == ref, f"image {n}"


def test_nucleus_filter_keeps_argmax():
    from capdec_tpu.decode.topp import nucleus_filter
    rng = np.random.RandomState(0)
    logits = jnp.asarray(rng.randn(8, 50).astype(np.float32) * 3)
    filtered = nucleus_filter(logits, 0.8)
    np.testing.assert_array_equal(np.argmax(np.asarray(filtered), -1),
                                  np.argmax(np.asarray(logits), -1))
    # and removes at least the tail somewhere
    assert np.isinf(np.asarray(filtered)).any()


def test_nucleus_filter_matches_torch_reference():
    """Filter-mask parity with the reference's sort/cumsum/scatter recipe."""
    rng = np.random.RandomState(1)
    logits_np = rng.randn(6, 40).astype(np.float32) * 2
    top_p = 0.8
    lt = torch.tensor(logits_np.copy())
    sorted_logits, sorted_indices = torch.sort(lt, descending=True)
    cum = torch.cumsum(torch.softmax(sorted_logits, dim=-1), dim=-1)
    remove = cum > top_p
    remove[..., 1:] = remove[..., :-1].clone()
    remove[..., 0] = 0
    ref = lt.clone()
    for b in range(lt.shape[0]):
        ref[b, sorted_indices[b][remove[b]]] = -float("inf")
    from capdec_tpu.decode.topp import nucleus_filter
    got = np.asarray(nucleus_filter(jnp.asarray(logits_np), top_p))
    np.testing.assert_allclose(got, ref.numpy(), atol=1e-6)


def test_exact_top_k_chunked_matches_lax():
    from capdec_tpu.decode.beam import exact_top_k_chunked
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(7, 50257).astype(np.float32))
    v1, i1 = jax.lax.top_k(x, 5)
    v2, i2 = exact_top_k_chunked(x, 5)
    np.testing.assert_array_equal(np.asarray(v1), np.asarray(v2))
    np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))


@pytest.mark.slow
def test_beam_knobs_do_not_change_results(models):
    _, params, cfg = models
    prefixes = _random_prefixes(2, 5, SMALL["n_embd"], seed=11)
    outs = []
    from capdec_tpu.decode.beam import BeamConfig as BC
    for chunked in (False, True):
        bc = BC(beam_size=3, entry_length=9, stop_token=13,
                chunked_top_k=chunked)
        outs.append(jax.tree.map(np.asarray,
                                 beam_search(params, cfg,
                                             jnp.asarray(prefixes), bc)))
    np.testing.assert_array_equal(outs[0][0], outs[1][0])
    np.testing.assert_array_equal(outs[0][3], outs[1][3])


def test_lane_assignment_invariants():
    """_assign_lanes: bijection onto lanes, primaries keep their lane, and
    a written lane (src_of_lane != lane) is never read as a source."""
    from capdec_tpu.decode.beam import _assign_lanes
    rng = np.random.RandomState(0)
    R = 5
    for _ in range(50):
        src = jnp.asarray(rng.randint(0, R, (3, R)), jnp.int32)
        lane_oh, lane_of_rank = jax.tree.map(np.asarray,
                                             _assign_lanes(src, R))
        src = np.asarray(src)
        for n in range(3):
            lanes = lane_of_rank[n]
            assert sorted(lanes) == list(range(R))  # bijection
            # first winner of each source sits in that source lane
            seen = set()
            for w in range(R):
                if src[n, w] not in seen:
                    assert lanes[w] == src[n, w], (src[n], lanes)
                    seen.add(src[n, w])
            # src_of_lane[l] != l  =>  no winner reads lane l
            src_of_lane = {int(lanes[w]): int(src[n, w]) for w in range(R)}
            for l, s in src_of_lane.items():
                if s != l:
                    assert l not in src_of_lane.values() or \
                        all(v != l for v in src_of_lane.values())


@pytest.mark.slow
def test_beam_lane_mode_matches_rank_mode(models):
    """Lane-assigned beams (fork-copy placement) must be bit-identical to
    the rank-ordered reorder path."""
    _, params, cfg = models
    prefixes = _random_prefixes(3, 6, SMALL["n_embd"], seed=31)
    from capdec_tpu.decode.beam import BeamConfig as BC
    outs = []
    for lanes in (True, False):
        bc = BC(beam_size=4, entry_length=12, stop_token=13,
                lane_beams=lanes, pallas_reorder=False)
        outs.append(jax.tree.map(np.asarray,
                                 beam_search(params, cfg,
                                             jnp.asarray(prefixes), bc)))
    for a, b in zip(outs[0], outs[1]):
        np.testing.assert_array_equal(a, b)


@pytest.mark.slow
def test_beam_staged_cache_matches_unstaged(models):
    """cache_stages > 1 (growing per-stage slot capacity) is bit-identical
    to one full-size cache."""
    _, params, cfg = models
    prefixes = _random_prefixes(3, 5, SMALL["n_embd"], seed=37)
    from capdec_tpu.decode.beam import BeamConfig as BC
    outs = []
    for stages in (1, 3):
        bc = BC(beam_size=4, entry_length=20, stop_token=13,
                cache_stages=stages, pallas_reorder=False)
        outs.append(jax.tree.map(np.asarray,
                                 beam_search(params, cfg,
                                             jnp.asarray(prefixes), bc)))
    for a, b in zip(outs[0], outs[1]):
        np.testing.assert_array_equal(a, b)


@pytest.mark.slow
def test_beam_cache_layouts_identical(models):
    """Row-major [B, L, E, D] and layer-major [L, B, E, D] gen caches give
    bit-identical results."""
    _, params, cfg = models
    prefixes = _random_prefixes(3, 6, SMALL["n_embd"], seed=29)
    from capdec_tpu.decode.beam import BeamConfig as BC
    outs = []
    for kw in (dict(rowmajor_cache=True), dict(rowmajor_cache=False),
               dict(rowmajor_cache=True, mxu_reorder=True)):
        bc = BC(beam_size=4, entry_length=10, stop_token=13,
                pallas_reorder=False, **kw)
        outs.append(jax.tree.map(np.asarray,
                                 beam_search(params, cfg,
                                             jnp.asarray(prefixes), bc)))
    for other in outs[1:]:
        for a, b in zip(outs[0], other):
            np.testing.assert_array_equal(a, b)


@pytest.mark.parametrize("onehot", [True, False])
@pytest.mark.slow
def test_beam_ancestry_matches_reorder(models, onehot):
    """Ancestry attention (no cache movement) must be bit-identical to the
    physically-reordered-cache path, for both gather styles."""
    _, params, cfg = models
    prefixes = _random_prefixes(3, 6, SMALL["n_embd"], seed=23)
    from capdec_tpu.decode.beam import BeamConfig as BC
    outs = []
    for ancestry in (True, False):
        bc = BC(beam_size=4, entry_length=11, stop_token=13,
                ancestry=ancestry, onehot_gather=onehot,
                pallas_reorder=False)
        outs.append(jax.tree.map(np.asarray,
                                 beam_search(params, cfg,
                                             jnp.asarray(prefixes), bc)))
    for a, b in zip(outs[0], outs[1]):
        np.testing.assert_array_equal(a, b)


def test_nucleus_sampling_path(models):
    """sample=True draws from the filtered distribution (reference scaffolded
    this via the commented-out multinomial, gpt2_prefix_eval.py:178)."""
    _, params, cfg = models
    prefixes = _random_prefixes(2, 4, SMALL["n_embd"], seed=3)
    tc = ToppConfig(entry_length=6, top_p=0.9, stop_token=-1,
                    extra_stop_token=-1, sample=True)
    t1, l1 = greedy_topp_search(params, cfg, jnp.asarray(prefixes), tc,
                                key=jax.random.PRNGKey(0))
    t2, l2 = greedy_topp_search(params, cfg, jnp.asarray(prefixes), tc,
                                key=jax.random.PRNGKey(1))
    t1b, _ = greedy_topp_search(params, cfg, jnp.asarray(prefixes), tc,
                                key=jax.random.PRNGKey(0))
    # deterministic per key, varies across keys
    np.testing.assert_array_equal(np.asarray(t1), np.asarray(t1b))
    assert not np.array_equal(np.asarray(t1), np.asarray(t2))


@pytest.mark.parametrize("K", [5, 4])
def test_greedy_fused_attention_matches_xla_path(models, K):
    """Greedy decode through the fused row-major Pallas kernel (interpret
    mode on CPU) emits the same tokens as the XLA decode path. Both K
    values are unaligned, so the engine's 8-alignment prefix padding +
    NEG_INF mask are on; K=4 is the congruence class that CHECK-crashes
    the XLA:TPU backend unpadded (gpt2.pad_prefix_cache)."""
    tm, params, cfg = models
    E = 10
    prefixes = _random_prefixes(4, K, SMALL["n_embd"], seed=11)
    tc_xla = ToppConfig(entry_length=E, stop_token=13, extra_stop_token=764,
                        fused_attention=False)
    tc_fused = ToppConfig(entry_length=E, stop_token=13,
                          extra_stop_token=764, fused_attention=True,
                          fused_interpret=True)
    t1, l1 = jax.tree.map(
        np.asarray,
        greedy_topp_search(params, cfg, jnp.asarray(prefixes), tc_xla))
    t2, l2 = jax.tree.map(
        np.asarray,
        greedy_topp_search(params, cfg, jnp.asarray(prefixes), tc_fused))
    np.testing.assert_array_equal(l1, l2)
    np.testing.assert_array_equal(t1, t2)


def test_greedy_chunk_slot_write_matches_plain_path(models):
    """Greedy decode with the seq-major chunked slot-write kernel
    (production on TPU; interpret mode here) emits the same tokens as the
    plain DUS path, including the E -> 8-aligned cache padding and an
    entry_length crossing a chunk boundary."""
    tm, params, cfg = models
    K, E = 5, 11  # E % 8 != 0: exercises the pad; crosses chunk 0 -> 1
    prefixes = _random_prefixes(4, K, SMALL["n_embd"], seed=12)
    tc_plain = ToppConfig(entry_length=E, stop_token=13,
                          extra_stop_token=764, chunk_slot_write=False)
    tc_chunk = ToppConfig(entry_length=E, stop_token=13,
                          extra_stop_token=764, chunk_slot_write=True,
                          fused_interpret=True)
    t1, l1 = jax.tree.map(
        np.asarray,
        greedy_topp_search(params, cfg, jnp.asarray(prefixes), tc_plain))
    t2, l2 = jax.tree.map(
        np.asarray,
        greedy_topp_search(params, cfg, jnp.asarray(prefixes), tc_chunk))
    np.testing.assert_array_equal(l1, l2)
    np.testing.assert_array_equal(t1, t2)


@pytest.mark.parametrize("chunk_write,entry_length",
                         [(False, 12), (True, 12), (True, 40)])
@pytest.mark.slow
def test_beam_fused_attention_matches_xla_path(models, chunk_write,
                                               entry_length):
    """The PRODUCTION TPU beam config (lane beams + staged cache growth +
    fused row-major Pallas attention, with and without the chunked
    slot-write kernel — entry_length 40 crosses several 16-slot chunks
    and stage growths) run end-to-end in interpret mode on CPU emits the
    same captions as the XLA attention path."""
    tm, params, cfg = models
    K, E, R = 6, entry_length, 4
    prefixes = _random_prefixes(3, K, SMALL["n_embd"], seed=21)
    base = dict(beam_size=R, entry_length=E, stop_token=13,
                pallas_reorder=False)
    bc_xla = BeamConfig(fused_attention=False, chunk_slot_write=False,
                        **base)
    bc_fused = BeamConfig(fused_attention=True, fused_interpret=True,
                          chunk_slot_write=chunk_write, **base)
    r1 = jax.tree.map(np.asarray,
                      beam_search(params, cfg, jnp.asarray(prefixes), bc_xla))
    r2 = jax.tree.map(np.asarray,
                      beam_search(params, cfg, jnp.asarray(prefixes),
                                  bc_fused))
    np.testing.assert_array_equal(r1[0], r2[0])  # tokens
    np.testing.assert_array_equal(r1[1], r2[1])  # lengths
    np.testing.assert_allclose(r1[2], r2[2], atol=1e-4)  # scores
    np.testing.assert_array_equal(r1[3], r2[3])  # order


@pytest.mark.parametrize(
    "kv_int8", [False, pytest.param(True, marks=pytest.mark.slow)])
def test_beam_fused_unaligned_prefix_matches_xla_path(models, kv_int8):
    """Prefix length 4 — the K = 4 (mod 8) congruence class whose fused
    kernels CHECK-crash the XLA:TPU backend when unpadded (measured on
    v5e; gpt2.pad_prefix_cache docstring). The beam engine now 8-aligns
    the prefix cache at prefill and NEG_INF-masks the padded slots: the
    fused path must emit exactly the XLA path's captions. The int8
    variant (8-bit K/V, not bitwise vs fp) covers the quantize-after-pad
    ordering; on the tiny model its tokens still agree with the fp
    path almost everywhere."""
    tm, params, cfg = models
    K, E, R = 4, 12, 4
    prefixes = _random_prefixes(3, K, SMALL["n_embd"], seed=63)
    base = dict(beam_size=R, entry_length=E, stop_token=13,
                pallas_reorder=False)
    bc_xla = BeamConfig(fused_attention=False, chunk_slot_write=False,
                        **base)
    bc_fused = BeamConfig(fused_attention=True, fused_interpret=True,
                          kv_cache_int8=kv_int8, **base)
    r1 = jax.tree.map(np.asarray,
                      beam_search(params, cfg, jnp.asarray(prefixes),
                                  bc_xla))
    r2 = jax.tree.map(np.asarray,
                      beam_search(params, cfg, jnp.asarray(prefixes),
                                  bc_fused))
    if kv_int8:
        # int8 KV is not bitwise vs fp; on the tiny model tokens agree
        assert (r1[0] == r2[0]).mean() > 0.9
    else:
        np.testing.assert_array_equal(r1[0], r2[0])  # tokens
        np.testing.assert_array_equal(r1[1], r2[1])  # lengths
        np.testing.assert_allclose(r1[2], r2[2], atol=1e-4)  # scores
        np.testing.assert_array_equal(r1[3], r2[3])  # order


@pytest.mark.parametrize("kv_int8", [False, True])
@pytest.mark.slow
def test_beam_full_alloc_matches_staged_growth(models, kv_int8):
    """full_alloc (one full-size cache, stage-bounded e_cap reads in the
    fused kernels) is bit-identical to staged growth: the same slots are
    read either way, only the allocation strategy differs. Covers the
    bounded fork copy against a full-size cache (unwritten tails must
    never move or be read) and both cache dtypes. entry_length 40
    crosses several stage caps."""
    tm, params, cfg = models
    K, E, R = 6, 40, 4
    prefixes = _random_prefixes(3, K, SMALL["n_embd"], seed=47)
    base = dict(beam_size=R, entry_length=E, stop_token=13,
                fused_attention=True, fused_interpret=True,
                cache_stages=4, kv_cache_int8=kv_int8,
                pallas_reorder=True)
    bc_staged = BeamConfig(full_alloc=False, **base)
    bc_full = BeamConfig(full_alloc=True, bounded_fork_copy=True, **base)
    r1 = jax.tree.map(np.asarray,
                      beam_search(params, cfg, jnp.asarray(prefixes),
                                  bc_staged))
    r2 = jax.tree.map(np.asarray,
                      beam_search(params, cfg, jnp.asarray(prefixes),
                                  bc_full))
    np.testing.assert_array_equal(r1[0], r2[0])  # tokens
    np.testing.assert_array_equal(r1[1], r2[1])  # lengths
    np.testing.assert_allclose(r1[2], r2[2], rtol=0, atol=0)  # scores
    np.testing.assert_array_equal(r1[3], r2[3])  # order


@pytest.mark.slow
def test_beam_int8_kv_cache_agrees_with_fp_path(models):
    """Opt-in int8 KV cache (production serving knob): decodes valid
    captions whose tokens overwhelmingly agree with the bf16 path on the
    tiny model — 8-bit K/V quantization is the only difference. Exercises
    the quantized fused attention, quantizing chunk write, scale fork
    fix-up (via the non-pallas take path on CPU) and stage growth."""
    tm, params, cfg = models
    K, E, R = 6, 24, 4
    prefixes = _random_prefixes(3, K, SMALL["n_embd"], seed=31)
    base = dict(beam_size=R, entry_length=E, stop_token=13,
                pallas_reorder=False)
    bc_fp = BeamConfig(fused_attention=True, fused_interpret=True,
                       chunk_slot_write=False, **base)
    bc_q = BeamConfig(fused_attention=True, fused_interpret=True,
                      kv_cache_int8=True, **base)
    t_fp, l_fp, s_fp, o_fp = jax.tree.map(
        np.asarray, beam_search(params, cfg, jnp.asarray(prefixes), bc_fp))
    t_q, l_q, s_q, o_q = jax.tree.map(
        np.asarray, beam_search(params, cfg, jnp.asarray(prefixes), bc_q))
    assert t_q.shape == t_fp.shape
    assert np.isfinite(s_q).all()
    agree = (t_q == t_fp).mean()
    assert agree >= 0.8, f"token agreement {agree:.2%}"


@pytest.mark.slow
def test_greedy_int8_kv_cache_agrees_with_fp_path(models):
    """Opt-in int8 KV cache for greedy/top-p (XLA dequant path): valid
    tokens, overwhelming agreement with the exact path on the tiny model;
    crosses stage growths (entry_length 20 with default staging)."""
    tm, params, cfg = models
    K, E = 5, 20
    prefixes = _random_prefixes(4, K, SMALL["n_embd"], seed=33)
    tc_fp = ToppConfig(entry_length=E, stop_token=13, extra_stop_token=764)
    tc_q = ToppConfig(entry_length=E, stop_token=13, extra_stop_token=764,
                      kv_cache_int8=True)
    t1, l1 = jax.tree.map(
        np.asarray,
        greedy_topp_search(params, cfg, jnp.asarray(prefixes), tc_fp))
    t2, l2 = jax.tree.map(
        np.asarray,
        greedy_topp_search(params, cfg, jnp.asarray(prefixes), tc_q))
    assert t2.shape == t1.shape
    agree = (t1 == t2).mean()
    assert agree >= 0.8, f"token agreement {agree:.2%}"


def test_greedy_int8_rejects_incompatible_knobs(models):
    _, params, cfg = models
    prefixes = _random_prefixes(1, 4, SMALL["n_embd"], seed=1)
    # fused int8 needs the chunked kernel route
    tc = ToppConfig(entry_length=6, kv_cache_int8=True,
                    fused_attention=True, fused_slot_chunks=0)
    with pytest.raises(ValueError, match="fused_slot_chunks"):
        greedy_topp_search(params, cfg, jnp.asarray(prefixes), tc)
    # XLA-path int8 doesn't combine with the seq-major chunk write
    tc2 = ToppConfig(entry_length=6, kv_cache_int8=True,
                     fused_attention=False, chunk_slot_write=True)
    with pytest.raises(ValueError, match="chunk_slot_write"):
        greedy_topp_search(params, cfg, jnp.asarray(prefixes), tc2)


@pytest.mark.parametrize("stages", [1, 3])
@pytest.mark.slow
def test_beam_v3_slot_bounded_config_matches_xla_path(models, stages):
    """The v3 production config — slot-bounded chunked attention reads,
    bounded fork copies (pallas, interpret mode), chunked slot write,
    single full-size cache (stages=1) and staged (stages=3) — emits the
    same captions as the XLA attention path."""
    tm, params, cfg = models
    K, E, R = 6, 20, 4
    prefixes = _random_prefixes(3, K, SMALL["n_embd"], seed=41)
    bc_xla = BeamConfig(beam_size=R, entry_length=E, stop_token=13,
                        fused_attention=False, chunk_slot_write=False,
                        pallas_reorder=False)
    bc_v3 = BeamConfig(beam_size=R, entry_length=E, stop_token=13,
                       fused_attention=True, fused_interpret=True,
                       chunk_slot_write=True, fused_slot_chunks=8,
                       bounded_fork_copy=True, pallas_reorder=True,
                       cache_stages=stages)
    r1 = jax.tree.map(np.asarray,
                      beam_search(params, cfg, jnp.asarray(prefixes), bc_xla))
    r2 = jax.tree.map(np.asarray,
                      beam_search(params, cfg, jnp.asarray(prefixes), bc_v3))
    np.testing.assert_array_equal(r1[0], r2[0])  # tokens
    np.testing.assert_array_equal(r1[1], r2[1])  # lengths
    np.testing.assert_allclose(r1[2], r2[2], atol=1e-4)  # scores
    np.testing.assert_array_equal(r1[3], r2[3])  # order


@pytest.mark.slow
def test_beam_v3_int8_agrees_with_fp_path(models):
    """int8 KV + v3 slot-bounded kernel (chunked_q): valid captions with
    overwhelming token agreement vs the fp path."""
    tm, params, cfg = models
    K, E, R = 6, 24, 4
    prefixes = _random_prefixes(3, K, SMALL["n_embd"], seed=42)
    base = dict(beam_size=R, entry_length=E, stop_token=13,
                pallas_reorder=False)
    bc_fp = BeamConfig(fused_attention=True, fused_interpret=True,
                       chunk_slot_write=False, fused_slot_chunks=0, **base)
    bc_q3 = BeamConfig(fused_attention=True, fused_interpret=True,
                       kv_cache_int8=True, fused_slot_chunks=8, **base)
    t_fp, *_ = jax.tree.map(
        np.asarray, beam_search(params, cfg, jnp.asarray(prefixes), bc_fp))
    t_q, l_q, s_q, o_q = jax.tree.map(
        np.asarray, beam_search(params, cfg, jnp.asarray(prefixes), bc_q3))
    assert np.isfinite(s_q).all()
    agree = (t_q == t_fp).mean()
    assert agree >= 0.8, f"token agreement {agree:.2%}"


@pytest.mark.slow
def test_greedy_v3_slot_bounded_matches_xla_path(models):
    """Greedy decode through the v3 slot-bounded fused kernel (single
    full-size cache) == the XLA path's tokens."""
    tm, params, cfg = models
    K, E = 5, 18
    prefixes = _random_prefixes(4, K, SMALL["n_embd"], seed=43)
    tc_xla = ToppConfig(entry_length=E, stop_token=13, extra_stop_token=764,
                        fused_attention=False)
    tc_v3 = ToppConfig(entry_length=E, stop_token=13, extra_stop_token=764,
                       fused_attention=True, fused_interpret=True,
                       fused_slot_chunks=8, cache_stages=1)
    t1, l1 = jax.tree.map(
        np.asarray,
        greedy_topp_search(params, cfg, jnp.asarray(prefixes), tc_xla))
    t2, l2 = jax.tree.map(
        np.asarray,
        greedy_topp_search(params, cfg, jnp.asarray(prefixes), tc_v3))
    np.testing.assert_array_equal(l1, l2)
    np.testing.assert_array_equal(t1, t2)


@pytest.mark.slow
def test_beam_full_int8_with_prefix_agrees_with_fp_path(models):
    """Full-int8 serving path (generated + prefix caches): valid captions
    with overwhelming token agreement vs the fp path."""
    tm, params, cfg = models
    K, E, R = 6, 24, 4
    prefixes = _random_prefixes(3, K, SMALL["n_embd"], seed=51)
    base = dict(beam_size=R, entry_length=E, stop_token=13,
                pallas_reorder=False)
    bc_fp = BeamConfig(fused_attention=True, fused_interpret=True,
                       chunk_slot_write=False, fused_slot_chunks=0, **base)
    bc_q = BeamConfig(fused_attention=True, fused_interpret=True,
                      kv_cache_int8=True, fused_slot_chunks=8,
                      int8_prefix=True, **base)
    t_fp, *_ = jax.tree.map(
        np.asarray, beam_search(params, cfg, jnp.asarray(prefixes), bc_fp))
    t_q, l_q, s_q, o_q = jax.tree.map(
        np.asarray, beam_search(params, cfg, jnp.asarray(prefixes), bc_q))
    assert np.isfinite(s_q).all()
    agree = (t_q == t_fp).mean()
    assert agree >= 0.8, f"token agreement {agree:.2%}"


@pytest.mark.slow
def test_greedy_full_int8_fused_agrees_with_fp_path(models):
    """Greedy through the fused chunked int8 route (generated + prefix
    int8): valid tokens, overwhelming agreement with the exact path."""
    tm, params, cfg = models
    K, E = 5, 18
    prefixes = _random_prefixes(4, K, SMALL["n_embd"], seed=52)
    tc_fp = ToppConfig(entry_length=E, stop_token=13, extra_stop_token=764)
    tc_q = ToppConfig(entry_length=E, stop_token=13, extra_stop_token=764,
                      fused_attention=True, fused_interpret=True,
                      fused_slot_chunks=8, kv_cache_int8=True,
                      cache_stages=1)
    t1, l1 = jax.tree.map(
        np.asarray,
        greedy_topp_search(params, cfg, jnp.asarray(prefixes), tc_fp))
    t2, l2 = jax.tree.map(
        np.asarray,
        greedy_topp_search(params, cfg, jnp.asarray(prefixes), tc_q))
    agree = (t1 == t2).mean()
    assert agree >= 0.8, f"token agreement {agree:.2%}"


@pytest.mark.slow
def test_beam_fused_lm_head_matches_xla_path(models):
    """Fused LM-head + lse + top-R kernel: token-identical beams (the
    kernel's top-R is exact incl. lowest-index ties)."""
    tm, params, cfg = models
    K, E, R = 6, 16, 4
    prefixes = _random_prefixes(3, K, SMALL["n_embd"], seed=61)
    base = dict(beam_size=R, entry_length=E, stop_token=13,
                pallas_reorder=False, fused_attention=False,
                chunk_slot_write=False)
    bc_xla = BeamConfig(**base)
    bc_flm = BeamConfig(fused_lm_head=True, fused_interpret=True, **base)
    r1 = jax.tree.map(np.asarray,
                      beam_search(params, cfg, jnp.asarray(prefixes), bc_xla))
    r2 = jax.tree.map(np.asarray,
                      beam_search(params, cfg, jnp.asarray(prefixes),
                                  bc_flm))
    np.testing.assert_array_equal(r1[0], r2[0])  # tokens
    np.testing.assert_array_equal(r1[1], r2[1])  # lengths
    np.testing.assert_allclose(r1[2], r2[2], atol=1e-4)  # scores (lse order)
    np.testing.assert_array_equal(r1[3], r2[3])  # order


@pytest.mark.slow
def test_greedy_fused_lm_head_matches_xla_path(models):
    tm, params, cfg = models
    K, E = 5, 14
    prefixes = _random_prefixes(4, K, SMALL["n_embd"], seed=62)
    tc_xla = ToppConfig(entry_length=E, stop_token=13, extra_stop_token=764)
    tc_flm = ToppConfig(entry_length=E, stop_token=13, extra_stop_token=764,
                        fused_lm_head=True, fused_interpret=True)
    t1, l1 = jax.tree.map(
        np.asarray,
        greedy_topp_search(params, cfg, jnp.asarray(prefixes), tc_xla))
    t2, l2 = jax.tree.map(
        np.asarray,
        greedy_topp_search(params, cfg, jnp.asarray(prefixes), tc_flm))
    np.testing.assert_array_equal(l1, l2)
    np.testing.assert_array_equal(t1, t2)
    # guard: incompatible knobs rejected
    with pytest.raises(ValueError, match="fused_lm_head"):
        greedy_topp_search(params, cfg, jnp.asarray(prefixes),
                           ToppConfig(entry_length=4, fused_lm_head=True,
                                      sample=True))


def test_beam_top_texts_matches_ranked_first(models):
    """beam_top_texts (device-side rank-0 selection, used by serving and
    the eval runner) must equal `[t[0] for t in beam_texts(...)]`."""
    from capdec_tpu.decode import beam_texts, beam_top_texts
    from capdec_tpu.utils.tokenizer import ByteTokenizer
    _, params, cfg = models
    rng = np.random.RandomState(11)
    prefix = jnp.asarray(rng.randn(4, 3, SMALL["n_embd"]), jnp.float32)
    toks, lens, scores, order = beam_search(
        params, cfg, prefix, BeamConfig(beam_size=3, entry_length=7,
                                        stop_token=5))
    tok = ByteTokenizer()
    assert beam_top_texts(tok, toks, lens, order) == \
        [t[0] for t in beam_texts(tok, toks, lens, order)]


def test_auto_config_resolution(monkeypatch):
    """The None (auto) knobs resolve to the measured production configs:
    TPU -> fused attention v2 (slot_chunks=0) + fused LM head; CPU ->
    plain XLA paths with every Pallas knob off."""
    from capdec_tpu.decode import beam as beam_mod
    from capdec_tpu.decode import topp as topp_mod

    # this suite runs on the forced-CPU backend: autodetect is False
    bc = beam_mod.resolve_config(BeamConfig())
    assert bc.pallas_reorder is False
    assert bc.fused_attention is False
    assert bc.fused_lm_head is False
    tc = topp_mod.resolve_config(ToppConfig())
    assert tc.fused_attention is False and tc.fused_lm_head is False

    # simulated TPU: the round-3 production config
    monkeypatch.setattr(beam_mod, "pallas_autodetect", lambda: True)
    bc = beam_mod.resolve_config(BeamConfig())
    assert bc.pallas_reorder and bc.fused_attention and bc.chunk_slot_write
    assert bc.fused_slot_chunks == 0          # v3 rejected on hardware
    assert bc.full_alloc is True              # 252.5 -> 254.4 @512 (r4),
    #                                           kills the N=640 OOM cliff
    assert bc.bounded_fork_copy is True       # full-size rows: bound moves
    assert bc.fused_lm_head is True           # 232.8 -> 250.8 caps/s
    assert bc.cache_stages == 8
    # int8 KV keeps staged growth: 278.5 staged vs 265.7 full_alloc @512
    # (half-size cache — no OOM cliff for full_alloc to solve)
    bc_i8 = beam_mod.resolve_config(BeamConfig(kv_cache_int8=True))
    assert bc_i8.full_alloc is False and bc_i8.fused_attention
    # temperature != 1 forces the XLA logits path (kernel can't scale)
    bc_t = beam_mod.resolve_config(BeamConfig(temperature=0.7))
    assert bc_t.fused_lm_head is False
    tc = topp_mod.resolve_config(ToppConfig())
    assert tc.fused_attention is False        # XLA attention wins greedy
    assert tc.fused_lm_head is True           # 1444.6 -> 1478.3 caps/s
    tc_s = topp_mod.resolve_config(ToppConfig(sample=True))
    assert tc_s.fused_lm_head is False
