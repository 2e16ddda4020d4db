"""Logit parity of the JAX GPT-2 against HuggingFace's torch implementation.

Strategy (offline-safe): build a randomly initialized torch GPT2LMHeadModel
from a small GPT2Config (no download), convert its state_dict into our
params pytree, and require logits to match to ~1e-4 on fixed inputs — the
gate demanded by SURVEY.md §7 step 1.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from capdec_tpu.models import gpt2

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")


SMALL = dict(vocab_size=97, n_positions=64, n_embd=48, n_layer=3, n_head=4)


@pytest.fixture(scope="module")
def torch_model():
    torch.manual_seed(0)
    hf_cfg = transformers.GPT2Config(
        vocab_size=SMALL["vocab_size"], n_positions=SMALL["n_positions"],
        n_embd=SMALL["n_embd"], n_layer=SMALL["n_layer"], n_head=SMALL["n_head"],
        attn_pdrop=0.0, embd_pdrop=0.0, resid_pdrop=0.0,
    )
    model = transformers.GPT2LMHeadModel(hf_cfg)
    model.eval()
    return model


@pytest.fixture(scope="module")
def jax_params(torch_model):
    cfg = gpt2.GPT2Config(**SMALL)
    return gpt2.params_from_torch_state_dict(torch_model.state_dict(), cfg), cfg


def test_logits_match_token_input(torch_model, jax_params):
    params, cfg = jax_params
    rng = np.random.RandomState(1)
    tokens = rng.randint(0, SMALL["vocab_size"], size=(2, 17))
    with torch.no_grad():
        ref = torch_model(input_ids=torch.tensor(tokens)).logits.numpy()
    embeds = gpt2.embed_tokens(params, jnp.asarray(tokens))
    got = np.asarray(gpt2.forward(params, cfg, embeds))
    np.testing.assert_allclose(got, ref, atol=2e-4, rtol=2e-4)


def test_logits_match_inputs_embeds_with_mask(torch_model, jax_params):
    """The CapDec forward path: prefix embeddings + token embeddings with a
    key mask that zeroes padded positions (reference train.py:251-260)."""
    params, cfg = jax_params
    rng = np.random.RandomState(2)
    B, K, T, D = 2, 5, 9, SMALL["n_embd"]
    prefix = rng.randn(B, K, D).astype(np.float32) * 0.02
    tokens = rng.randint(1, SMALL["vocab_size"], size=(B, T))
    tokens[0, -3:] = 0  # padded tail
    mask = np.concatenate(
        [np.ones((B, K), np.float32), (tokens > 0).astype(np.float32)], axis=1)

    with torch.no_grad():
        tok_embeds = torch_model.transformer.wte(torch.tensor(tokens))
        cat = torch.cat([torch.tensor(prefix), tok_embeds], dim=1)
        ref = torch_model(inputs_embeds=cat,
                          attention_mask=torch.tensor(mask)).logits.numpy()

    embeds = jnp.concatenate(
        [jnp.asarray(prefix), gpt2.embed_tokens(params, jnp.asarray(tokens))], axis=1)
    got = np.asarray(gpt2.forward(params, cfg, embeds, jnp.asarray(mask)))

    # Only positions whose *query* is valid need to match: HF recomputes
    # garbage at padded queries exactly like we do, but allow them to differ.
    valid = mask > 0
    np.testing.assert_allclose(got[valid], ref[valid], atol=2e-4, rtol=2e-4)


def test_cached_decode_matches_full_forward(jax_params):
    """Prefill + per-token cached decode == full forward on the same tokens."""
    params, cfg = jax_params
    rng = np.random.RandomState(3)
    B, P, T = 2, 6, 5
    S_max = P + T
    prefix = jnp.asarray(rng.randn(B, P, SMALL["n_embd"]).astype(np.float32) * 0.02)
    tokens = jnp.asarray(rng.randint(0, SMALL["vocab_size"], size=(B, T)))

    full_embeds = jnp.concatenate(
        [prefix, gpt2.embed_tokens(params, tokens)], axis=1)
    ref_logits = gpt2.forward(params, cfg, full_embeds)

    cache = gpt2.init_kv_cache(cfg, B, S_max)
    logits, cache = gpt2.forward_with_cache(params, cfg, prefix, cache,
                                            jnp.asarray(0))
    np.testing.assert_allclose(np.asarray(logits), np.asarray(ref_logits[:, :P]),
                               atol=1e-4, rtol=1e-4)
    for t in range(T):
        step_embed = gpt2.embed_tokens(params, tokens[:, t:t + 1])
        logits, cache = gpt2.forward_with_cache(params, cfg, step_embed, cache,
                                                jnp.asarray(P + t))
        np.testing.assert_allclose(np.asarray(logits[:, 0]),
                                   np.asarray(ref_logits[:, P + t]),
                                   atol=1e-4, rtol=1e-4)


def test_state_dict_round_trip(torch_model, jax_params):
    params, cfg = jax_params
    sd = gpt2.params_to_torch_state_dict(params)
    ref_sd = torch_model.state_dict()
    for k, v in sd.items():
        np.testing.assert_array_equal(v, ref_sd[k].numpy(), err_msg=k)


def test_reorder_kv_cache():
    cfg = gpt2.GPT2Config(**SMALL)
    cache = gpt2.init_kv_cache(cfg, 4, 8)
    cache = {"k": cache["k"] + jnp.arange(4)[None, :, None, None, None],
             "v": cache["v"]}
    src = jnp.asarray([3, 3, 0, 1])
    out = gpt2.reorder_kv_cache(cache, src)
    np.testing.assert_array_equal(np.asarray(out["k"][0, :, 0, 0, 0]),
                                  [3.0, 3.0, 0.0, 1.0])


def test_per_row_attention_bias_is_batch_leading(jax_params):
    """A 3-D attention_bias [B, T, T] is per-ROW (batch leading,
    broadcast over heads): each row's hidden states must equal a
    separate forward with that row's own 2-D bias. Guards the expansion
    rule — prepending ([1, B, T, T]) would silently apply row i's mask
    to head i whenever B happens to equal n_head."""
    params, cfg = jax_params
    rng = np.random.RandomState(11)
    B, T = 2, 8
    x = jnp.asarray(rng.randn(B, T, SMALL["n_embd"]), jnp.float32)
    causal = jnp.where(jnp.tril(jnp.ones((T, T), jnp.bool_)), 0.0,
                       gpt2.NEG_INF)
    blockdiag = jnp.where(
        jnp.kron(jnp.eye(2, dtype=jnp.int8),
                 jnp.tril(jnp.ones((T // 2, T // 2), jnp.int8))) > 0,
        0.0, gpt2.NEG_INF)
    per_row = jnp.stack([causal, blockdiag])            # [B, T, T]
    h_batched = gpt2.forward_hidden(params, cfg, x, attention_bias=per_row)
    for i, bias2d in enumerate((causal, blockdiag)):
        h_solo = gpt2.forward_hidden(params, cfg, x[i:i + 1],
                                     attention_bias=bias2d)
        np.testing.assert_allclose(np.asarray(h_batched[i]),
                                   np.asarray(h_solo[0]), rtol=0, atol=2e-5)


def test_packed_forward_matches_per_segment(jax_params):
    """Sequence-packing plumbing (forward_hidden attention_bias +
    positions): P segments packed into one row with a block-diagonal
    causal bias and per-segment position reset produce the SAME hidden
    states as running the segments as separate rows."""
    params, cfg = jax_params
    rng = np.random.RandomState(7)
    B, P, L = 2, 2, 9
    segs = jnp.asarray(rng.randn(B * P, L, SMALL["n_embd"]), jnp.float32)

    flat_hidden = gpt2.forward_hidden(params, cfg, segs)

    packed = segs.reshape(B, P * L, SMALL["n_embd"])
    blk = jnp.tril(jnp.ones((L, L), jnp.int8))
    bias = jnp.where(jnp.kron(jnp.eye(P, dtype=jnp.int8), blk) > 0,
                     0.0, gpt2.NEG_INF)
    positions = jnp.tile(jnp.arange(L), P)
    packed_hidden = gpt2.forward_hidden(params, cfg, packed,
                                        attention_bias=bias,
                                        positions=positions)
    np.testing.assert_allclose(
        np.asarray(packed_hidden.reshape(B * P, L, -1)),
        np.asarray(flat_hidden), rtol=0, atol=2e-5)


def test_attention_bias_composes_with_key_mask(jax_params):
    """attention_bias (packing) + attention_mask (padding) compose: a
    padded key is removed from attention in every segment."""
    params, cfg = jax_params
    rng = np.random.RandomState(8)
    L = 6
    seg = jnp.asarray(rng.randn(1, L, SMALL["n_embd"]), jnp.float32)
    key_mask = jnp.asarray([[1, 1, 1, 1, 0, 0]], jnp.float32)

    # default causal path with the key mask
    want = gpt2.forward_hidden(params, cfg, seg, key_mask)
    # identical causal bias passed explicitly must give the same result
    causal = jnp.tril(jnp.ones((L, L), jnp.int8))
    bias = jnp.where(causal > 0, 0.0, gpt2.NEG_INF)
    got = gpt2.forward_hidden(params, cfg, seg, key_mask,
                              attention_bias=bias,
                              positions=jnp.arange(L))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=0, atol=1e-6)
