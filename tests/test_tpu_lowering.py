"""TPU-lowering regression tests — no TPU required.

Interpret-mode kernel tests (the rest of the suite) execute kernel
*semantics* on CPU but skip Mosaic's hardware lowering checks, so a
BlockSpec that violates the TPU memref tiling rules (last two block dims
divisible by (8, 128) or equal to the array dims) passes CI and then
fails on the chip. That exact failure shipped once: full_alloc's
e_cap-bounded reads blocked the int8 scales arrays — slot dim LAST — by
the stage cap, and every `--int8` bench section died in
`pallas_call_tpu_lowering_rule` while 200+ CPU tests were green.

`jax.export` with platforms=["tpu"] runs the real Mosaic lowering on a
CPU host. These tests export every production kernel configuration —
the fused attention kernels standalone plus the full beam/greedy
engines with the knobs `resolve_config` picks on TPU hardware — so a
lowering break in ANY production path fails in CI, not in the driver's
bench run.
"""
import functools

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from capdec_tpu.decode import BeamConfig, ToppConfig
from capdec_tpu.models import gpt2
from capdec_tpu.ops import decode_attention as da

D, HD, L, K = 768, 64, 2, 40  # flagship widths; 2 layers lower fast
R, NI = 5, 4                  # beams per image, images
B = R * NI
E_PAD = 72                    # 67-step entry length, 8-aligned


def _export_tpu(fn, *args):
    """Lower `fn(*args)` for the TPU platform on this CPU host; any
    Mosaic BlockSpec/tiling violation raises here exactly as it would
    in the chip's pallas_call lowering."""
    return jax.export.export(jax.jit(fn), platforms=["tpu"])(*args)


@pytest.fixture(scope="module")
def attn_operands():
    rng = np.random.RandomState(0)
    ops = dict(
        q=jnp.asarray(rng.randn(B, D), jnp.float32),
        kn=jnp.asarray(rng.randn(B, D), jnp.float32),
        vn=jnp.asarray(rng.randn(B, D), jnp.float32),
        pk=jnp.asarray(rng.randn(L, NI, K, D), jnp.bfloat16),
        pv=jnp.asarray(rng.randn(L, NI, K, D), jnp.bfloat16),
        gk=jnp.asarray(rng.randn(B, L, E_PAD, D), jnp.bfloat16),
        gv=jnp.asarray(rng.randn(B, L, E_PAD, D), jnp.bfloat16),
        gk8=jnp.asarray(rng.randint(-127, 127, (B, L, E_PAD, D)), jnp.int8),
        gv8=jnp.asarray(rng.randint(-127, 127, (B, L, E_PAD, D)), jnp.int8),
        gks=jnp.asarray(rng.rand(B, L, 1, E_PAD), jnp.float32),
        gvs=jnp.asarray(rng.rand(B, L, 1, E_PAD), jnp.float32),
        pks=jnp.asarray(rng.rand(L, NI, 1, K), jnp.float32),
        pvs=jnp.asarray(rng.rand(L, NI, 1, K), jnp.float32),
        pk8=jnp.asarray(rng.randint(-127, 127, (L, NI, K, D)), jnp.int8),
        pv8=jnp.asarray(rng.randint(-127, 127, (L, NI, K, D)), jnp.int8),
        step=jnp.asarray(9, jnp.int32),
        layer=jnp.asarray(0, jnp.int32),
    )
    return ops


# every stage bucket the production default (cache_stages=8, E_pad=72)
# produces as an e_cap, plus the unbounded full read
E_CAPS = [None, 16, 24, 32, 40, 48, 56, 64, 72]


@pytest.mark.parametrize("e_cap", E_CAPS)
def test_rowmajor_exact_lowers(attn_operands, e_cap):
    o = attn_operands
    fn = functools.partial(da.beam_decode_attention_rowmajor,
                           beams_per_image=R, head_dim=HD, e_cap=e_cap)
    _export_tpu(fn, o["q"], o["kn"], o["vn"], o["pk"], o["pv"],
                o["gk"], o["gv"], o["step"], o["layer"])


@pytest.mark.parametrize("e_cap", E_CAPS)
def test_rowmajor_int8_lowers(attn_operands, e_cap):
    """The round-4 regression: int8 scales arrays have the slot dim LAST
    and an e_cap-sized last-dim block violates Mosaic tiling."""
    o = attn_operands
    fn = functools.partial(da.beam_decode_attention_rowmajor_q,
                           beams_per_image=R, head_dim=HD, e_cap=e_cap)
    _export_tpu(fn, o["q"], o["kn"], o["vn"], o["pk"], o["pv"],
                o["gk8"], o["gv8"], o["gks"], o["gvs"],
                o["step"], o["layer"])


def test_rowmajor_padded_prefix_lowers(attn_operands):
    """Padded-prefix configuration (k_true < K): the masking iota/where
    must lower with the kernel. NOTE jax.export cannot reproduce the
    underlying XLA:TPU backend CHECK (lower_to_llo) that unpadded
    K = 4 mod 8 prefixes trigger on hardware — that envelope is pinned
    by measurement in gpt2.pad_prefix_cache's docstring and guarded by
    the engine's prefill-time padding; this test locks the Mosaic layer
    of the fix."""
    o = attn_operands
    fn = functools.partial(da.beam_decode_attention_rowmajor,
                           beams_per_image=R, head_dim=HD, k_true=K - 4)
    _export_tpu(fn, o["q"], o["kn"], o["vn"], o["pk"], o["pv"],
                o["gk"], o["gv"], o["step"], o["layer"])
    fn_q = functools.partial(da.beam_decode_attention_rowmajor_q,
                             beams_per_image=R, head_dim=HD, k_true=K - 4)
    _export_tpu(fn_q, o["q"], o["kn"], o["vn"], o["pk"], o["pv"],
                o["gk8"], o["gv8"], o["gks"], o["gvs"],
                o["step"], o["layer"])


def test_chunked_exact_lowers(attn_operands):
    o = attn_operands
    fn = functools.partial(da.beam_decode_attention_chunked,
                           beams_per_image=R, head_dim=HD, chunk=8)
    _export_tpu(fn, o["q"], o["kn"], o["vn"], o["pk"], o["pv"],
                o["gk"], o["gv"], o["step"], o["layer"])


@pytest.mark.parametrize("int8_prefix", [False, True])
def test_chunked_int8_lowers(attn_operands, int8_prefix):
    o = attn_operands
    pk, pv = (o["pk8"], o["pv8"]) if int8_prefix else (o["pk"], o["pv"])
    kw = dict(pks=o["pks"], pvs=o["pvs"]) if int8_prefix else {}
    fn = functools.partial(da.beam_decode_attention_chunked_q,
                           beams_per_image=R, head_dim=HD, chunk=8, **kw)
    _export_tpu(fn, o["q"], o["kn"], o["vn"], pk, pv,
                o["gk8"], o["gv8"], o["gks"], o["gvs"],
                o["step"], o["layer"])


# ---------------------------------------------------------------------------
# Whole-engine lowering with the knobs resolve_config picks ON TPU
# (pallas_reorder=True pins the platform autodetect; everything else
# derives exactly as on hardware: fused attention v2 + chunked slot
# write + full_alloc e_cap reads + bounded fork copy + fused LM head).
# ---------------------------------------------------------------------------

ENGINE_CFG = gpt2.GPT2Config(vocab_size=50257, n_positions=1024,
                             n_embd=D, n_layer=L, n_head=12)


@pytest.fixture(scope="module")
def engine_setup():
    params = gpt2.init_params(jax.random.PRNGKey(0), ENGINE_CFG)
    prefix = jnp.asarray(
        np.random.RandomState(1).randn(NI, K, D), jnp.float32)
    return params, prefix


@pytest.mark.parametrize("knobs", [
    dict(),                                          # exact production path
    dict(kv_cache_int8=True),                        # int8 KV (serving knob)
    dict(kv_cache_int8=True, full_alloc=True),       # int8 + explicit e_cap
    dict(fused_slot_chunks=8, cache_stages=1),       # v3 chunked, opt-in
    dict(fused_slot_chunks=8, cache_stages=1,
         kv_cache_int8=True),                        # v3 + int8 (+int8 prefix)
], ids=["exact", "int8", "int8-full-alloc", "v3", "v3-int8"])
def test_beam_engine_lowers_for_tpu(engine_setup, knobs):
    from capdec_tpu.decode.beam import beam_search, resolve_config
    params, prefix = engine_setup
    bc = resolve_config(BeamConfig(beam_size=R, entry_length=67,
                                   pallas_reorder=True, **knobs),
                        ENGINE_CFG)
    assert bc.fused_attention and bc.fused_lm_head  # TPU production knobs
    if not knobs:
        assert bc.full_alloc and bc.chunk_slot_write and bc.bounded_fork_copy
    _export_tpu(lambda p, x: beam_search(p, ENGINE_CFG, x, bc)[0],
                params, prefix)


def test_greedy_engine_lowers_for_tpu(engine_setup):
    from capdec_tpu.decode.topp import greedy_topp_search, resolve_config
    params, prefix = engine_setup
    # greedy production config: XLA attention + fused LM head (topp.py
    # resolve table); force the fused LM head on as on hardware
    tc = resolve_config(ToppConfig(entry_length=67, fused_lm_head=True),
                        ENGINE_CFG)
    _export_tpu(lambda p, x: greedy_topp_search(p, ENGINE_CFG, x, tc)[0],
                params, prefix)
