"""Mapper parity tests.

Golden oracle: the *actual reference implementation* at /root/reference
(pure-torch modules only; no GPT-2 download needed). We build the torch
mapper, convert its state_dict through our converter, and require output
parity. Skipped when the reference checkout is unavailable.
"""
import os
import sys

import numpy as np
import pytest

import jax.numpy as jnp

from capdec_tpu.models import mappers

torch = pytest.importorskip("torch")

REF = "/root/reference"
HAS_REF = os.path.isdir(REF)


def _to_jax(sd_module, cfg):
    sd = {f"clip_project.{k}": v for k, v in sd_module.state_dict().items()}
    return mappers.mapper_from_torch_state_dict(sd, cfg)


@pytest.fixture(scope="module")
def ref_mod():
    if not HAS_REF:
        pytest.skip("reference checkout not available")
    sys.path.insert(0, REF)
    import transformer_mapper  # noqa
    return transformer_mapper


def test_transformer_mapper_parity(ref_mod):
    torch.manual_seed(0)
    K, C, DC, NL = 7, 5, 33, 3
    net = ref_mod.TransformerMapper(DC, 768, K, C, num_layers=NL).eval()
    cfg = mappers.MapperConfig(mapping_type="transformer", dim_clip=DC,
                               prefix_length=K, clip_length=C, num_layers=NL)
    params = _to_jax(net, cfg)
    x = np.random.RandomState(0).randn(4, DC).astype(np.float32)
    with torch.no_grad():
        ref = net(torch.tensor(x)).numpy()
    got = np.asarray(mappers.apply_mapper(params, cfg, jnp.asarray(x)))
    np.testing.assert_allclose(got, ref, atol=2e-4, rtol=2e-4)


def test_transformer_enc_dec_parity(ref_mod):
    torch.manual_seed(1)
    K, C, DC, NL = 6, 4, 48, 2
    net = ref_mod.TransformerEncoderDecoder(DC, 768, K, C, num_layers=NL).eval()
    cfg = mappers.MapperConfig(mapping_type="transformer_decoder", dim_clip=DC,
                               prefix_length=K, clip_length=C, num_layers=NL)
    params = _to_jax(net, cfg)
    x = np.random.RandomState(1).randn(3, DC).astype(np.float32)
    with torch.no_grad():
        ref = net(torch.tensor(x)).numpy()
    got = np.asarray(mappers.apply_mapper(params, cfg, jnp.asarray(x)))
    np.testing.assert_allclose(got, ref, atol=2e-4, rtol=2e-4)


def test_mlp_mapper_parity():
    """MLP parity against a plain torch Sequential (no reference needed)."""
    torch.manual_seed(2)
    DC, K, D = 16, 3, 24
    sizes = (DC, (D * K) // 2, D * K)
    net = torch.nn.Sequential(
        torch.nn.Linear(sizes[0], sizes[1]), torch.nn.Tanh(),
        torch.nn.Linear(sizes[1], sizes[2])).eval()
    sd = {f"clip_project.model.{k}": v for k, v in net.state_dict().items()}
    cfg = mappers.MapperConfig(mapping_type="mlp", dim_clip=DC, dim_embedding=D,
                               prefix_length=K)
    params = mappers.mapper_from_torch_state_dict(sd, cfg)
    x = np.random.RandomState(3).randn(5, DC).astype(np.float32)
    with torch.no_grad():
        ref = net(torch.tensor(x)).numpy().reshape(5, K, D)
    got = np.asarray(mappers.apply_mapper(params, cfg, jnp.asarray(x)))
    np.testing.assert_allclose(got, ref, atol=1e-5, rtol=1e-5)


@pytest.mark.parametrize("mtype", ["mlp", "transformer", "transformer_decoder",
                                   "mapping_network"])
@pytest.mark.slow
def test_round_trip_and_shapes(mtype):
    import jax
    cfg = mappers.MapperConfig(mapping_type=mtype, dim_clip=20, dim_embedding=16,
                               prefix_length=5, clip_length=4, num_layers=2,
                               num_heads=4, enc_dec_dim_ref=8)
    params = mappers.init_mapper(jax.random.PRNGKey(0), cfg)
    x = jnp.ones((2, 20))
    out = mappers.apply_mapper(params, cfg, x)
    assert out.shape == (2, 5, 16)

    sd = mappers.mapper_to_torch_state_dict(params, cfg)
    back = mappers.mapper_from_torch_state_dict(sd, cfg)
    flat_a = jax.tree.leaves(params)
    flat_b = jax.tree.leaves(back)
    for a, b in zip(flat_a, flat_b):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)
