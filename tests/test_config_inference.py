"""Shape-driven config inference from reference-format checkpoints.

The reference never stores a config next to its `.pt` (train.py:367-371);
eval hardcodes architecture flags that must match by convention
(predictions_runner.py:436-460). `config_from_torch_state_dict` recovers
the architecture from shapes alone — these tests round-trip every mapper
family through the torch state_dict layout and require exact recovery.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from capdec_tpu.models import caption_model, gpt2


def _roundtrip(cfg):
    params = caption_model.init_params(jax.random.PRNGKey(0), cfg)
    sd = caption_model.params_to_torch_state_dict(params, cfg)
    return caption_model.config_from_torch_state_dict(sd)


@pytest.mark.slow  # full-size param init (~20 s); logic covered by the
#                    tiny-mapper matrix below
def test_infer_flagship_config():
    cfg = caption_model.CaptionModelConfig()  # RN50x4 transformer flagship
    assert _roundtrip(cfg) == cfg


@pytest.mark.parametrize("mapping_type", ["mlp", "transformer",
                                          "transformer_decoder",
                                          "mapping_network"])
def test_infer_tiny_configs_all_mappers(mapping_type):
    cfg = caption_model.CaptionModelConfig(
        prefix_length=8, clip_length=8, prefix_size=64,
        num_layers=3 if mapping_type in ("transformer",
                                         "transformer_decoder") else
        (2 if mapping_type == "mlp" else 7),
        mapping_type=mapping_type,
        gpt2=gpt2.GPT2Config(vocab_size=1000, n_positions=128, n_embd=64,
                             n_layer=2, n_head=1))
    got = _roundtrip(cfg)
    if mapping_type == "transformer_decoder":
        # dim_ref defaults to 512 in both configs; inference reads it
        # from the encoder layer norms
        assert got == cfg
    else:
        assert got == cfg


def test_infer_vit_prefix_dim():
    """ViT-B/32 checkpoints have prefix_size 512 (train.py:445).

    Only the prefix_size inference is under test — the GPT-2 trunk is
    tiny to keep this in the fast tier."""
    cfg = caption_model.CaptionModelConfig(
        prefix_size=512, num_layers=2, prefix_length=10, clip_length=10,
        gpt2=gpt2.GPT2Config(vocab_size=1000, n_positions=128, n_embd=64,
                             n_layer=2, n_head=1))
    got = _roundtrip(cfg)
    assert got.prefix_size == 512
    assert got == cfg


@pytest.mark.slow
def test_gpt2_config_inference_standard_sizes():
    """n_head recovery relies on GPT-2's universal head_dim 64."""
    for n_embd, n_layer, n_head in ((768, 2, 12), (1024, 2, 16)):
        cfg = gpt2.GPT2Config(vocab_size=300, n_positions=96, n_embd=n_embd,
                              n_layer=n_layer, n_head=n_head)
        params = gpt2.init_params(jax.random.PRNGKey(0), cfg)
        sd = gpt2.params_to_torch_state_dict(params, prefix="gpt.")
        got = gpt2.config_from_torch_state_dict(sd, prefix="gpt.")
        assert (got.vocab_size, got.n_positions, got.n_embd, got.n_layer,
                got.n_head) == (300, 96, n_embd, n_layer, n_head)


@pytest.mark.slow  # builds + exports both CLIP towers twice (~25 s)
def test_clip_openai_state_dict_roundtrip():
    """params -> OpenAI layout -> params is exact, and the architecture
    is recoverable from the exported shapes (both towers)."""
    from capdec_tpu.models import clip as clip_lib

    rn_cfg = clip_lib.CLIPConfig(
        "tiny-rn",
        clip_lib.CLIPTextConfig(vocab_size=100, context_length=16, width=64,
                                heads=1, layers=2, embed_dim=32),
        clip_lib.CLIPResNetConfig(layers=(1, 1, 1, 1), width=8,
                                  image_resolution=64, embed_dim=32))
    vit_cfg = clip_lib.CLIPConfig(
        "tiny-vit",
        clip_lib.CLIPTextConfig(vocab_size=100, context_length=16, width=64,
                                heads=1, layers=2, embed_dim=32),
        clip_lib.CLIPViTConfig(image_resolution=32, patch_size=16, width=64,
                               layers=2, heads=1, embed_dim=32))
    for cfg in (rn_cfg, vit_cfg):
        key = jax.random.PRNGKey(3)
        if cfg.is_resnet:
            visual = clip_lib.init_resnet_params(key, cfg.vision)
        else:
            visual = clip_lib.init_vit_params(key, cfg.vision)
        params = {"text": clip_lib.init_text_params(key, cfg.text),
                  "visual": visual}
        sd = clip_lib.params_to_openai_state_dict(params, cfg)
        assert clip_lib.config_from_openai_state_dict(sd, cfg.name) == cfg
        back = clip_lib.params_from_openai_state_dict(sd, cfg)
        jax.tree.map(
            lambda a, b: np.testing.assert_array_equal(np.asarray(a),
                                                       np.asarray(b)),
            params, back)


def test_analytic_train_flops():
    """utils/flops.py: linear in batch; flagship bs=120 step is ~6.3
    TFLOP (the hand count that exposed XLA cost_analysis under-reporting
    ~15x on the bench backend)."""
    from capdec_tpu.utils.flops import train_step_matmul_flops

    cfg = caption_model.CaptionModelConfig(only_prefix=True)
    f30 = train_step_matmul_flops(cfg, 30, 40)
    f120 = train_step_matmul_flops(cfg, 120, 40)
    assert abs(f120 / f30 - 4.0) < 1e-6
    assert 5e12 < f120 < 8e12
    # unfrozen GPT-2 costs more (dW matmuls + trained head)
    cfg_full = caption_model.CaptionModelConfig(only_prefix=False)
    assert train_step_matmul_flops(cfg_full, 30, 40) > f30
    # every mapper family has an accounting path
    for mt in ("mlp", "transformer_decoder", "mapping_network"):
        c = caption_model.CaptionModelConfig(mapping_type=mt)
        assert train_step_matmul_flops(c, 30, 40) > 0
