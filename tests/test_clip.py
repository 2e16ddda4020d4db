"""CLIP encoder parity tests.

Text & ViT oracles: HuggingFace CLIPTextModelWithProjection /
CLIPVisionModelWithProjection (random init, offline) with weights mapped
into the OpenAI state_dict naming our converter consumes. ResNet oracle: a
minimal torch replica of CLIP's ModifiedResNet written here (the openai
`clip` package is not installed in this environment).
"""
import numpy as np
import pytest

import jax.numpy as jnp

from capdec_tpu.models import clip as clip_lib

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")


def _text_sd_from_hf(m):
    """HF CLIPTextModelWithProjection -> OpenAI-style state_dict keys."""
    sd = m.state_dict()
    out = {
        "token_embedding.weight": sd["text_model.embeddings.token_embedding.weight"],
        "positional_embedding": sd["text_model.embeddings.position_embedding.weight"],
        "ln_final.weight": sd["text_model.final_layer_norm.weight"],
        "ln_final.bias": sd["text_model.final_layer_norm.bias"],
        "text_projection": sd["text_projection.weight"].T,
    }
    i = 0
    while f"text_model.encoder.layers.{i}.layer_norm1.weight" in sd:
        b = f"text_model.encoder.layers.{i}"
        o = f"transformer.resblocks.{i}"
        out[f"{o}.attn.in_proj_weight"] = torch.cat(
            [sd[f"{b}.self_attn.q_proj.weight"],
             sd[f"{b}.self_attn.k_proj.weight"],
             sd[f"{b}.self_attn.v_proj.weight"]], dim=0)
        out[f"{o}.attn.in_proj_bias"] = torch.cat(
            [sd[f"{b}.self_attn.q_proj.bias"],
             sd[f"{b}.self_attn.k_proj.bias"],
             sd[f"{b}.self_attn.v_proj.bias"]], dim=0)
        out[f"{o}.attn.out_proj.weight"] = sd[f"{b}.self_attn.out_proj.weight"]
        out[f"{o}.attn.out_proj.bias"] = sd[f"{b}.self_attn.out_proj.bias"]
        out[f"{o}.ln_1.weight"] = sd[f"{b}.layer_norm1.weight"]
        out[f"{o}.ln_1.bias"] = sd[f"{b}.layer_norm1.bias"]
        out[f"{o}.ln_2.weight"] = sd[f"{b}.layer_norm2.weight"]
        out[f"{o}.ln_2.bias"] = sd[f"{b}.layer_norm2.bias"]
        out[f"{o}.mlp.c_fc.weight"] = sd[f"{b}.mlp.fc1.weight"]
        out[f"{o}.mlp.c_fc.bias"] = sd[f"{b}.mlp.fc1.bias"]
        out[f"{o}.mlp.c_proj.weight"] = sd[f"{b}.mlp.fc2.weight"]
        out[f"{o}.mlp.c_proj.bias"] = sd[f"{b}.mlp.fc2.bias"]
        i += 1
    return out


def test_text_encoder_parity():
    torch.manual_seed(0)
    V, W, L, Hd, E, CTX = 63, 32, 2, 4, 20, 16
    hf_cfg = transformers.CLIPTextConfig(
        vocab_size=V, hidden_size=W, intermediate_size=4 * W,
        num_hidden_layers=L, num_attention_heads=Hd,
        max_position_embeddings=CTX, hidden_act="quick_gelu",
        projection_dim=E, eos_token_id=V - 1)
    hf = transformers.CLIPTextModelWithProjection(hf_cfg).eval()

    cfg = clip_lib.CLIPTextConfig(vocab_size=V, context_length=CTX, width=W,
                                  heads=Hd, layers=L, embed_dim=E)
    sd = _text_sd_from_hf(hf)
    full_cfg = clip_lib.CLIPConfig("tiny", cfg, clip_lib.CLIPViTConfig())
    # build text params via the shared converter path
    params = clip_lib.params_from_openai_state_dict(
        {**sd, **_dummy_vit_sd(clip_lib.CLIPViTConfig(16, 8, 16, 1, 2, 4))},
        clip_lib.CLIPConfig("tiny", cfg, clip_lib.CLIPViTConfig(16, 8, 16, 1, 2, 4)))

    rng = np.random.RandomState(0)
    tokens = rng.randint(1, V - 1, size=(3, CTX))
    tokens[:, 0] = 0
    tokens[0, 5:] = 0
    tokens[0, 5] = V - 1   # eos == max id at position 5
    tokens[1, -1] = V - 1
    tokens[2, 10] = V - 1
    tokens[2, 11:] = 0
    with torch.no_grad():
        ref = hf(input_ids=torch.tensor(tokens)).text_embeds.numpy()
    got = np.asarray(clip_lib.encode_text(params["text"], cfg,
                                          jnp.asarray(tokens)))
    np.testing.assert_allclose(got, ref, atol=2e-4, rtol=2e-4)


def _dummy_vit_sd(vcfg):
    """Minimal visual.* keys so the combined converter can run."""
    W, P, R = vcfg.width, vcfg.patch_size, vcfg.image_resolution
    n = (R // P) ** 2 + 1
    sd = {
        "visual.conv1.weight": torch.zeros(W, 3, P, P),
        "visual.class_embedding": torch.zeros(W),
        "visual.positional_embedding": torch.zeros(n, W),
        "visual.ln_pre.weight": torch.ones(W), "visual.ln_pre.bias": torch.zeros(W),
        "visual.ln_post.weight": torch.ones(W), "visual.ln_post.bias": torch.zeros(W),
        "visual.proj": torch.zeros(W, vcfg.embed_dim),
    }
    for i in range(vcfg.layers):
        b = f"visual.transformer.resblocks.{i}"
        sd[f"{b}.attn.in_proj_weight"] = torch.zeros(3 * W, W)
        sd[f"{b}.attn.in_proj_bias"] = torch.zeros(3 * W)
        sd[f"{b}.attn.out_proj.weight"] = torch.zeros(W, W)
        sd[f"{b}.attn.out_proj.bias"] = torch.zeros(W)
        sd[f"{b}.ln_1.weight"] = torch.ones(W)
        sd[f"{b}.ln_1.bias"] = torch.zeros(W)
        sd[f"{b}.ln_2.weight"] = torch.ones(W)
        sd[f"{b}.ln_2.bias"] = torch.zeros(W)
        sd[f"{b}.mlp.c_fc.weight"] = torch.zeros(4 * W, W)
        sd[f"{b}.mlp.c_fc.bias"] = torch.zeros(4 * W)
        sd[f"{b}.mlp.c_proj.weight"] = torch.zeros(W, 4 * W)
        sd[f"{b}.mlp.c_proj.bias"] = torch.zeros(W)
    return sd


def test_vit_encoder_parity():
    torch.manual_seed(1)
    R, P, W, L, Hd, E = 32, 8, 24, 2, 4, 16
    hf_cfg = transformers.CLIPVisionConfig(
        image_size=R, patch_size=P, hidden_size=W, intermediate_size=4 * W,
        num_hidden_layers=L, num_attention_heads=Hd, hidden_act="quick_gelu",
        projection_dim=E)
    hf = transformers.CLIPVisionModelWithProjection(hf_cfg).eval()
    sd_hf = hf.state_dict()

    sd = {
        "visual.conv1.weight": sd_hf["vision_model.embeddings.patch_embedding.weight"],
        "visual.class_embedding": sd_hf["vision_model.embeddings.class_embedding"],
        "visual.positional_embedding": sd_hf["vision_model.embeddings.position_embedding.weight"],
        "visual.ln_pre.weight": sd_hf["vision_model.pre_layrnorm.weight"],
        "visual.ln_pre.bias": sd_hf["vision_model.pre_layrnorm.bias"],
        "visual.ln_post.weight": sd_hf["vision_model.post_layernorm.weight"],
        "visual.ln_post.bias": sd_hf["vision_model.post_layernorm.bias"],
        "visual.proj": sd_hf["visual_projection.weight"].T,
    }
    for i in range(L):
        b = f"vision_model.encoder.layers.{i}"
        o = f"visual.transformer.resblocks.{i}"
        sd[f"{o}.attn.in_proj_weight"] = torch.cat(
            [sd_hf[f"{b}.self_attn.q_proj.weight"],
             sd_hf[f"{b}.self_attn.k_proj.weight"],
             sd_hf[f"{b}.self_attn.v_proj.weight"]], dim=0)
        sd[f"{o}.attn.in_proj_bias"] = torch.cat(
            [sd_hf[f"{b}.self_attn.q_proj.bias"],
             sd_hf[f"{b}.self_attn.k_proj.bias"],
             sd_hf[f"{b}.self_attn.v_proj.bias"]], dim=0)
        sd[f"{o}.attn.out_proj.weight"] = sd_hf[f"{b}.self_attn.out_proj.weight"]
        sd[f"{o}.attn.out_proj.bias"] = sd_hf[f"{b}.self_attn.out_proj.bias"]
        sd[f"{o}.ln_1.weight"] = sd_hf[f"{b}.layer_norm1.weight"]
        sd[f"{o}.ln_1.bias"] = sd_hf[f"{b}.layer_norm1.bias"]
        sd[f"{o}.ln_2.weight"] = sd_hf[f"{b}.layer_norm2.weight"]
        sd[f"{o}.ln_2.bias"] = sd_hf[f"{b}.layer_norm2.bias"]
        sd[f"{o}.mlp.c_fc.weight"] = sd_hf[f"{b}.mlp.fc1.weight"]
        sd[f"{o}.mlp.c_fc.bias"] = sd_hf[f"{b}.mlp.fc1.bias"]
        sd[f"{o}.mlp.c_proj.weight"] = sd_hf[f"{b}.mlp.fc2.weight"]
        sd[f"{o}.mlp.c_proj.bias"] = sd_hf[f"{b}.mlp.fc2.bias"]

    tcfg = clip_lib.CLIPTextConfig(vocab_size=20, context_length=8, width=8,
                                   heads=2, layers=1, embed_dim=E)
    # dummy text keys for the combined converter
    sd.update({
        "token_embedding.weight": torch.zeros(20, 8),
        "positional_embedding": torch.zeros(8, 8),
        "ln_final.weight": torch.ones(8), "ln_final.bias": torch.zeros(8),
        "text_projection": torch.zeros(8, E),
        "transformer.resblocks.0.attn.in_proj_weight": torch.zeros(24, 8),
        "transformer.resblocks.0.attn.in_proj_bias": torch.zeros(24),
        "transformer.resblocks.0.attn.out_proj.weight": torch.zeros(8, 8),
        "transformer.resblocks.0.attn.out_proj.bias": torch.zeros(8),
        "transformer.resblocks.0.ln_1.weight": torch.ones(8),
        "transformer.resblocks.0.ln_1.bias": torch.zeros(8),
        "transformer.resblocks.0.ln_2.weight": torch.ones(8),
        "transformer.resblocks.0.ln_2.bias": torch.zeros(8),
        "transformer.resblocks.0.mlp.c_fc.weight": torch.zeros(32, 8),
        "transformer.resblocks.0.mlp.c_fc.bias": torch.zeros(32),
        "transformer.resblocks.0.mlp.c_proj.weight": torch.zeros(8, 32),
        "transformer.resblocks.0.mlp.c_proj.bias": torch.zeros(8),
    })
    vcfg = clip_lib.CLIPViTConfig(R, P, W, L, Hd, E)
    cfg = clip_lib.CLIPConfig("tiny-vit", tcfg, vcfg)
    params = clip_lib.params_from_openai_state_dict(sd, cfg)

    imgs = np.random.RandomState(2).randn(2, R, R, 3).astype(np.float32)
    with torch.no_grad():
        ref = hf(pixel_values=torch.tensor(
            imgs.transpose(0, 3, 1, 2))).image_embeds.numpy()
    got = np.asarray(clip_lib.encode_image_vit(params["visual"], vcfg,
                                               jnp.asarray(imgs)))
    np.testing.assert_allclose(got, ref, atol=3e-4, rtol=3e-4)


# ---------------------------------------------------------------------------
# Modified-ResNet oracle (torch, test-only)
# ---------------------------------------------------------------------------


class _TorchBottleneck(torch.nn.Module):
    expansion = 4

    def __init__(self, inplanes, planes, stride=1):
        super().__init__()
        nn = torch.nn
        self.conv1 = nn.Conv2d(inplanes, planes, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(planes)
        self.conv2 = nn.Conv2d(planes, planes, 3, padding=1, bias=False)
        self.bn2 = nn.BatchNorm2d(planes)
        self.avgpool = nn.AvgPool2d(stride) if stride > 1 else nn.Identity()
        self.conv3 = nn.Conv2d(planes, planes * 4, 1, bias=False)
        self.bn3 = nn.BatchNorm2d(planes * 4)
        self.relu = nn.ReLU(inplace=True)
        self.downsample = None
        self.stride = stride
        if stride > 1 or inplanes != planes * 4:
            self.downsample = nn.Sequential(
                nn.AvgPool2d(stride) if stride > 1 else nn.Identity(),
                nn.Conv2d(inplanes, planes * 4, 1, stride=1, bias=False),
                nn.BatchNorm2d(planes * 4))

    def forward(self, x):
        identity = x
        out = self.relu(self.bn1(self.conv1(x)))
        out = self.relu(self.bn2(self.conv2(out)))
        out = self.avgpool(out)
        out = self.bn3(self.conv3(out))
        if self.downsample is not None:
            identity = self.downsample(x)
        return self.relu(out + identity)


class _TorchAttnPool(torch.nn.Module):
    def __init__(self, spacial_dim, embed_dim, num_heads, output_dim):
        super().__init__()
        nn = torch.nn
        self.positional_embedding = nn.Parameter(
            torch.randn(spacial_dim ** 2 + 1, embed_dim) / embed_dim ** 0.5)
        self.k_proj = nn.Linear(embed_dim, embed_dim)
        self.q_proj = nn.Linear(embed_dim, embed_dim)
        self.v_proj = nn.Linear(embed_dim, embed_dim)
        self.c_proj = nn.Linear(embed_dim, output_dim)
        self.num_heads = num_heads

    def forward(self, x):
        x = x.flatten(start_dim=2).permute(2, 0, 1)
        x = torch.cat([x.mean(dim=0, keepdim=True), x], dim=0)
        x = x + self.positional_embedding[:, None, :]
        x, _ = torch.nn.functional.multi_head_attention_forward(
            query=x[:1], key=x, value=x,
            embed_dim_to_check=x.shape[-1], num_heads=self.num_heads,
            q_proj_weight=self.q_proj.weight, k_proj_weight=self.k_proj.weight,
            v_proj_weight=self.v_proj.weight, in_proj_weight=None,
            in_proj_bias=torch.cat([self.q_proj.bias, self.k_proj.bias,
                                    self.v_proj.bias]),
            bias_k=None, bias_v=None, add_zero_attn=False, dropout_p=0,
            out_proj_weight=self.c_proj.weight, out_proj_bias=self.c_proj.bias,
            use_separate_proj_weight=True, training=False, need_weights=False)
        return x.squeeze(0)


class _TorchModifiedResNet(torch.nn.Module):
    def __init__(self, layers, width, input_resolution, output_dim, heads):
        super().__init__()
        nn = torch.nn
        self.conv1 = nn.Conv2d(3, width // 2, 3, stride=2, padding=1, bias=False)
        self.bn1 = nn.BatchNorm2d(width // 2)
        self.conv2 = nn.Conv2d(width // 2, width // 2, 3, padding=1, bias=False)
        self.bn2 = nn.BatchNorm2d(width // 2)
        self.conv3 = nn.Conv2d(width // 2, width, 3, padding=1, bias=False)
        self.bn3 = nn.BatchNorm2d(width)
        self.avgpool = nn.AvgPool2d(2)
        self.relu = nn.ReLU(inplace=True)
        self._inplanes = width
        self.layer1 = self._make_layer(width, layers[0])
        self.layer2 = self._make_layer(width * 2, layers[1], stride=2)
        self.layer3 = self._make_layer(width * 4, layers[2], stride=2)
        self.layer4 = self._make_layer(width * 8, layers[3], stride=2)
        embed_dim = width * 32
        self.attnpool = _TorchAttnPool(input_resolution // 32, embed_dim,
                                       heads, output_dim)

    def _make_layer(self, planes, blocks, stride=1):
        layers = [_TorchBottleneck(self._inplanes, planes, stride)]
        self._inplanes = planes * 4
        for _ in range(1, blocks):
            layers.append(_TorchBottleneck(self._inplanes, planes))
        return torch.nn.Sequential(*layers)

    def forward(self, x):
        for conv, bn in [(self.conv1, self.bn1), (self.conv2, self.bn2),
                         (self.conv3, self.bn3)]:
            x = self.relu(bn(conv(x)))
        x = self.avgpool(x)
        x = self.layer1(x)
        x = self.layer2(x)
        x = self.layer3(x)
        x = self.layer4(x)
        return self.attnpool(x)


def test_resnet_encoder_parity():
    torch.manual_seed(3)
    layers, width, res, out_dim = (1, 1, 1, 1), 16, 64, 24
    heads = width * 32 // 64
    net = _TorchModifiedResNet(layers, width, res, out_dim, heads).eval()
    sd = {f"visual.{k}": v for k, v in net.state_dict().items()}

    vcfg = clip_lib.CLIPResNetConfig(layers, width, res, out_dim)
    # visual-only conversion: reuse the combined path with dummy text keys
    tcfg = clip_lib.CLIPTextConfig(vocab_size=10, context_length=4, width=8,
                                   heads=2, layers=1, embed_dim=out_dim)
    sd.update({"token_embedding.weight": torch.zeros(10, 8),
               "positional_embedding": torch.zeros(4, 8),
               "ln_final.weight": torch.ones(8),
               "ln_final.bias": torch.zeros(8),
               "text_projection": torch.zeros(8, out_dim),
               "transformer.resblocks.0.attn.in_proj_weight": torch.zeros(24, 8),
               "transformer.resblocks.0.attn.in_proj_bias": torch.zeros(24),
               "transformer.resblocks.0.attn.out_proj.weight": torch.zeros(8, 8),
               "transformer.resblocks.0.attn.out_proj.bias": torch.zeros(8),
               "transformer.resblocks.0.ln_1.weight": torch.ones(8),
               "transformer.resblocks.0.ln_1.bias": torch.zeros(8),
               "transformer.resblocks.0.ln_2.weight": torch.ones(8),
               "transformer.resblocks.0.ln_2.bias": torch.zeros(8),
               "transformer.resblocks.0.mlp.c_fc.weight": torch.zeros(32, 8),
               "transformer.resblocks.0.mlp.c_fc.bias": torch.zeros(32),
               "transformer.resblocks.0.mlp.c_proj.weight": torch.zeros(8, 32),
               "transformer.resblocks.0.mlp.c_proj.bias": torch.zeros(8)})
    cfg = clip_lib.CLIPConfig("tiny-rn", tcfg, vcfg)
    params = clip_lib.params_from_openai_state_dict(sd, cfg)

    imgs = np.random.RandomState(4).randn(2, res, res, 3).astype(np.float32)
    with torch.no_grad():
        ref = net(torch.tensor(imgs.transpose(0, 3, 1, 2))).numpy()
    got = np.asarray(clip_lib.encode_image_resnet(params["visual"], vcfg,
                                                  jnp.asarray(imgs)))
    np.testing.assert_allclose(got, ref, atol=3e-4, rtol=3e-4)


@pytest.mark.slow
def test_random_init_towers_run_finite():
    """init_vit_params / init_resnet_params build the same topology the
    converter emits (tiny configs) and encode to finite embeddings."""
    import jax
    vcfg = clip_lib.CLIPViTConfig(image_resolution=64, patch_size=32,
                                  width=64, layers=2, heads=4, embed_dim=32)
    vp = clip_lib.init_vit_params(jax.random.PRNGKey(0), vcfg)
    out = clip_lib.encode_image_vit(vp, vcfg, jnp.zeros((2, 64, 64, 3)))
    assert out.shape == (2, 32)
    assert np.isfinite(np.asarray(out)).all()

    rcfg = clip_lib.CLIPResNetConfig(layers=(1, 1, 1, 1), width=16,
                                     image_resolution=64, embed_dim=32)
    rp = clip_lib.init_resnet_params(jax.random.PRNGKey(1), rcfg)
    out = clip_lib.encode_image_resnet(rp, rcfg,
                                       jnp.ones((2, 64, 64, 3)) * 0.1)
    assert out.shape == (2, 32)
    assert np.isfinite(np.asarray(out)).all()


def test_config_inference_from_state_dict_shapes():
    """`config_from_openai_state_dict` recovers each zoo backbone's config
    from checkpoint shapes alone — the same contract as OpenAI's
    `clip.model.build_model`, which the reference relies on via
    `clip.load` (predictions_runner.py:157)."""
    def text_keys(t):
        sd = {"text_projection": np.zeros((t.width, t.embed_dim)),
              "token_embedding.weight": np.zeros((t.vocab_size, t.width)),
              "positional_embedding": np.zeros((t.context_length, t.width)),
              "ln_final.weight": np.zeros((t.width,))}
        for i in range(t.layers):
            sd[f"transformer.resblocks.{i}.ln_1.weight"] = np.zeros((t.width,))
        return sd

    for name, cfg in clip_lib.MODEL_CONFIGS.items():
        sd = text_keys(cfg.text)
        v = cfg.vision
        if cfg.is_resnet:
            for b, n in enumerate(v.layers, start=1):
                for i in range(n):
                    sd[f"visual.layer{b}.{i}.conv1.weight"] = np.zeros(
                        (v.width * 2 ** (b - 1) if b > 1 else v.width, 1, 1, 1))
            sd["visual.layer1.0.conv1.weight"] = np.zeros((v.width, 1, 1, 1))
            hw = v.image_resolution // 32
            sd["visual.attnpool.positional_embedding"] = np.zeros(
                (hw * hw + 1, v.width * 8))
        else:
            sd["visual.proj"] = np.zeros((v.width, v.embed_dim))
            sd["visual.conv1.weight"] = np.zeros(
                (v.width, 3, v.patch_size, v.patch_size))
            grid = v.image_resolution // v.patch_size
            sd["visual.positional_embedding"] = np.zeros(
                (grid * grid + 1, v.width))
            for i in range(v.layers):
                sd[f"visual.transformer.resblocks.{i}.ln_1.weight"] = (
                    np.zeros((v.width,)))
        got = clip_lib.config_from_openai_state_dict(sd, name)
        assert got == cfg, f"{name}: inferred {got}"
