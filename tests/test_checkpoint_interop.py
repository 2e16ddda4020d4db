"""Reference-checkpoint interop: assemble a .pt with the exact key structure
of a published CapDec checkpoint (`gpt.*` from a torch GPT2LMHeadModel +
`clip_project.*` from the reference TransformerMapper), save it with
torch.save, load it through the framework, and require logit parity of the
full caption model."""
import os
import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from capdec_tpu.models import caption_model, gpt2
from capdec_tpu.utils import checkpoint as ckpt_lib

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

REF = "/root/reference"


@pytest.mark.skipif(not os.path.isdir(REF), reason="reference not available")
@pytest.mark.slow
def test_reference_checkpoint_round_trip(tmp_path):
    sys.path.insert(0, REF)
    import transformer_mapper

    torch.manual_seed(0)
    SMALL = dict(vocab_size=97, n_positions=96, n_embd=48, n_layer=2, n_head=4)
    hf = transformers.GPT2LMHeadModel(transformers.GPT2Config(
        vocab_size=SMALL["vocab_size"], n_positions=SMALL["n_positions"],
        n_embd=SMALL["n_embd"], n_layer=SMALL["n_layer"],
        n_head=SMALL["n_head"], attn_pdrop=0.0, embd_pdrop=0.0,
        resid_pdrop=0.0)).eval()
    K, C, DC, NL = 5, 4, 16, 2
    mapper = transformer_mapper.TransformerMapper(
        DC, SMALL["n_embd"], K, C, num_layers=NL).eval()

    # exact reference key structure (train.py state_dict: gpt.*, clip_project.*)
    sd = {f"gpt.{k}": v for k, v in hf.state_dict().items()}
    sd.update({f"clip_project.{k}": v for k, v in mapper.state_dict().items()})
    path = str(tmp_path / "coco_prefix-009.pt")
    torch.save(sd, path)

    cfg = caption_model.CaptionModelConfig(
        prefix_length=K, clip_length=C, prefix_size=DC, num_layers=NL,
        mapping_type="transformer", gpt2=gpt2.GPT2Config(**SMALL))
    params = ckpt_lib.load_caption_checkpoint(path, cfg)

    rng = np.random.RandomState(0)
    tokens = rng.randint(1, SMALL["vocab_size"], size=(2, 7))
    prefix = rng.randn(2, DC).astype(np.float32)
    mask = np.ones((2, K + 7), np.float32)

    with torch.no_grad():
        pe = mapper(torch.tensor(prefix)).view(2, K, -1)
        te = hf.transformer.wte(torch.tensor(tokens))
        cat = torch.cat([pe, te], dim=1)
        ref = hf(inputs_embeds=cat,
                 attention_mask=torch.tensor(mask)).logits.numpy()

    got = np.asarray(caption_model.forward(params, cfg, jnp.asarray(tokens),
                                           jnp.asarray(prefix),
                                           jnp.asarray(mask)))
    np.testing.assert_allclose(got, ref, atol=3e-4, rtol=3e-4)

    # and back: our save produces a state_dict torch can consume key-for-key
    out_path = str(tmp_path / "resaved.pt")
    ckpt_lib.save_caption_checkpoint(params, cfg, out_path)
    back = torch.load(out_path, weights_only=True)
    missing = set(sd) - set(back)
    assert not missing, missing
    for k in sd:
        np.testing.assert_allclose(back[k].numpy(), sd[k].numpy(),
                                   atol=1e-6, err_msg=k)
