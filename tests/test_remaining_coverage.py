"""Coverage for remaining paths: train loop over a mesh, config_io
load_model, batched image encoding with missing files, prefix editing."""
import json
import os
import pickle

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from capdec_tpu.models import caption_model, gpt2

TINY = caption_model.CaptionModelConfig(
    prefix_length=3, clip_length=3, prefix_size=8, num_layers=1,
    mapping_type="mlp",
    # vocab must cover ByteTokenizer's 0..255 id range
    gpt2=gpt2.GPT2Config(vocab_size=256, n_positions=48, n_embd=16,
                         n_layer=1, n_head=2))


def _corpus(path, n=32, dim=8):
    rng = np.random.RandomState(0)
    caps = [{"caption": f"cap {i % 3}.", "image_id": i, "id": i,
             "clip_embedding": i} for i in range(n)]
    with open(path, "wb") as f:
        pickle.dump({"clip_embedding": rng.randn(n, dim).astype(np.float32),
                     "captions": caps,
                     "clip_embedding_text_dave":
                         rng.randn(n, dim).astype(np.float32)}, f)


@pytest.mark.slow
def test_train_loop_with_mesh(tmp_path):
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    from capdec_tpu.data import dataset as data_lib
    from capdec_tpu.parallel import mesh as mesh_lib
    from capdec_tpu.train import loop as loop_lib
    from capdec_tpu.train import step as step_lib
    from capdec_tpu.utils.tokenizer import ByteTokenizer

    data = str(tmp_path / "c.pkl")
    _corpus(data)
    ds = data_lib.load_caption_dataset(data, TINY.prefix_length,
                                       ByteTokenizer())
    mesh = mesh_lib.make_mesh(dp=4, tp=2)
    out = loop_lib.train(
        TINY,
        loop_lib.TrainLoopConfig(epochs=2, batch_size=8, lr=1e-3,
                                 warmup_steps=0, out_dir=str(tmp_path / "o"),
                                 prefix="meshy", log_every=1000),
        ds, step_lib.NoiseConfig(variance=0.01), mesh=mesh)
    losses = out["loss_per_epoch"]["train"]
    assert losses[-1] < losses[0]
    assert os.path.isfile(str(tmp_path / "o" / "meshy-001.pt"))


def test_config_io_load_model(tmp_path):
    from capdec_tpu.utils import checkpoint as ckpt_lib
    from capdec_tpu.utils import config_io

    out = str(tmp_path)
    args = {"out_dir": out, "prefix": "lm", "prefix_length": 3,
            "prefix_length_clip": 3, "prefix_size": 8, "num_layers": 1,
            "mapping_type": "mlp", "only_prefix": True}
    cfg_path = config_io.save_config(args, out, "lm")
    # no weights yet -> params None
    params, cfg = config_io.load_model(cfg_path, "_latest")
    assert params is None and cfg.only_prefix
    # write _latest with the matching gpt2 size (reference load_model
    # reconstructs the default GPT-2; here we check file resolution only)
    src = caption_model.init_params(jax.random.PRNGKey(0), TINY)
    ckpt_lib.save_caption_checkpoint(
        src, TINY, ckpt_lib.latest_checkpoint_path(out, "lm"))
    # int epoch form resolves `-{epoch:03d}`
    ckpt_lib.save_caption_checkpoint(
        src, TINY, ckpt_lib.epoch_checkpoint_path(out, "lm", 4))
    assert os.path.isfile(os.path.join(out, "lm-004.pt"))


def test_encode_images_batched_with_missing(tmp_path):
    PIL = pytest.importorskip("PIL")
    from PIL import Image
    from capdec_tpu.data import embeddings as emb_lib

    for i in range(3):
        Image.new("RGB", (40, 30), (i * 40, 10, 200)).save(
            str(tmp_path / f"img{i}.jpg"))
    records = [{"image_id": i, "filename": f"img{i}.jpg"} for i in range(3)]
    records.append({"image_id": 9, "filename": "missing.jpg"})

    def encode_fn(batch):  # fake encoder: mean pixel per channel
        return np.asarray(batch).mean(axis=(1, 2))

    embeds, kept, not_found = emb_lib.encode_images_batched(
        records, lambda d: str(tmp_path / d["filename"]), encode_fn,
        n_px=16, batch_size=2, progress=False)
    assert not_found == 1
    assert len(kept) == 3
    assert embeds.shape == (3, 3)


@pytest.mark.slow
def test_prefix_editing_loops():
    from capdec_tpu.eval import prefix_tools
    from capdec_tpu.utils.tokenizer import ByteTokenizer

    params = caption_model.init_params(jax.random.PRNGKey(1), TINY)
    tok = ByteTokenizer()
    pe = jnp.zeros((1, 2, 16))
    outs = prefix_tools.try_all_places(params, TINY, "z", pe, tok,
                                       use_beam=False)
    assert len(outs) == 2 and all(isinstance(o, str) for o in outs)
    single = prefix_tools.re_caption(params, TINY, "z", pe, tok, 0,
                                     use_beam=False)
    assert isinstance(single, str)
