"""Config round-trip (reference load_model contract) and Orbax resume."""
import numpy as np

import jax

from capdec_tpu.models import caption_model, gpt2
from capdec_tpu.train import optim as optim_lib
from capdec_tpu.train import resume as resume_lib
from capdec_tpu.train import step as step_lib
from capdec_tpu.utils import checkpoint as ckpt_lib
from capdec_tpu.utils import config_io
import pytest


def tiny_cfg():
    return caption_model.CaptionModelConfig(
        prefix_length=3, clip_length=3, prefix_size=8, num_layers=1,
        mapping_type="mlp",
        gpt2=gpt2.GPT2Config(vocab_size=50, n_positions=32, n_embd=16,
                             n_layer=1, n_head=2))


def test_save_load_config_and_model(tmp_path):
    out = str(tmp_path)
    args = {"out_dir": out, "prefix": "testrun", "prefix_length": 3,
            "prefix_length_clip": 3, "prefix_size": 8, "num_layers": 1,
            "mapping_type": "mlp", "only_prefix": False}
    cfg_path = config_io.save_config(args, out, "testrun")

    cfg = tiny_cfg()
    params = caption_model.init_params(jax.random.PRNGKey(0), cfg)
    ckpt_lib.save_caption_checkpoint(
        params, cfg, ckpt_lib.epoch_checkpoint_path(out, "testrun", 7))

    loaded = config_io.load_config(cfg_path)
    assert loaded["prefix_length"] == 3
    mc = config_io.model_config_from_args(loaded)
    assert mc.prefix_length == 3 and mc.mapping_type == "mlp"

    # load_model finds `-007` via the int form; but the gpt2 cfg differs, so
    # only check the file-resolution path with the real tiny cfg
    params2 = ckpt_lib.load_caption_checkpoint(
        ckpt_lib.epoch_checkpoint_path(out, "testrun", 7), cfg)
    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(params2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


@pytest.mark.slow
def test_orbax_full_state_resume(tmp_path):
    cfg = tiny_cfg()
    params = caption_model.init_params(jax.random.PRNGKey(1), cfg)
    tx = optim_lib.make_optimizer(1e-3, 0, 100)
    state = step_lib.init_train_state(params, tx)
    step = step_lib.make_train_step(cfg, tx, step_lib.NoiseConfig(0.01),
                                    donate=False)
    rng = np.random.RandomState(0)
    import jax.numpy as jnp
    batch = {
        "tokens": jnp.asarray(rng.randint(1, 50, (4, 6)), jnp.int32),
        "mask": jnp.ones((4, 3 + 6), jnp.float32),
        "prefix": jnp.asarray(rng.randn(4, 8), jnp.float32),
    }
    for i in range(3):
        state, _ = step(state, batch, jax.random.PRNGKey(i))
    path = resume_lib.save_train_state(state, str(tmp_path), step=3)

    template = step_lib.init_train_state(
        caption_model.init_params(jax.random.PRNGKey(2), cfg), tx)
    restored = resume_lib.restore_train_state(path, template)
    assert int(restored["step"]) == 3
    for a, b in zip(jax.tree.leaves(state["params"]),
                    jax.tree.leaves(restored["params"])):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-7)
    # resumed training continues bit-identically
    s1, l1 = step(state, batch, jax.random.PRNGKey(9))
    s2, l2 = step(restored, batch, jax.random.PRNGKey(9))
    np.testing.assert_allclose(float(l1), float(l2), atol=1e-7)
    assert resume_lib.latest_state_path(str(tmp_path)) == path


@pytest.mark.slow
def test_loop_kill_and_resume_matches_uninterrupted(tmp_path):
    """A run stopped mid-epoch by max_steps and resumed via resume=True
    reproduces the uninterrupted run's parameters and loss curve exactly
    (VERDICT r1 item 4: resume wired through the loop, not just the lib)."""
    from capdec_tpu.data import dataset as data_lib
    from capdec_tpu.train import loop as loop_lib
    from capdec_tpu.utils.tokenizer import ByteTokenizer
    from test_integration import TINY, make_corpus

    data_path = str(tmp_path / "corpus.pkl")
    make_corpus(data_path, n=48)
    tok = ByteTokenizer()
    ds = data_lib.load_caption_dataset(data_path, TINY.prefix_length, tok)
    noise = None

    def run(out, **kw):
        from capdec_tpu.train import step as step_lib
        cfg = loop_lib.TrainLoopConfig(
            epochs=3, batch_size=16, lr=2e-3, warmup_steps=0, save_every=10,
            out_dir=str(tmp_path / out), prefix="t", log_every=1, seed=3,
            **kw)
        return loop_lib.train(TINY, cfg, ds,
                              step_lib.NoiseConfig(variance=0.01))

    full = run("full")                        # 3 epochs x 3 steps = 9 steps
    run("split", max_steps=4)                 # killed mid-epoch 1
    resumed = run("split", resume=True)       # finishes epochs 1-2

    for a, b in zip(jax.tree.leaves(full["params"]),
                    jax.tree.leaves(resumed["params"])):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=0,
                                   rtol=0)
    # the ENTIRE loss curve reproduces bit-exactly, including the killed
    # epoch: its pre-kill per-step losses ride the loss sidecar saved
    # with the train state (loop.py save_sidecar), so the epoch-end mean
    # reduces the same f32 vector as the uninterrupted run.
    np.testing.assert_allclose(full["loss_per_epoch"]["train"],
                               resumed["loss_per_epoch"]["train"],
                               atol=0, rtol=0)
