"""Train-step tests: loss falls, only_prefix freezes GPT-2, schedule parity,
and dp×tp mesh sharding reproduces single-device results (8 CPU devices)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from capdec_tpu.models import caption_model, gpt2
from capdec_tpu.parallel import mesh as mesh_lib
from capdec_tpu.train import optim as optim_lib
from capdec_tpu.train import step as step_lib

TINY_GPT = gpt2.GPT2Config(vocab_size=101, n_positions=64, n_embd=32,
                           n_layer=2, n_head=4)


def tiny_cfg(**kw):
    return caption_model.CaptionModelConfig(
        prefix_length=4, clip_length=4, prefix_size=16, num_layers=2,
        mapping_type=kw.pop("mapping_type", "mlp"), gpt2=TINY_GPT, **kw)


def make_batch(rng, bs=8, T=10, cfg=None):
    tokens = rng.randint(1, TINY_GPT.vocab_size, size=(bs, T)).astype(np.int32)
    tokens[:, -2:] = 0
    mask = np.concatenate([np.ones((bs, cfg.prefix_length), np.float32),
                           (tokens > 0).astype(np.float32)], axis=1)
    prefix = rng.randn(bs, cfg.prefix_size).astype(np.float32)
    return {"tokens": jnp.asarray(tokens), "mask": jnp.asarray(mask),
            "prefix": jnp.asarray(prefix)}


def test_loss_decreases():
    cfg = tiny_cfg()
    params = caption_model.init_params(jax.random.PRNGKey(0), cfg)
    tx = optim_lib.make_optimizer(1e-3, warmup_steps=0, total_steps=1000)
    state = step_lib.init_train_state(params, tx)
    step = step_lib.make_train_step(cfg, tx,
                                    step_lib.NoiseConfig(variance=0.016))
    batch = make_batch(np.random.RandomState(0), cfg=cfg)
    losses = []
    for i in range(25):
        state, loss = step(state, batch, jax.random.PRNGKey(i))
        losses.append(float(loss))
    assert losses[-1] < losses[0] * 0.8, losses


def test_only_prefix_freezes_gpt():
    cfg = tiny_cfg(only_prefix=True)
    params = caption_model.init_params(jax.random.PRNGKey(1), cfg)
    mask = caption_model.trainable_mask(params, cfg)
    tx = optim_lib.make_optimizer(1e-3, 0, 100, trainable_mask=mask)
    state = step_lib.init_train_state(params, tx)
    step = step_lib.make_train_step(cfg, tx, step_lib.NoiseConfig(), donate=False)
    batch = make_batch(np.random.RandomState(1), cfg=cfg)
    orig_gpt = jax.tree.map(np.asarray, params["gpt"])
    orig_map = jax.tree.map(np.asarray, params["clip_project"])
    for i in range(3):
        state, _ = step(state, batch, jax.random.PRNGKey(i))
    for a, b in zip(jax.tree.leaves(orig_gpt),
                    jax.tree.leaves(state["params"]["gpt"])):
        np.testing.assert_array_equal(a, np.asarray(b))
    changed = any(not np.allclose(a, np.asarray(b)) for a, b in
                  zip(jax.tree.leaves(orig_map),
                      jax.tree.leaves(state["params"]["clip_project"])))
    assert changed


def test_schedule_matches_hf():
    transformers = pytest.importorskip("transformers")
    torch = pytest.importorskip("torch")
    lr, warm, total = 2e-5, 7, 50
    sched = optim_lib.linear_warmup_schedule(lr, warm, total)
    model = torch.nn.Linear(2, 2)
    opt = torch.optim.AdamW(model.parameters(), lr=lr)
    hf = transformers.get_linear_schedule_with_warmup(opt, warm, total)
    for step in range(total + 5):
        ref = opt.param_groups[0]["lr"]
        got = float(sched(step))
        assert abs(got - ref) < 1e-9, (step, got, ref)
        hf.step()


@pytest.mark.parametrize("dp,tp", [(8, 1), (4, 2), (2, 4)])
@pytest.mark.slow
def test_mesh_sharded_step_matches_single_device(dp, tp):
    """dp-scaling sweep (1..8-way data parallel) x Megatron tp: every
    mesh shape reproduces the single-device step bit-for-tolerance
    (VERDICT r2 item 7 — exercise the sharding rules beyond one shape)."""
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    cfg = tiny_cfg(mapping_type="transformer")
    params = caption_model.init_params(jax.random.PRNGKey(2), cfg)
    tx = optim_lib.make_optimizer(1e-3, 0, 100)
    noise_cfg = step_lib.NoiseConfig(variance=0.016)
    batch = make_batch(np.random.RandomState(2), bs=8, cfg=cfg)
    key = jax.random.PRNGKey(7)

    # single device
    state = step_lib.init_train_state(params, tx)
    step = step_lib.make_train_step(cfg, tx, noise_cfg, donate=False)
    _, loss_ref = step(state, batch, key)

    mesh = mesh_lib.make_mesh(dp=dp, tp=tp)
    specs = mesh_lib.caption_model_param_specs(params)
    sharded = mesh_lib.shard_params(params, mesh, specs)
    b_shard = mesh_lib.batch_sharding(mesh)
    batch_s = {k: jax.device_put(v, b_shard) for k, v in batch.items()}
    state_s = step_lib.init_train_state(sharded, tx)
    state_s2, loss_s = step(state_s, batch_s, key)
    np.testing.assert_allclose(float(loss_s), float(loss_ref),
                               rtol=1e-5, atol=1e-5)
    # params stay numerically identical after one sharded update
    ref_state2, _ = step(step_lib.init_train_state(params, tx), batch, key)
    for a, b in zip(jax.tree.leaves(ref_state2["params"]),
                    jax.tree.leaves(state_s2["params"])):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-5, atol=2e-5)


def test_checkpoint_save_load_round_trip(tmp_path):
    from capdec_tpu.utils import checkpoint as ckpt
    cfg = tiny_cfg(mapping_type="transformer")
    params = caption_model.init_params(jax.random.PRNGKey(3), cfg)
    path = str(tmp_path / "ckpts" / "test-000.pt")
    ckpt.save_caption_checkpoint(params, cfg, path)
    back = ckpt.load_caption_checkpoint(path, cfg)
    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(back)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


@pytest.mark.slow
def test_multi_step_matches_single_steps():
    """make_train_multi_step(K) is bit-identical to K single steps (same
    per-step noise keys via the folded step counter)."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from capdec_tpu.models import caption_model, gpt2
    from capdec_tpu.train import optim as optim_lib
    from capdec_tpu.train import step as step_lib

    cfg = caption_model.CaptionModelConfig(
        prefix_length=3, clip_length=3, prefix_size=8, num_layers=1,
        mapping_type="mlp",
        gpt2=gpt2.GPT2Config(vocab_size=50, n_positions=32, n_embd=16,
                             n_layer=1, n_head=2))
    params = caption_model.init_params(jax.random.PRNGKey(0), cfg)
    tx = optim_lib.make_optimizer(1e-3, 0, 100)
    noise = step_lib.NoiseConfig(variance=0.01)
    single = step_lib.make_train_step(cfg, tx, noise, donate=False)
    multi = step_lib.make_train_multi_step(cfg, tx, noise, donate=False)

    rng = np.random.RandomState(0)
    K = 4
    batches = {
        "tokens": jnp.asarray(rng.randint(1, 50, (K, 5, 6)), jnp.int32),
        "mask": jnp.ones((K, 5, 3 + 6), jnp.float32),
        "prefix": jnp.asarray(rng.randn(K, 5, 8), jnp.float32),
    }
    key = jax.random.PRNGKey(7)

    s1 = step_lib.init_train_state(params, tx)
    losses1 = []
    for k in range(K):
        b = {n: v[k] for n, v in batches.items()}
        s1, l = single(s1, b, key)
        losses1.append(float(l))
    s2 = step_lib.init_train_state(params, tx)
    s2, losses2 = multi(s2, batches, key)

    np.testing.assert_allclose(losses1, np.asarray(losses2), rtol=0, atol=0)
    for a, b in zip(jax.tree.leaves(s1["params"]),
                    jax.tree.leaves(s2["params"])):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert int(s2["step"]) == K


@pytest.mark.slow
def test_loop_steps_per_dispatch_equivalent(tmp_path):
    """The loop with steps_per_dispatch=3 reproduces the K=1 run exactly,
    including the leftover-batch path (4 steps/epoch, K=3 -> 3+1)."""
    import sys
    sys.path.insert(0, "tests")
    import jax
    import numpy as np
    from test_integration import TINY, make_corpus
    from capdec_tpu.data import dataset as data_lib
    from capdec_tpu.train import loop as loop_lib
    from capdec_tpu.train import step as step_lib
    from capdec_tpu.utils.tokenizer import ByteTokenizer

    data_path = str(tmp_path / "c.pkl")
    make_corpus(data_path)
    ds = data_lib.load_caption_dataset(data_path, TINY.prefix_length,
                                       ByteTokenizer())
    outs = []
    for K in (1, 3):
        cfg = loop_lib.TrainLoopConfig(
            epochs=2, batch_size=16, lr=2e-3, warmup_steps=0, save_every=10,
            out_dir=str(tmp_path / f"k{K}"), prefix="t", log_every=1000,
            seed=5, save_state=False, steps_per_dispatch=K)
        outs.append(loop_lib.train(TINY, cfg, ds,
                                   step_lib.NoiseConfig(variance=0.01)))
    np.testing.assert_allclose(outs[0]["loss_per_epoch"]["train"],
                               outs[1]["loss_per_epoch"]["train"],
                               rtol=0, atol=0)
    for a, b in zip(jax.tree.leaves(outs[0]["params"]),
                    jax.tree.leaves(outs[1]["params"])):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


@pytest.mark.slow
def test_loss_forward_matches_forward_plus_loss_fn():
    """The fused sliced-LM-head loss path (caption_model.loss_forward) is
    the same math as loss_fn(forward(...)): the LM head is row-independent
    so slicing hidden states first changes nothing."""
    cfg = tiny_cfg(mapping_type="transformer")
    params = caption_model.init_params(jax.random.PRNGKey(3), cfg)
    batch = make_batch(np.random.RandomState(3), cfg=cfg)
    logits = caption_model.forward(params, cfg, batch["tokens"],
                                   batch["prefix"], batch["mask"])
    ref = caption_model.loss_fn(logits, batch["tokens"], cfg.prefix_length)
    fused = caption_model.loss_forward(params, cfg, batch["tokens"],
                                       batch["prefix"], batch["mask"])
    np.testing.assert_allclose(float(fused), float(ref), rtol=1e-6)
    # gradients agree too (the train step differentiates loss_forward)
    g_ref = jax.grad(lambda p: caption_model.loss_fn(
        caption_model.forward(p, cfg, batch["tokens"], batch["prefix"],
                              batch["mask"]),
        batch["tokens"], cfg.prefix_length))(params)
    g_fused = jax.grad(lambda p: caption_model.loss_forward(
        p, cfg, batch["tokens"], batch["prefix"], batch["mask"]))(params)
    jax.tree.map(lambda a, b: np.testing.assert_allclose(
        np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6), g_ref, g_fused)


@pytest.mark.slow
def test_ce_chunked_matches_single_shot():
    """ce_chunk_rows: chunked+rematerialized CE == the single-shot loss
    and (trainable-subtree) gradients to float eps."""
    import dataclasses

    from capdec_tpu.models import caption_model

    cfg = tiny_cfg(mapping_type="mlp", only_prefix=True)
    cfg_c = dataclasses.replace(cfg, ce_chunk_rows=2)
    params = caption_model.init_params(jax.random.PRNGKey(5), cfg)
    batch = make_batch(np.random.RandomState(5), bs=8, cfg=cfg)

    def loss(cfg_):
        def f(p):
            return caption_model.loss_forward(
                p, cfg_, batch["tokens"], batch["prefix"], batch["mask"])
        return jax.jit(jax.value_and_grad(f))(params)

    l1, g1 = loss(cfg)
    l2, g2 = loss(cfg_c)
    np.testing.assert_allclose(float(l1), float(l2), rtol=1e-6)
    for a, b in zip(jax.tree.leaves(g1["clip_project"]),
                    jax.tree.leaves(g2["clip_project"])):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)
    # batch NOT a multiple of the chunk: full chunks + a ragged tail
    # chunk (the knob must never be silently dropped)
    l3, g3 = loss(dataclasses.replace(cfg, ce_chunk_rows=3))
    np.testing.assert_allclose(float(l1), float(l3), rtol=1e-6)
    for a, b in zip(jax.tree.leaves(g1["clip_project"]),
                    jax.tree.leaves(g3["clip_project"])):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)
