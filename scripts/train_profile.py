"""Profile the fused multi-step train dispatch on the real chip.

Prints the aggregated per-op trace for one K-step dispatch at the bench
configuration (only_prefix, seq 40+40). Usage:
    python scripts/train_profile.py [bs=30] [k=16]
bs=120 k=8 is the MFU-best bench configuration (train_best_batch).
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    from capdec_tpu.utils.jax_setup import setup_jax
    setup_jax()
    import jax
    import jax.numpy as jnp
    import numpy as np

    from capdec_tpu.models import caption_model, gpt2
    from capdec_tpu.train import optim as optim_lib
    from capdec_tpu.train import step as step_lib
    from capdec_tpu.utils import profiling

    opts = dict(kv.split("=") for kv in sys.argv[1:])
    bs, T, K = int(opts.get("bs", 30)), 40, int(opts.get("k", 16))
    cfg = caption_model.CaptionModelConfig(
        prefix_length=40, clip_length=40, prefix_size=640, num_layers=8,
        mapping_type="transformer", only_prefix=True,
        gpt2=gpt2.GPT2Config(compute_dtype=jnp.bfloat16))
    params = caption_model.init_params(jax.random.PRNGKey(1), cfg)
    tx = optim_lib.make_optimizer(
        2e-5, warmup_steps=5000, total_steps=100000,
        trainable_mask=caption_model.trainable_mask(params, cfg))
    state = step_lib.init_train_state(params, tx)
    rng = np.random.RandomState(0)
    host_batch = {
        "tokens": np.asarray(rng.randint(1, 50257, (bs, T)), np.int32),
        "mask": np.ones((bs, 80), np.float32),
        "prefix": np.asarray(rng.randn(bs, 640), np.float32),
    }
    stacked = {k: jnp.asarray(np.broadcast_to(v, (K,) + v.shape))
               for k, v in host_batch.items()}
    multi_step = step_lib.make_train_multi_step(
        cfg, tx, step_lib.NoiseConfig(variance=0.016))
    key = jax.random.PRNGKey(2)
    state, _ = multi_step(state, stacked, key)  # compile
    jax.block_until_ready(state["step"])
    t0 = time.perf_counter()
    state, losses = multi_step(state, stacked, key)
    jax.block_until_ready(losses)
    print(f"dispatch: {(time.perf_counter() - t0) * 1000:.1f} ms "
          f"({bs * K / (time.perf_counter() - t0):.0f} samples/s)")
    with profiling.trace("/tmp/train_trace") as d:
        state, losses = multi_step(state, stacked, key)
        jax.block_until_ready(losses)
    profiling.print_trace_summary(d, top=40)


if __name__ == "__main__":
    main()
