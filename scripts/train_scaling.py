"""Train-throughput batch scaling on one chip (PERFORMANCE.md evidence).

The bench contract pins bs=30 (reference COCO preset); this measures how
samples/s scales when the batch grows — the TPU-native knob the reference
never had.
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

    T, K = 40, 8
    ce_chunk = int(os.environ.get("CE_CHUNK", "0"))
    sizes = ([int(a) for a in sys.argv[1:]] if len(sys.argv) > 1
             else (30, 120, 240))
    for bs in sizes:
        cfg = caption_model.CaptionModelConfig(
            prefix_length=40, clip_length=40, prefix_size=640, num_layers=8,
            mapping_type="transformer", only_prefix=True,
            ce_chunk_rows=ce_chunk,
            gpt2=gpt2.GPT2Config(compute_dtype=jnp.bfloat16))
        params = caption_model.init_params(jax.random.PRNGKey(1), cfg)
        tx = optim_lib.make_optimizer(
            2e-5, warmup_steps=5000, total_steps=100000,
            trainable_mask=caption_model.trainable_mask(params, cfg))
        state = step_lib.init_train_state(params, tx)
        rng = np.random.RandomState(0)
        hb = {"tokens": np.asarray(rng.randint(1, 50257, (bs, T)), np.int32),
              "mask": np.ones((bs, 80), np.float32),
              "prefix": np.asarray(rng.randn(bs, 640), np.float32)}
        stacked = {k: jnp.asarray(np.broadcast_to(v, (K,) + v.shape))
                   for k, v in hb.items()}
        multi_step = step_lib.make_train_multi_step(
            cfg, tx, step_lib.NoiseConfig(variance=0.016))
        key = jax.random.PRNGKey(2)
        state, losses = multi_step(state, stacked, key)
        np.asarray(losses[-1])
        t0 = time.perf_counter()
        iters = 4
        for _ in range(iters):
            state, losses = multi_step(state, stacked, key)
        np.asarray(losses[-1])
        dt = (time.perf_counter() - t0) / iters
        print(f"bs={bs} ce_chunk={ce_chunk}: {bs * K / dt:.0f} samples/s "
              f"({dt / K * 1000:.1f} ms/step)", flush=True)


if __name__ == "__main__":
    main()
