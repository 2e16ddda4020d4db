"""CLIP text-encoder throughput on one chip (captions/s) — the reference's
embedding generator runs batch-1 per caption (embeddings_generator.py:58-89);
this measures our batched+jitted path on the same chip."""
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

    from capdec_tpu.models import clip as clip_lib

    cfg = clip_lib.CLIPTextConfig()  # ViT-B/32 text tower (512-d)
    params = clip_lib.init_text_params(jax.random.PRNGKey(0), cfg)
    B = 1024
    rng = np.random.RandomState(0)
    toks = np.zeros((B, cfg.context_length), np.int32)
    lens = rng.randint(4, 30, size=B)
    for i, L in enumerate(lens):
        toks[i, 0] = 49406
        toks[i, 1:L - 1] = rng.randint(1, 49000, size=L - 2)
        toks[i, L - 1] = 49407

    enc = jax.jit(lambda p, t: clip_lib.encode_text(p, cfg, t))
    t_dev = jnp.asarray(toks)
    out = enc(params, t_dev)
    np.asarray(out[0, :1])
    t0 = time.perf_counter()
    iters = 10
    for _ in range(iters):
        out = enc(params, t_dev)
    np.asarray(out[0, :1])
    dt = (time.perf_counter() - t0) / iters
    print(f"CLIP text encode: {B / dt:.0f} captions/s (batch {B})")

    # reference structure on the same chip: one caption per dispatch
    one = jnp.asarray(toks[:1])
    out = enc(params, one)
    np.asarray(out[0, :1])
    t0 = time.perf_counter()
    for _ in range(20):
        out = enc(params, one)
        np.asarray(out[0, :1])  # the reference .cpu()s every record
    dt1 = (time.perf_counter() - t0) / 20
    print(f"reference batch-1 structure: {1 / dt1:.1f} captions/s "
          f"-> {B / dt / (1 / dt1):.0f}x")


if __name__ == "__main__":
    main()
