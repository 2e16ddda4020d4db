"""CLIP encoder throughput on one chip — the reference's embedding
generator runs batch-1 per record (embeddings_generator.py:58-89); this
measures our batched+jitted paths on the same chip.

Usage: python scripts/embed_throughput.py [image=1] [vit=1|rn=1]
Default measures the text tower; image=1 adds the image towers
(ViT-B/32 and/or RN50x4 — the two eval encoders, predictions_runner
:157-161)."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _time_batched(fn, x, iters, sync):
    out = fn(x)
    sync(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(x)
    sync(out)
    return (time.perf_counter() - t0) / iters


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

    opts = dict(kv.split("=") for kv in sys.argv[1:])
    if not int(opts.get("image", 0)):
        return

    def sync(o):
        np.asarray(o[0, :1])

    if int(opts.get("vit", 1)):
        vcfg = clip_lib.CLIPViTConfig()  # ViT-B/32
        vparams = clip_lib.init_vit_params(jax.random.PRNGKey(1), vcfg)
        BI = 256
        imgs = jnp.asarray(rng.randn(BI, vcfg.image_resolution, vcfg.image_resolution,
                                     3), jnp.float32)
        enc_i = jax.jit(lambda p, x: clip_lib.encode_image_vit(p, vcfg, x))
        dt = _time_batched(lambda x: enc_i(vparams, x), imgs, 5, sync)
        print(f"CLIP ViT-B/32 image encode: {BI / dt:.0f} images/s "
              f"(batch {BI})")

    if int(opts.get("rn", 1)):
        rcfg = clip_lib.CLIPResNetConfig()  # RN50x4
        rparams = clip_lib.init_resnet_params(jax.random.PRNGKey(2), rcfg)
        BI = 64
        imgs = jnp.asarray(rng.randn(BI, rcfg.image_resolution, rcfg.image_resolution,
                                     3), jnp.float32)
        enc_r = jax.jit(
            lambda p, x: clip_lib.encode_image_resnet(p, rcfg, x))
        dt = _time_batched(lambda x: enc_r(rparams, x), imgs, 5, sync)
        print(f"CLIP RN50x4 image encode: {BI / dt:.0f} images/s "
              f"(batch {BI})")


if __name__ == "__main__":
    main()
