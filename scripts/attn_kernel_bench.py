"""Microbench: fused decode-attention v2 (full-read) vs v3 (slot-bounded
chunk grid) at production beam shapes, across steps.

Usage: python scripts/attn_kernel_bench.py [N=512] [E=72] [chunk=8] [TB=20]
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

    from capdec_tpu.ops.decode_attention import (
        beam_decode_attention_chunked, beam_decode_attention_rowmajor)

    kv = dict(a.split("=") for a in sys.argv[1:])
    N = int(kv.get("N", 512))
    E = int(kv.get("E", 72))
    chunk = int(kv.get("chunk", 8))
    TB = int(kv.get("TB", 20))
    R, K, D, hd, L = 5, 40, 768, 64, 12
    B = N * R
    rng = np.random.RandomState(0)
    mk = lambda *s: jnp.asarray(rng.randn(*s) * 0.3, jnp.bfloat16)
    q, k_new, v_new = mk(B, D), mk(B, D), mk(B, D)
    pk, pv = mk(L, N, K, D), mk(L, N, K, D)
    gk, gv = mk(B, L, E, D), mk(B, L, E, D)
    layer = jnp.asarray(0, jnp.int32)

    def timeit(fn, iters=30):
        np.asarray(fn()[0, :1])
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn()
        np.asarray(out[0, :1])
        return (time.perf_counter() - t0) / iters

    for step in (1, 8, 16, 33, 66):
        s = jnp.asarray(step, jnp.int32)
        o2 = beam_decode_attention_rowmajor(
            q, k_new, v_new, pk, pv, gk, gv, s, layer,
            beams_per_image=R, head_dim=hd, block_beams=TB)
        o3 = beam_decode_attention_chunked(
            q, k_new, v_new, pk, pv, gk, gv, s, layer,
            beams_per_image=R, head_dim=hd, block_beams=TB, chunk=chunk)
        err = float(jnp.max(jnp.abs(o2 - o3)))
        t2 = timeit(lambda: beam_decode_attention_rowmajor(
            q, k_new, v_new, pk, pv, gk, gv, s, layer,
            beams_per_image=R, head_dim=hd, block_beams=TB))
        t3 = timeit(lambda: beam_decode_attention_chunked(
            q, k_new, v_new, pk, pv, gk, gv, s, layer,
            beams_per_image=R, head_dim=hd, block_beams=TB, chunk=chunk))
        # vector_reduce variants: Mosaic rejects the lane-splitting
        # reshape on real TPU ("unsupported shape cast") — see
        # ops/decode_attention._reduce_fns. Tried, reported, skipped.
        vec = []
        for name, fn in (
            ("v3vec", lambda: beam_decode_attention_chunked(
                q, k_new, v_new, pk, pv, gk, gv, s, layer,
                beams_per_image=R, head_dim=hd, block_beams=TB,
                chunk=chunk, vector_reduce=True)),
            ("v2vec", lambda: beam_decode_attention_rowmajor(
                q, k_new, v_new, pk, pv, gk, gv, s, layer,
                beams_per_image=R, head_dim=hd, block_beams=TB,
                vector_reduce=True)),
        ):
            try:
                errv = float(jnp.max(jnp.abs(o2 - fn())))
                tv = timeit(fn)
                vec.append(f"{name} {tv*1e3:7.3f} ms ({t2/tv:4.2f}x, "
                           f"max|d|={errv:.2e})")
            except Exception as e:
                vec.append(f"{name} FAILS-TO-LOWER"
                           if "shape cast" in str(e) else
                           f"{name} ERROR {type(e).__name__}")
        print(f"step {step:3d}: v2 {t2*1e3:7.3f} ms   v3 {t3*1e3:7.3f} ms "
              f"({t2/t3:4.2f}x)   " + "   ".join(vec) +
              f"   max|d| v3={err:.2e}", flush=True)


if __name__ == "__main__":
    main()
