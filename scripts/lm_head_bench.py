"""Microbench: fused LM-head + lse + top-R kernel variants vs the XLA
matmul+top_k path, at the production decode shapes.

Variants: merge="rounds" (flat R-round merge over the [TB, VC] chunk)
vs merge="lanes" (two-level: per-lane top-R over 128-wide column
blocks, then a narrow cross-lane selection) at vc=1024/2048.

Usage: python scripts/lm_head_bench.py [B=2560] [R=5]
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

    from capdec_tpu.ops.lm_head import lm_head_topk

    kv = dict(a.split("=") for a in sys.argv[1:])
    shapes = [(int(kv["B"]), int(kv["R"]))] if "B" in kv else \
        [(2560, 5), (1024, 1)]  # beam N=512*5, greedy N=1024
    V, D = 50257, 768
    rng = np.random.RandomState(0)
    w = jnp.asarray(rng.randn(V, D) * 0.02, jnp.bfloat16)

    def timeit(fn, iters=50):
        np.asarray(fn()[0][0, :1])  # compile + honest D2H sync
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn()
        np.asarray(out[0][0, :1])
        return (time.perf_counter() - t0) / iters

    for B, R in shapes:
        h = jnp.asarray(rng.randn(B, D) * 0.5, jnp.bfloat16)

        @jax.jit
        def xla_path(h=h):
            logits = (h @ w.T).astype(jnp.float32)
            vals, idx = jax.lax.top_k(logits, R)
            lse = jax.nn.logsumexp(logits, axis=-1)
            return vals, idx, lse

        t_x = timeit(xla_path)
        print(f"B={B} R={R}: XLA matmul+top_k {t_x*1e3:7.3f} ms",
              flush=True)
        ref = None
        for vc in (1024, 2048):
            for merge in ("rounds", "lanes"):
                out = lm_head_topk(h, w, R, vocab_chunk=vc, merge=merge)
                if ref is None:
                    ref = out
                else:
                    np.testing.assert_array_equal(np.asarray(out[1]),
                                                  np.asarray(ref[1]))
                t = timeit(lambda m=merge, v=vc: lm_head_topk(
                    h, w, R, vocab_chunk=v, merge=m))
                print(f"  vc={vc} merge={merge:6s} {t*1e3:7.3f} ms "
                      f"({t_x/t:4.2f}x vs XLA)", flush=True)


if __name__ == "__main__":
    main()
