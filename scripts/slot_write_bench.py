"""Microbenchmark: per-step K/V slot-write strategies for the row-major
[B, L, E, D] gen cache (the ~2 ms/step masked-RMW DUS in beam decode).

Strategies:
  dus4     — current production: dynamic_update_slice at dynamic slot e in
             the tiled sublane dim -> XLA lowers to a full-cache masked RMW.
  chunk5   — static reshape [B, L, C, 16, D] (same memory layout); read the
             16-slot chunk containing e with a major-dim dynamic_slice,
             insert the slot (RMW over the small chunk only), write the
             chunk back with a major-dim DUS.
  pallk    — Pallas pipelined chunk kernel: aliased cache, only the
             (TB, L, 16, D) chunk blocks stream through VMEM.

Usage: python scripts/slot_write_bench.py [B=640] [E=80] [iters=50]
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    opts = dict(kv.split("=") for kv in sys.argv[1:])
    B = int(opts.get("B", 640))
    E = int(opts.get("E", 80))
    iters = int(opts.get("iters", 50))
    L, D = 12, 768

    from capdec_tpu.utils.jax_setup import setup_jax
    setup_jax()
    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax import lax

    rng = np.random.RandomState(0)
    k = jnp.asarray(rng.randn(B, L, E, D), jnp.bfloat16)
    v = jnp.asarray(rng.randn(B, L, E, D), jnp.bfloat16)
    new_k = jnp.asarray(rng.randn(B, L, D), jnp.bfloat16)
    new_v = jnp.asarray(rng.randn(B, L, D), jnp.bfloat16)

    def dus4(k, v, nk, nv, step):
        up_k = nk[:, :, None, :]
        up_v = nv[:, :, None, :]
        return (lax.dynamic_update_slice(k, up_k, (0, 0, step, 0)),
                lax.dynamic_update_slice(v, up_v, (0, 0, step, 0)))

    def chunk5(k, v, nk, nv, step):
        C = E // 16
        ci, wi = step // 16, step % 16
        outs = []
        for cache, new in ((k, nk), (v, nv)):
            c5 = cache.reshape(B, L, C, 16, D)
            ch = lax.dynamic_slice(c5, (0, 0, ci, 0, 0), (B, L, 1, 16, D))
            ch = lax.dynamic_update_slice(
                ch, new[:, :, None, None, :], (0, 0, 0, wi, 0))
            c5 = lax.dynamic_update_slice(c5, ch, (0, 0, ci, 0, 0))
            outs.append(c5.reshape(B, L, E, D))
        return tuple(outs)

    from capdec_tpu.ops.cache_reorder import write_gen_slot_chunk

    def pallk(k, v, nk, nv, step):
        out = write_gen_slot_chunk(k, v, nk, nv, step)
        return out["k"], out["v"]

    strategies = {"dus4": dus4, "chunk5": chunk5, "pallk": pallk}
    results = {}
    for name, fn in strategies.items():
        @jax.jit
        def loop(k, v, nk, nv):
            def body(i, carry):
                k, v = carry
                # vary slot (and keep a data dependence) like real decode
                k2, v2 = fn(k, v, nk + jnp.bfloat16(i), nv, i % E)
                return k2, v2
            return lax.fori_loop(0, iters, body, (k, v))

        r = loop(k, v, new_k, new_v)  # compile
        jax.block_until_ready(r)
        t0 = time.perf_counter()
        r = loop(k, v, new_k, new_v)
        np.asarray(r[0][0, 0, 0, :8])  # honest D2H sync
        dt = time.perf_counter() - t0
        results[name] = round(dt / iters * 1000, 3)

    # correctness: chunk5/pallk == dus4 for a fixed step
    s = jnp.asarray(17 % E, jnp.int32)
    ref = dus4(k, v, new_k, new_v, s)
    for name in ("chunk5", "pallk"):
        got = strategies[name](k, v, new_k, new_v, s)
        for a, b in zip(ref, got):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b),
                                          err_msg=name)
    print(json.dumps({"B": B, "E": E, "ms_per_write": results}))


if __name__ == "__main__":
    main()
