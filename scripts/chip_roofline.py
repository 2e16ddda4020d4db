"""Microbenchmark the chip: bf16 matmul TFLOP/s at several sizes, HBM copy
bandwidth, and per-dispatch / per-while-iteration overhead."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timeit(fn, iters=20):
    # block_until_ready under-reports on this relay backend (see
    # docs/PERFORMANCE.md) — force a D2H transfer of (a slice of) the
    # output to bound the real device time.
    import numpy as np

    def sync(out):
        import jax
        leaf = jax.tree.leaves(out)[0]
        np.asarray(leaf if leaf.ndim == 0 else leaf.ravel()[0:1])

    fn()  # compile/warm
    sync(fn())
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn()
    sync(out)
    return (time.perf_counter() - t0) / iters


def main():
    from capdec_tpu.utils.jax_setup import setup_jax
    setup_jax()
    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax import lax

    rng = np.random.RandomState(0)

    # ---- matmul peak at several shapes -------------------------------------
    for (m, k, n, reps) in [(8192, 8192, 8192, 4), (2400, 768, 3072, 64),
                            (2400, 768, 2304, 64), (1200, 50257, 768, 8),
                            (640, 768, 2304, 64)]:
        a = jnp.asarray(rng.randn(m, k), jnp.bfloat16)
        b = jnp.asarray(rng.randn(k, n), jnp.bfloat16)

        @jax.jit
        def mm(a, b, reps=reps):
            def body(s, _):
                # consume the FULL output (sum) so XLA can't slice-sink the
                # dot; tiny feedback keeps the chain sequential
                out = jnp.dot(a + (s * 1e-30).astype(a.dtype), b,
                              preferred_element_type=jnp.float32)
                return out.sum() * 1e-30, None
            s, _ = lax.scan(body, jnp.float32(0.0), None, length=reps)
            return s

        dt = timeit(lambda: mm(a, b), iters=5) / reps
        tflops = 2 * m * k * n / dt / 1e12
        print(f"matmul [{m},{k}]x[{k},{n}]: {dt*1e3:.3f} ms  {tflops:.1f} TFLOP/s")

    # ---- HBM copy bandwidth -------------------------------------------------
    x = jnp.asarray(rng.randn(256 * 1024 * 1024), jnp.float32)  # 1 GB
    REPS = 8

    @jax.jit
    def cp(x):
        def body(y, _):
            # full-array carry: each iteration reads + writes the buffer
            return y * 1.000001, None
        y, _ = lax.scan(body, x, None, length=REPS)
        return y.sum()

    dt = timeit(lambda: cp(x), iters=5) / REPS
    gb = x.size * 4 * 2 / 1e9
    print(f"HBM rw 2GB: {dt*1e3:.2f} ms  {gb/dt:.0f} GB/s")

    # ---- while-loop iteration overhead --------------------------------------
    @jax.jit
    def loop(n):
        def body(c):
            return (c[0] + 1, c[1] * 1.000001)
        def cond(c):
            return c[0] < n
        return lax.while_loop(cond, body, (jnp.int32(0), jnp.float32(1.0)))

    d1 = timeit(lambda: loop(1000), iters=5)
    d2 = timeit(lambda: loop(10000), iters=5)
    print(f"while-iter overhead: {(d2-d1)/9000*1e6:.2f} us/iter")

    # ---- dispatch overhead ---------------------------------------------------
    y = jnp.ones((8, 128), jnp.float32)

    @jax.jit
    def tiny(y=y):
        return y + 1

    dt = timeit(tiny, iters=50)
    print(f"dispatch overhead: {dt*1e3:.3f} ms")


if __name__ == "__main__":
    main()
