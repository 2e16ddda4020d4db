"""Greedy/top-p decode perf sweep harness (TPU).

Usage: python scripts/greedy_sweep.py N=256 chunk=1 fused=0 iters=5
Prints a one-line JSON result. See scripts/decode_sweep.py for beam.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    opts = dict(kv.split("=") for kv in sys.argv[1:])
    N = int(opts.get("N", 256))
    fused = bool(int(opts.get("fused", 0)))
    chunk = opts.get("chunk")  # unset = auto
    stages = int(opts.get("stages", 8))
    int8 = bool(int(opts.get("int8", 0)))
    iters = int(opts.get("iters", 5))
    slotchunks = int(opts.get("slotchunks", 0))  # v3 slot-bounded kernel
    block = int(opts.get("block", 20))
    flm = opts.get("flm")  # fused LM-head kernel (unset = auto)

    from capdec_tpu.utils.jax_setup import setup_jax
    setup_jax()
    import jax
    import jax.numpy as jnp
    import numpy as np

    from capdec_tpu.decode.topp import ToppConfig, greedy_topp_search
    from capdec_tpu.models import caption_model, gpt2

    cfg = caption_model.CaptionModelConfig(
        prefix_length=40, clip_length=40, prefix_size=640, num_layers=8,
        mapping_type="transformer",
        gpt2=gpt2.GPT2Config(compute_dtype=jnp.bfloat16))
    params = caption_model.init_params(jax.random.PRNGKey(0), cfg)
    rng = np.random.RandomState(0)
    clip_embeds = jnp.asarray(rng.randn(N, cfg.prefix_size), jnp.float32)
    map_fn = jax.jit(caption_model.map_prefix, static_argnums=(1,))
    prefix_embeds = map_fn(params, cfg, clip_embeds)
    jax.block_until_ready(prefix_embeds)

    tc = ToppConfig(entry_length=67, stop_token=-1, extra_stop_token=-1,
                    fused_attention=fused, cache_stages=stages,
                    kv_cache_int8=int8, fused_slot_chunks=slotchunks,
                    fused_block_beams=block,
                    fused_lm_head=None if flm is None else bool(int(flm)),
                    chunk_slot_write=None if chunk is None
                    else bool(int(chunk)))

    def run():
        toks, _ = greedy_topp_search(params["gpt"], cfg.gpt2, prefix_embeds,
                                     tc)
        np.asarray(toks[0, 0])  # honest D2H sync

    t0 = time.perf_counter()
    run()  # compile
    compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(iters):
        run()
    dt = (time.perf_counter() - t0) / iters
    print(json.dumps({
        "N": N, "fused": fused, "chunk": tc.chunk_slot_write,
        "stages": stages, "int8": int8, "slotchunks": slotchunks,
        "block": block, "flm": flm,
        "caps_per_s": round(N / dt, 1),
        "ms_per_step": round(dt / 67 * 1000, 2),
        "compile_s": round(compile_s, 1),
    }))


if __name__ == "__main__":
    main()
