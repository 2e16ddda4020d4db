"""Beam-decode perf sweep harness (TPU).

Usage: python scripts/decode_sweep.py N=128 stages=8 fused=1 skip=0 ...
Each invocation times ONE config (fresh process; persistent compile cache
makes repeat configs cheap). Prints a one-line JSON result.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    opts = dict(kv.split("=") for kv in sys.argv[1:])
    N = int(opts.get("N", 128))
    stages = int(opts.get("stages", 8))
    fused = bool(int(opts.get("fused", 1)))
    skip = bool(int(opts.get("skip", 0)))
    lanes = bool(int(opts.get("lanes", 1)))
    beam = int(opts.get("beam", 5))
    iters = int(opts.get("iters", 5))
    chunk = opts.get("chunk")  # chunked slot write: 0/1, unset = auto
    int8 = bool(int(opts.get("int8", 0)))  # opt-in int8 KV cache
    block = int(opts.get("block", 20))  # fused-attention rows per block
    # v3 slot-bounded attention: chunk size (0 = v2 full-read kernel,
    # unset = auto) and bounded fork copy (unset = auto)
    slotchunks = opts.get("slotchunks")
    bfc = opts.get("bfc")
    flm = opts.get("flm")  # fused LM-head+lse+topR kernel (unset = auto)

    from capdec_tpu.utils.jax_setup import setup_jax
    setup_jax()
    import jax
    import jax.numpy as jnp
    import numpy as np

    from capdec_tpu.decode import BeamConfig, beam_search
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

    bc = BeamConfig(beam_size=beam, entry_length=67, stop_token=-1,
                    cache_stages=stages, lane_beams=lanes,
                    fused_attention=fused, skip_reorder_unsafe=skip,
                    kv_cache_int8=int8, fused_block_beams=block,
                    chunk_slot_write=None if chunk is None
                    else bool(int(chunk)),
                    fused_slot_chunks=None if slotchunks is None
                    else int(slotchunks),
                    bounded_fork_copy=None if bfc is None
                    else bool(int(bfc)),
                    fused_lm_head=None if flm is None else bool(int(flm)))

    def run():
        toks, lens, scores, order = beam_search(params["gpt"], cfg.gpt2,
                                                prefix_embeds, bc)
        jax.block_until_ready(toks)

    t0 = time.perf_counter()
    run()  # compile
    compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(iters):
        run()
    dt = (time.perf_counter() - t0) / iters
    print(json.dumps({
        "N": N, "stages": stages, "fused": fused, "skip": skip,
        "lanes": lanes, "beam": beam, "chunk": bc.chunk_slot_write,
        "int8": int8, "block": block, "slotchunks": slotchunks,
        "bfc": bfc, "flm": flm,
        "caps_per_s": round(N / dt, 1),
        "ms_per_step": round(dt / 67 * 1000, 2),
        "compile_s": round(compile_s, 1),
    }))


if __name__ == "__main__":
    main()
