"""Profile one beam-decode batch with jax.profiler and print the per-op
duration aggregation (the tool that found the cache-copy pathologies).

Usage: python scripts/decode_profile.py N=128 chunk=1 top=30
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    opts = dict(kv.split("=") for kv in sys.argv[1:])
    N = int(opts.get("N", 128))
    chunk = opts.get("chunk")
    top = int(opts.get("top", 30))

    from capdec_tpu.utils.jax_setup import setup_jax
    setup_jax()
    import jax
    import jax.numpy as jnp
    import numpy as np

    from capdec_tpu.decode import BeamConfig, beam_search
    from capdec_tpu.models import caption_model, gpt2
    from capdec_tpu.utils import profiling

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

    bc = BeamConfig(beam_size=5, entry_length=67, stop_token=-1,
                    chunk_slot_write=None if chunk is None
                    else bool(int(chunk)))

    def run():
        toks, *_ = beam_search(params["gpt"], cfg.gpt2, prefix_embeds, bc)
        np.asarray(toks[0, 0])

    run()  # compile
    with profiling.trace("/tmp/capdec_decode_trace") as d:
        run()
    profiling.print_trace_summary(d, top=top)


if __name__ == "__main__":
    main()
