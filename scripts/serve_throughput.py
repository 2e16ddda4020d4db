"""End-to-end serving throughput on the flagship model (random weights).

Drives the production serving surface — CaptionServer.serve() with its
feeder thread, fixed-shape padded batches, one-batch-in-flight pipeline,
device-side rank-0 beam selection, and host detokenization — and reports
wall-clock captions/s, comparable to bench.py's bare-engine beam number
(the gap between the two is the serving layer's host overhead).

Usage: python scripts/serve_throughput.py [--n 2048] [--batch 512]
       [--no_beam] [--int8] [--sync]   (--sync disables the pipeline by
       calling the synchronous caption() per batch, for A/B)
"""
from __future__ import annotations

import argparse
import dataclasses
import json
import sys
import time

sys.path.insert(0, __import__("os").path.dirname(
    __import__("os").path.dirname(__import__("os").path.abspath(__file__))))

from capdec_tpu.utils.jax_setup import setup_jax


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--n", type=int, default=2048)
    p.add_argument("--batch", type=int, default=512)
    p.add_argument("--no_beam", action="store_true")
    p.add_argument("--int8", action="store_true")
    p.add_argument("--sync", action="store_true",
                   help="bypass the serve() pipeline: synchronous "
                        "caption() per coalesced batch")
    args = p.parse_args()

    setup_jax()
    import jax
    import numpy as np

    from capdec_tpu import serve as serve_lib
    from capdec_tpu.models import caption_model
    from capdec_tpu.utils.tokenizer import load_tokenizer

    cfg = caption_model.CaptionModelConfig()  # flagship RN50x4 transformer
    params = caption_model.init_params(jax.random.PRNGKey(0), cfg)
    bc = serve_lib.BeamConfig(beam_size=5, entry_length=67, stop_token=-1)
    if args.int8:
        bc = dataclasses.replace(bc, kv_cache_int8=True,
                                 fused_attention=True)
    scfg = serve_lib.ServeConfig(
        batch_size=args.batch, max_wait_s=0.05, beam=not args.no_beam,
        beam_config=bc,
        topp_config=serve_lib.ToppConfig(entry_length=67, stop_token=-1,
                                         extra_stop_token=-1))
    server = serve_lib.CaptionServer(params, cfg, load_tokenizer(), scfg)
    print("compiling...", file=sys.stderr, flush=True)
    server.warmup()

    rng = np.random.RandomState(0)
    embeds = rng.randn(args.n, cfg.prefix_size).astype(np.float32)
    served = 0
    t0 = time.perf_counter()
    if args.sync:
        for i in range(0, args.n, args.batch):
            served += len(server.caption(embeds[i:i + args.batch]))
    else:
        for _rid, _text in server.serve(
                (i, embeds[i]) for i in range(args.n)):
            served += 1
    wall = time.perf_counter() - t0
    pct = server.latency_percentiles()
    print(json.dumps({
        "serve_captions_per_sec": round(served / wall, 1),
        "served": served, "wall_s": round(wall, 2),
        "batches": server.stats["batches"],
        "mode": ("sync" if args.sync else "pipelined"),
        "beam": not args.no_beam, "int8": args.int8,
        "latency_p50_s": round(pct["p50"], 3),
        "latency_p99_s": round(pct["p99"], 3),
    }))


if __name__ == "__main__":
    main()
