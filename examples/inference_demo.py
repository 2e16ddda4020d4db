"""Single-image captioning demo — the script form of the reference's Colab
notebook (others/CapDec_inference.ipynb): load a CapDec checkpoint (e.g. one
of the published noise-sweep zoo, σ² ∈ {0, 1e-4, 1e-3, 0.015, 0.1, 2.5}),
CLIP-encode an image, and decode a caption with beam search and greedy.

Usage:
    python examples/inference_demo.py --image cat.jpg \
        --checkpoint coco_prefix-009.pt --clip_checkpoint RN50x4.pt
"""
import argparse
import sys

import numpy as np


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--image", required=True)
    p.add_argument("--checkpoint", required=True)
    p.add_argument("--clip_checkpoint", required=True)
    p.add_argument("--clip_model", default="RN50x4",
                   choices=("RN50", "RN101", "RN50x4", "ViT-B/32"))
    p.add_argument("--prefix_length", type=int, default=40)
    p.add_argument("--num_layers", type=int, default=8)
    p.add_argument("--mapping_type", default="transformer_encoder")
    p.add_argument("--beam_size", type=int, default=5)
    args = p.parse_args()

    from capdec_tpu.utils.jax_setup import setup_jax
    setup_jax()
    import jax
    import jax.numpy as jnp

    from capdec_tpu.data.image_ops import load_and_preprocess
    from capdec_tpu.decode import (BeamConfig, beam_search, beam_texts,
                                   greedy_topp_search, topp_texts)
    from capdec_tpu.models import caption_model, clip as clip_lib, gpt2
    from capdec_tpu.utils import checkpoint as ckpt_lib
    from capdec_tpu.utils.tokenizer import load_tokenizer

    clip_params, clip_cfg = clip_lib.load_openai_checkpoint(
        args.clip_checkpoint, args.clip_model)
    model_cfg = caption_model.CaptionModelConfig(
        prefix_length=args.prefix_length, clip_length=args.prefix_length,
        prefix_size=clip_cfg.text.embed_dim, num_layers=args.num_layers,
        mapping_type=args.mapping_type,
        gpt2=gpt2.GPT2Config(compute_dtype=jnp.bfloat16))
    params = ckpt_lib.load_caption_checkpoint(args.checkpoint, model_cfg)
    tokenizer = load_tokenizer()

    img = load_and_preprocess(args.image,
                              clip_cfg.vision.image_resolution)[None]
    embed = clip_lib.encode_image(clip_params, clip_cfg, jnp.asarray(img))
    embed = embed / jnp.linalg.norm(embed, axis=-1, keepdims=True)
    prefix_embeds = caption_model.map_prefix(params, model_cfg,
                                             embed.astype(jnp.float32))

    toks, lens, scores, order = beam_search(
        params["gpt"], model_cfg.gpt2, prefix_embeds,
        BeamConfig(beam_size=args.beam_size))
    beams = beam_texts(tokenizer, toks, lens, order)[0]
    gt, gl = greedy_topp_search(params["gpt"], model_cfg.gpt2, prefix_embeds)
    greedy = topp_texts(tokenizer, gt, gl)[0]

    print(f"beam ({args.beam_size}):")
    for i, b in enumerate(beams):
        print(f"  {i}: {b}")
    print(f"greedy/top-p: {greedy}")


if __name__ == "__main__":
    sys.exit(main())
