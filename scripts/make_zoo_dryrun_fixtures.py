"""Fabricate tiny synthetic artifacts for `zoo_parity.sh --dry-run`.

A weights-bearing environment runs zoo_parity.sh against the real zoo
(reference notebook cell 7 checkpoints, OpenAI RN50x4.pt, Karpathy JSON,
COCO images). This zero-egress container has none of those, so the script
itself could silently rot. This generator fabricates shape-valid stand-ins
for every required artifact — same formats, tiny sizes — so the FULL
command chain (Karpathy parse → predict with --clip_checkpoint → in-process
scoring → gate) executes end-to-end on random weights:

  * `clip_tiny.pt`      OpenAI-layout CLIP state_dict (modified-ResNet tower)
                        via the round-trip exporter (models/clip.py
                        params_to_openai_state_dict); the CLI infers its
                        architecture from shapes, exactly like `clip.load`.
  * `capdec_tiny.pt`    reference-layout caption checkpoint
                        (`gpt.*` + `clip_project.*`); predict loads it with
                        --infer_model_config.
  * `karpathy/dataset_coco.json`  Karpathy-split format (images[].sentences)
  * `images/val2014/COCO_val2014_*.jpg`  tiny real JPEGs
  * `gpt2_vocab/vocab.json|merges.txt`   byte-level BPE pair so the real
                        GPT2Tokenizer code path runs (decoded text is
                        garbage on random weights — the gates are disabled
                        in dry-run; only the chain is being validated).

Usage: python scripts/make_zoo_dryrun_fixtures.py OUT_DIR
"""
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def tiny_clip_checkpoint(path: str) -> None:
    import jax
    from capdec_tpu.models import clip as clip_lib

    cfg = clip_lib.CLIPConfig(
        "tiny-rn-dryrun",
        clip_lib.CLIPTextConfig(vocab_size=512, context_length=77, width=64,
                                heads=1, layers=2, embed_dim=64),
        clip_lib.CLIPResNetConfig(layers=(1, 1, 1, 1), width=8,
                                  image_resolution=64, embed_dim=64))
    params = {
        "text": clip_lib.init_text_params(jax.random.PRNGKey(0), cfg.text),
        "visual": clip_lib.init_resnet_params(jax.random.PRNGKey(1),
                                              cfg.vision),
    }
    sd = clip_lib.params_to_openai_state_dict(params, cfg)
    # the loader must recover the exact architecture from shapes alone
    assert clip_lib.config_from_openai_state_dict(sd, cfg.name) == cfg
    import torch
    torch.save({k: torch.from_numpy(np.ascontiguousarray(v))
                for k, v in sd.items()}, path)


def tiny_caption_checkpoint(path: str) -> None:
    import jax
    from capdec_tpu.models import caption_model, gpt2
    from capdec_tpu.utils import checkpoint as ckpt_lib

    cfg = caption_model.CaptionModelConfig(
        prefix_length=8, clip_length=8, prefix_size=64, num_layers=2,
        mapping_type="transformer",
        gpt2=gpt2.GPT2Config(vocab_size=1000, n_positions=128, n_embd=64,
                             n_layer=2, n_head=1))
    params = caption_model.init_params(jax.random.PRNGKey(2), cfg)
    ckpt_lib.save_caption_checkpoint(params, cfg, path)
    sd = ckpt_lib.load_state_dict(path)
    # predict's --infer_model_config must recover this architecture
    inferred = caption_model.config_from_torch_state_dict(sd)
    assert inferred == cfg, f"inferred {inferred}\nexpected {cfg}"


def karpathy_and_images(out_dir: str, n_test: int = 4) -> None:
    from PIL import Image

    img_dir = os.path.join(out_dir, "images", "val2014")
    os.makedirs(img_dir, exist_ok=True)
    rng = np.random.RandomState(0)
    images = []
    sentid = 0
    for i in range(1, n_test + 3):  # extra train/val entries
        split = "test" if i <= n_test else ("train" if i == n_test + 1
                                            else "val")
        fname = f"COCO_val2014_{i:012d}.jpg"
        Image.fromarray(rng.randint(0, 255, (48, 64, 3), np.uint8)).save(
            os.path.join(img_dir, fname))
        sents = []
        for j in range(2):
            sents.append({"raw": f"a synthetic caption {i} variant {j}.",
                          "sentid": sentid})
            sentid += 1
        images.append({"filename": fname, "split": split,
                       "sentences": sents})
    os.makedirs(os.path.join(out_dir, "karpathy"), exist_ok=True)
    with open(os.path.join(out_dir, "karpathy", "dataset_coco.json"),
              "w") as f:
        json.dump({"images": images}, f)


def byte_vocab(out_dir: str) -> None:
    """A degenerate-but-valid GPT-2 BPE pair: the 256 byte tokens, no
    merges — exercises the real tokenizer loader/decoder."""
    from capdec_tpu.utils.tokenizer import _bytes_to_unicode

    os.makedirs(out_dir, exist_ok=True)
    vocab = {ch: b for b, ch in _bytes_to_unicode().items()}
    vocab["<|endoftext|>"] = 256
    with open(os.path.join(out_dir, "vocab.json"), "w",
              encoding="utf-8") as f:
        json.dump(vocab, f, ensure_ascii=False)
    with open(os.path.join(out_dir, "merges.txt"), "w") as f:
        f.write("#version: 0.2\n")


def main(out_dir: str) -> None:
    os.makedirs(out_dir, exist_ok=True)
    tiny_clip_checkpoint(os.path.join(out_dir, "clip_tiny.pt"))
    tiny_caption_checkpoint(os.path.join(out_dir, "capdec_tiny.pt"))
    karpathy_and_images(out_dir)
    byte_vocab(os.path.join(out_dir, "gpt2_vocab"))
    print(f"dry-run fixtures written to {out_dir}")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "zoo_dryrun_fixtures")
