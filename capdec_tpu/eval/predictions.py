"""Predictions runner: images (or captions) → generated captions JSON.

TPU rewrite of the reference eval CLI (predictions_runner.py:153-342).
Where the reference encodes and beam-decodes ONE image at a time, this
runner batches: host workers preprocess images, a jitted CLIP encoder
embeds the batch, the mapper projects it, and the batched beam engine
decodes all of them in one device program.

Reference-parity behaviors:
  * `--dont_normalize_prefix`, inference modality offset (+`offset_to_add_
    in_inference`), modality-bridger hook, text-autoencoder mode
    (dataset_mode 5 / `--text_autoencoder`: encode the *caption* text
    instead of the image — predictions_runner.py:215-218)
  * output JSON `[{"caption": ..., "image_id": ...}]`, lowercased
    captions, periodic flush
  * per-batch latency stats (replacing the CUDA-event Timer)
"""
from __future__ import annotations

import dataclasses
import json
import os
import time
from typing import Any, Callable, List, Optional

import numpy as np

from ..decode import (BeamConfig, ToppConfig, beam_search, beam_top_texts,
                      greedy_topp_search, topp_texts)
from ..models import caption_model
from ..utils.meter import Timer


@dataclasses.dataclass
class PredictConfig:
    beam: bool = True
    batch_size: int = 32
    dont_normalize_prefix: bool = False
    add_modality_offset: bool = False
    modality_offset: Optional[np.ndarray] = None   # [1, D] inference offset
    text_autoencoder: bool = False
    beam_config: BeamConfig = dataclasses.field(default_factory=BeamConfig)
    topp_config: ToppConfig = dataclasses.field(default_factory=ToppConfig)
    flush_every: int = 99
    # paraphrase-distance ablation (reference --ablation_dist, needs ~5
    # captions per image_id) and image↔text gap stat (--ablation_image_dist)
    ablation_dist: bool = False
    ablation_dist_ready_at: int = 900
    ablation_image_dist: bool = False
    text_embed_fn: Optional[Callable] = None  # for ablation_image_dist
    # optional device mesh: image batches shard over the dp axis (eval
    # fan-out is embarrassingly parallel)
    mesh: Optional[Any] = None
    # Drop records failing this predicate (e.g. missing image files —
    # the reference skips them entirely, predictions_runner.py:206-209;
    # scoring a zero-embedding garbage caption would deflate the metrics).
    record_filter: Optional[Callable[[dict], bool]] = None


def _l2norm(x, axis=-1):
    return x / np.maximum(np.linalg.norm(x, axis=axis, keepdims=True), 1e-12)


def run_predictions(records: List[dict],
                    embed_batch_fn: Callable[[List[dict]], np.ndarray],
                    params: Any, model_cfg: caption_model.CaptionModelConfig,
                    tokenizer, cfg: PredictConfig,
                    out_path: Optional[str] = None,
                    bridger_fn: Optional[Callable] = None) -> List[dict]:
    """Generate captions for `records`.

    `embed_batch_fn(records) -> [B, D] raw CLIP embeddings` abstracts the
    encode side (image files, caption text, or precomputed embeddings), so
    the runner is testable without CLIP weights.
    """
    import jax
    import jax.numpy as jnp

    from . import ablation

    map_fn = jax.jit(caption_model.map_prefix, static_argnums=(1,))
    shard = None
    if cfg.mesh is not None:
        from ..parallel import mesh as mesh_lib
        shard = mesh_lib.batch_sharding(cfg.mesh)
        params = jax.device_put(params, mesh_lib.replicated(cfg.mesh))

    results: List[dict] = []
    timer = Timer()
    paraphrase_embeds: dict = {}
    gap = ablation.ImageTextGapTracker()
    B = cfg.batch_size
    if cfg.record_filter is not None:
        # Filter ONCE before batching: filtering per chunk would produce a
        # different batch shape for every distinct kept-count (one full
        # decode recompile each) and drop mesh sharding for kept-counts
        # not divisible by dp. Pre-filtering keeps every chunk full-size
        # except the last.
        kept = [d for d in records if cfg.record_filter(d)]
        if len(kept) < len(records):
            print(f"skips= {len(records) - len(kept)} "
                  f"(records dropped by filter)", flush=True)
        records = kept
    for start in range(0, len(records), B):
        chunk = records[start:start + B]
        with timer:
            prefix = np.asarray(embed_batch_fn(chunk), np.float32)
            if not cfg.dont_normalize_prefix:
                prefix = _l2norm(prefix)
            if cfg.add_modality_offset and cfg.modality_offset is not None:
                prefix = prefix + cfg.modality_offset
            if bridger_fn is not None:
                prefix = np.asarray(bridger_fn(prefix), np.float32)
            prefix_dev = jnp.asarray(prefix)
            if shard is not None:
                if prefix.shape[0] % cfg.mesh.shape["dp"] == 0:
                    prefix_dev = jax.device_put(prefix_dev, shard)
                else:
                    # no silent caps: a ragged final batch runs unsharded
                    print(f"[mesh] ragged batch of {prefix.shape[0]} not "
                          f"divisible by dp={cfg.mesh.shape['dp']}; running "
                          f"unsharded", flush=True)
            prefix_embeds = map_fn(params, model_cfg, prefix_dev)
            if cfg.beam:
                toks, lens, scores, order = beam_search(
                    params["gpt"], model_cfg.gpt2, prefix_embeds,
                    cfg.beam_config)
                # rank-0 beam only (reference takes generate_beam(...)[0],
                # predictions_runner.py:229-232), selected on device
                texts = beam_top_texts(tokenizer, toks, lens, order)
            else:
                toks, lens = greedy_topp_search(
                    params["gpt"], model_cfg.gpt2, prefix_embeds,
                    cfg.topp_config)
                texts = topp_texts(tokenizer, toks, lens)
        if cfg.ablation_dist:
            pe = np.asarray(prefix_embeds, np.float32)
            for j, d in enumerate(chunk):
                paraphrase_embeds.setdefault(d["image_id"], []).append(
                    (pe[j].reshape(-1), prefix[j].reshape(-1)))
            if ablation.count_ready(paraphrase_embeds) >= cfg.ablation_dist_ready_at:
                ablation.calc_distances(paraphrase_embeds)
                cfg = dataclasses.replace(cfg, ablation_dist=False)
        if cfg.ablation_image_dist and cfg.text_embed_fn is not None:
            txt = _l2norm(np.asarray(cfg.text_embed_fn(chunk), np.float32))
            for j in range(len(chunk)):
                gap.update(prefix[j], txt[j])
        for d, text in zip(chunk, texts):
            results.append({"caption": text.lower(), "image_id": d["image_id"]})
        if out_path and (start // B) % max(1, cfg.flush_every // B) == 0:
            with open(out_path, "w") as f:
                json.dump(results, f)
            print(f"[{len(results)}/{len(records)}] {timer} "
                  f"({B / (timer.timings[-1] / 1000.0):.1f} captions/s)",
                  flush=True)
    if out_path:
        with open(out_path, "w") as f:
            json.dump(results, f)
    if cfg.ablation_dist and paraphrase_embeds:
        ablation.calc_distances(paraphrase_embeds, out_file=None)
    if cfg.ablation_image_dist and gap.counter:
        gap.report()
    print(f"final: {timer}", flush=True)
    return results


# ---------------------------------------------------------------------------
# Embedding sources
# ---------------------------------------------------------------------------


def make_image_embed_fn(clip_params, clip_cfg, image_path_fn: Callable,
                        on_missing: str = "skip"):
    """Batched image encoder; missing files get zero embeddings and are
    reported (the reference skips them — predictions_runner.py:206-209)."""
    import jax
    import jax.numpy as jnp
    from ..data.image_ops import load_and_preprocess
    from ..models import clip as clip_lib

    n_px = clip_cfg.vision.image_resolution
    encode = jax.jit(lambda im: clip_lib.encode_image(
        clip_params, clip_cfg, jnp.asarray(im)))
    skips = [0]

    def fn(records):
        imgs = []
        for d in records:
            path = image_path_fn(d)
            if os.path.isfile(path):
                imgs.append(load_and_preprocess(path, n_px))
            else:
                skips[0] += 1
                print(f"skips= {skips[0]}  filename= {path}", flush=True)
                imgs.append(np.zeros((n_px, n_px, 3), np.float32))
        return np.asarray(encode(np.stack(imgs)))

    return fn


def make_text_embed_fn(clip_params, clip_cfg, clip_tokenizer):
    """Caption-text encoder for the text-autoencoder mode."""
    import jax
    import jax.numpy as jnp
    from ..models import clip as clip_lib
    from ..utils.clip_tokenizer import tokenize_with_truncation

    encode = jax.jit(lambda t: clip_lib.encode_text(
        clip_params["text"], clip_cfg.text, jnp.asarray(t)))

    def fn(records):
        rows = [tokenize_with_truncation(clip_tokenizer, d["caption"])[0][0]
                for d in records]
        return np.asarray(encode(np.stack(rows)))

    return fn


def make_pickle_embed_fn(prefixes: np.ndarray):
    """Precomputed-embedding source (tests; offline eval)."""

    def fn(records):
        idx = [d["clip_embedding"] for d in records]
        return prefixes[idx]

    return fn
