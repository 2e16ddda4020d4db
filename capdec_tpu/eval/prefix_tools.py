"""Prefix-interpretation tools (reference gpt2_prefix_eval.py:201-292).

Qualitative utilities for poking at learned prefixes:
  * nearest-vocab-token readout of prefix embeddings (cosine vs wte)
  * prefix editing: insert a text span's embeddings at a position, delete
    positions, try-all-insertion-points
  * a qualitative inspection loop over chosen image ids
"""
from __future__ import annotations

from typing import Any, List, Optional, Sequence

import numpy as np

import jax.numpy as jnp

from ..decode import BeamConfig, ToppConfig, beam_search, beam_texts, \
    greedy_topp_search, topp_texts
from ..models import caption_model, gpt2


def get_prefix_tokens(params: Any, prefix_embed: jnp.ndarray,
                      tokenizer) -> str:
    """Decode each prefix slot to its nearest vocab token (reference
    :247-251): cosine similarity of the normalized prefix against the
    normalized embedding table, argmax, detokenize."""
    wte = params["gpt"]["wte"]
    wte_n = wte / jnp.maximum(
        jnp.linalg.norm(wte, axis=-1, keepdims=True), 1e-12)
    pe = prefix_embed[0]
    pe_n = pe / jnp.maximum(jnp.linalg.norm(pe, axis=-1, keepdims=True), 1e-12)
    sim = jnp.einsum("pd,nd->pn", pe_n, wte_n)
    ids = np.asarray(jnp.argmax(sim, axis=-1))
    return tokenizer.decode(ids)


def add_embedding_from_text(params: Any, text: str, prefix_embed: jnp.ndarray,
                            tokenizer, where: int) -> jnp.ndarray:
    """Insert the wte embeddings of `text` into the prefix at `where`
    (reference :201-212; -1 or len appends)."""
    ids = jnp.asarray(tokenizer.encode(text))
    tok_embed = gpt2.embed_tokens(params["gpt"], ids)[None]
    P = prefix_embed.shape[1]
    if where == -1 or where == P:
        parts = (prefix_embed, tok_embed)
    elif where == 0:
        parts = (tok_embed, prefix_embed)
    else:
        parts = (prefix_embed[:, :where], tok_embed, prefix_embed[:, where:])
    return jnp.concatenate(parts, axis=1)


def remove_positions(prefix_embed: jnp.ndarray,
                     where: Sequence[int]) -> jnp.ndarray:
    """Drop prefix slots (reference :229-237)."""
    keep = [i for i in range(prefix_embed.shape[1]) if i not in set(where)]
    return prefix_embed[:, keep]


def generate_text(params: Any, cfg: caption_model.CaptionModelConfig,
                  prefix_embed: jnp.ndarray, tokenizer,
                  use_beam: bool = True) -> str:
    if use_beam:
        toks, lens, scores, order = beam_search(
            params["gpt"], cfg.gpt2, prefix_embed, BeamConfig())
        return beam_texts(tokenizer, toks, lens, order)[0][0]
    toks, lens = greedy_topp_search(params["gpt"], cfg.gpt2, prefix_embed,
                                    ToppConfig())
    return topp_texts(tokenizer, toks, lens)[0]


def re_caption(params: Any, cfg, add_in: str, prefix_embed, tokenizer,
               where: int, use_beam: bool = True) -> str:
    new_prefix = add_embedding_from_text(params, add_in, prefix_embed,
                                         tokenizer, where)
    return generate_text(params, cfg, new_prefix, tokenizer, use_beam)


def try_all_places(params: Any, cfg, add_in: str, prefix_embed, tokenizer,
                   use_beam: bool = True) -> List[str]:
    return [re_caption(params, cfg, add_in, prefix_embed, tokenizer, i,
                       use_beam)
            for i in range(prefix_embed.shape[1])]


def inspect_samples(params: Any, cfg: caption_model.CaptionModelConfig,
                    dataset, tokenizer, image_ids: Sequence,
                    use_beam: bool = True,
                    max_items: Optional[int] = None) -> List[dict]:
    """Qualitative loop (reference :254-292): for each matching sample,
    print GT caption, prefix readout, and the generated caption."""
    wanted = {str(i) for i in image_ids}
    out = []
    for idx in range(len(dataset)):
        if str(dataset.image_ids[idx]) not in wanted:
            continue
        prefix = jnp.asarray(dataset.batch_prefixes(np.asarray([idx])))
        prefix_embed = caption_model.map_prefix(params, cfg, prefix)
        readout = get_prefix_tokens(params, prefix_embed, tokenizer)
        text = generate_text(params, cfg, prefix_embed, tokenizer, use_beam)
        rec = {"image_id": dataset.image_ids[idx],
               "gt": dataset.captions[idx],
               "prefix_tokens": readout, "generated": text}
        print(f"-=({idx})=-\nCaption:\n{rec['gt']}\n>>>>> Generate from "
              f"prefix\n{text}", flush=True)
        out.append(rec)
        if max_items and len(out) >= max_items:
            break
    return out
