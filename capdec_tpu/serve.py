"""Batch-serving loop: continuous batching over the decode engines.

The reference has no serving story (predictions_runner.py is a one-shot
offline eval loop, batch 1). This module is the production counterpart:
a long-lived server that coalesces caption requests into FIXED-SHAPE
batches for the jitted decode engine (one compile per configuration,
ever), pads ragged tails instead of recompiling, and reports
latency/throughput.

Design for TPU serving:
  * One fixed batch shape: requests are padded up to `batch_size` with
    zero embeddings and the padding rows are dropped host-side. XLA
    never sees a second shape, so there is exactly one compilation.
  * Time/size-based coalescing: a batch launches when `batch_size`
    requests are waiting or `max_wait_s` elapsed with at least one.
  * The decode engine is the production beam/greedy path (same
    BeamConfig/ToppConfig knobs, including kv_cache_int8).
"""
from __future__ import annotations

import dataclasses
import queue
import threading
import time
from typing import Any, Callable, Iterable, List, Optional, Tuple

import numpy as np

from .decode import (BeamConfig, ToppConfig, beam_search, beam_texts,
                     greedy_topp_search, topp_texts)
from .models import caption_model


@dataclasses.dataclass
class ServeConfig:
    batch_size: int = 64
    max_wait_s: float = 0.05
    beam: bool = True
    normalize_prefix: bool = True
    beam_config: BeamConfig = dataclasses.field(default_factory=BeamConfig)
    topp_config: ToppConfig = dataclasses.field(default_factory=ToppConfig)


def _l2norm(x, axis=-1):
    return x / np.maximum(np.linalg.norm(x, axis=axis, keepdims=True), 1e-12)


class CaptionServer:
    """Caption CLIP embeddings with fixed-shape batched decode.

    `caption(embeds)` is the synchronous core (pads to the fixed batch).
    `serve(requests)` is the continuous-batching loop: an iterable of
    (request_id, embedding [D]) pairs -> yields (request_id, caption)
    in completion order, coalescing up to `batch_size` per launch.
    """

    def __init__(self, params: Any,
                 model_cfg: caption_model.CaptionModelConfig,
                 tokenizer, cfg: ServeConfig = ServeConfig()):
        import jax

        self._params = params
        self._model_cfg = model_cfg
        self._tokenizer = tokenizer
        self._cfg = cfg
        self._map_fn = jax.jit(caption_model.map_prefix,
                               static_argnums=(1,))
        self.stats = {"batches": 0, "requests": 0, "decode_s": 0.0}

    def warmup(self) -> None:
        """Trigger the one compilation before serving traffic (the warmup
        request is excluded from the serving stats)."""
        D = self._model_cfg.prefix_size
        self.caption(np.zeros((1, D), np.float32))
        self.stats = {"batches": 0, "requests": 0, "decode_s": 0.0}

    def caption(self, embeds: np.ndarray) -> List[str]:
        """Caption `embeds` [n, D], n <= batch_size (padded to the fixed
        shape; padding rows never reach the caller)."""
        import jax.numpy as jnp

        cfg = self._cfg
        n, D = embeds.shape
        if n > cfg.batch_size:
            raise ValueError(f"{n} requests > batch_size {cfg.batch_size}")
        x = np.zeros((cfg.batch_size, D), np.float32)
        x[:n] = embeds
        if cfg.normalize_prefix:
            x = _l2norm(x)
        t0 = time.perf_counter()
        prefix = self._map_fn(self._params, self._model_cfg,
                              jnp.asarray(x))
        if cfg.beam:
            toks, lens, scores, order = beam_search(
                self._params["gpt"], self._model_cfg.gpt2, prefix,
                cfg.beam_config)
            texts = [t[0] for t in
                     beam_texts(self._tokenizer, toks, lens, order)]
        else:
            toks, lens = greedy_topp_search(
                self._params["gpt"], self._model_cfg.gpt2, prefix,
                cfg.topp_config)
            texts = topp_texts(self._tokenizer, toks, lens)
        self.stats["decode_s"] += time.perf_counter() - t0
        self.stats["batches"] += 1
        self.stats["requests"] += n
        return texts[:n]

    def serve(self, requests: Iterable[Tuple[Any, np.ndarray]],
              stop_on_exhaust: bool = True
              ) -> Iterable[Tuple[Any, str]]:
        """Continuous-batching generator.

        Pulls (id, embedding) pairs from `requests` on a feeder thread,
        coalesces up to batch_size (launching early after max_wait_s),
        yields (id, caption). With stop_on_exhaust the loop drains and
        returns when the iterable ends."""
        cfg = self._cfg
        q: "queue.Queue[Optional[Tuple[Any, np.ndarray]]]" = queue.Queue()

        def feeder():
            for item in requests:
                q.put(item)
            q.put(None)  # sentinel

        t = threading.Thread(target=feeder, daemon=True)
        t.start()
        done = False
        while not done:
            batch: List[Tuple[Any, np.ndarray]] = []
            deadline = None
            while len(batch) < cfg.batch_size:
                timeout = (None if deadline is None
                           else max(0.0, deadline - time.monotonic()))
                try:
                    item = q.get(timeout=timeout)
                except queue.Empty:
                    break
                if item is None:
                    done = True
                    break
                batch.append(item)
                if deadline is None:
                    deadline = time.monotonic() + cfg.max_wait_s
            if not batch:
                continue
            ids = [i for i, _ in batch]
            embeds = np.stack([e for _, e in batch]).astype(np.float32)
            for rid, text in zip(ids, self.caption(embeds)):
                yield rid, text

    def throughput(self) -> float:
        s = self.stats
        return s["requests"] / s["decode_s"] if s["decode_s"] else 0.0
