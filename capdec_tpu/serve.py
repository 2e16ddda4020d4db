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
  * Bounded request queue (`max_queue`): producers block when the
    server falls behind — backpressure instead of unbounded memory.
  * One batch in flight: the serve loop dispatches batch k+1 before
    blocking on batch k's device->host transfer and detokenization, so
    the accelerator never idles on host work; the rank-0 beam is
    selected on device so only [N, E] tokens cross the (slow) D2H link.
  * Per-request latency (enqueue -> caption yielded) is recorded;
    `latency_percentiles()` reports p50/p95/p99.
  * The decode engine is the production beam/greedy path (same
    BeamConfig/ToppConfig knobs, including kv_cache_int8).
"""
from __future__ import annotations

import dataclasses
import queue
import threading
import time
from typing import Any, Callable, Dict, Iterable, List, Optional, Tuple

import numpy as np

from .decode import (BeamConfig, ToppConfig, beam_search, beam_top_select,
                     greedy_topp_search, topp_texts)
from .models import caption_model


@dataclasses.dataclass
class ServeConfig:
    batch_size: int = 64
    max_wait_s: float = 0.05
    beam: bool = True
    normalize_prefix: bool = True
    # Request-queue capacity: producers (the `requests` feeder thread and
    # `submit()`) block once this many requests are waiting. 0 = unbounded.
    max_queue: int = 4096
    # Latency samples kept for the percentile report (ring buffer).
    latency_window: int = 100_000
    # Optional jax.sharding.Mesh: params replicate, every fixed-shape
    # batch shards over the dp axis (the batch shape never changes, so
    # unlike the eval runner there is no ragged-batch fallback —
    # batch_size must divide by dp). Same mechanism as
    # eval/predictions.py:82-122; decode is embarrassingly parallel
    # over images.
    mesh: Optional[Any] = None
    beam_config: BeamConfig = dataclasses.field(default_factory=BeamConfig)
    topp_config: ToppConfig = dataclasses.field(default_factory=ToppConfig)


def _l2norm(x, axis=-1):
    return x / np.maximum(np.linalg.norm(x, axis=axis, keepdims=True), 1e-12)


class _Shutdown:
    """Queue sentinel that ends serve() regardless of stop_on_exhaust."""


class CaptionServer:
    """Caption CLIP embeddings with fixed-shape batched decode.

    `caption(embeds)` is the synchronous core (pads to the fixed batch).
    `serve(requests)` is the continuous-batching loop: an iterable of
    (request_id, embedding [D]) pairs -> yields (request_id, caption)
    in completion order, coalescing up to `batch_size` per launch.
    While serve() runs, additional requests can be injected from other
    threads with `submit(rid, embed)`; `shutdown()` ends the loop.
    """

    def __init__(self, params: Any,
                 model_cfg: caption_model.CaptionModelConfig,
                 tokenizer, cfg: ServeConfig = ServeConfig()):
        import jax

        self._params = params
        self._model_cfg = model_cfg
        self._tokenizer = tokenizer
        self._cfg = cfg
        self._shard = None
        if cfg.mesh is not None:
            from .parallel import mesh as mesh_lib
            dp = cfg.mesh.shape[mesh_lib.DP_AXIS]
            if cfg.batch_size % dp:
                raise ValueError(
                    f"batch_size {cfg.batch_size} must be divisible by "
                    f"the mesh dp axis ({dp})")
            self._shard = mesh_lib.batch_sharding(cfg.mesh)
            self._params = jax.device_put(params,
                                          mesh_lib.replicated(cfg.mesh))
        self._map_fn = jax.jit(caption_model.map_prefix,
                               static_argnums=(1,))
        self._queue: "queue.Queue[Any]" = queue.Queue(
            maxsize=max(0, cfg.max_queue))
        self._latencies: List[float] = []
        self.stats = {"batches": 0, "requests": 0, "decode_s": 0.0, "batch_span_s": 0.0}

    def warmup(self) -> None:
        """Trigger the one compilation before serving traffic (the warmup
        request is excluded from the serving stats)."""
        D = self._model_cfg.prefix_size
        self.caption(np.zeros((1, D), np.float32))
        self.stats = {"batches": 0, "requests": 0, "decode_s": 0.0, "batch_span_s": 0.0}
        self._latencies = []

    def _launch(self, embeds: np.ndarray) -> Callable[[], List[str]]:
        """Enqueue the device work for `embeds` [n, D] (n <= batch_size,
        padded to the fixed shape) WITHOUT blocking on results. Returns a
        finisher: calling it blocks on device->host transfer and
        detokenization and returns the n captions.

        Serving needs only the ranked-first beam per image, so that
        selection happens ON DEVICE and the finisher fetches [N, E]
        tokens instead of all beam_size candidates — on this relay's
        ~10 MB/s D2H link the difference is real wall time. The split
        lets serve() keep one batch in flight: the device starts batch
        k+1 the moment k completes, instead of idling through k's
        transfer + detokenize + k+1's coalescing."""
        import jax.numpy as jnp

        cfg = self._cfg
        n, D = embeds.shape
        if n > cfg.batch_size:
            raise ValueError(f"{n} requests > batch_size {cfg.batch_size}")
        x = np.zeros((cfg.batch_size, D), np.float32)
        x[:n] = embeds
        if cfg.normalize_prefix:
            x = _l2norm(x)
        if self._shard is not None:
            import jax
            x_dev = jax.device_put(x, self._shard)
        else:
            x_dev = jnp.asarray(x)
        prefix = self._map_fn(self._params, self._model_cfg, x_dev)
        if cfg.beam:
            toks, lens, scores, order = beam_search(
                self._params["gpt"], self._model_cfg.gpt2, prefix,
                cfg.beam_config)
            # [N, E] / [N] on device — D2H is 1/beam_size of beam_texts
            top_toks, top_lens = beam_top_select(toks, lens, order)

            def finish() -> List[str]:
                t = np.asarray(top_toks)
                ln = np.asarray(top_lens)
                return [self._tokenizer.decode(t[i, :int(ln[i])])
                        for i in range(n)]
        else:
            toks, lens = greedy_topp_search(
                self._params["gpt"], self._model_cfg.gpt2, prefix,
                cfg.topp_config)

            def finish() -> List[str]:
                return topp_texts(self._tokenizer,
                                  np.asarray(toks)[:n],
                                  np.asarray(lens)[:n])
        self.stats["batches"] += 1
        self.stats["requests"] += n
        return finish

    def caption(self, embeds: np.ndarray) -> List[str]:
        """Caption `embeds` [n, D], n <= batch_size (padded to the fixed
        shape; padding rows never reach the caller). Synchronous."""
        t0 = time.perf_counter()
        texts = self._launch(embeds)()
        self.stats["decode_s"] += time.perf_counter() - t0
        return texts

    def submit(self, rid: Any, embed: np.ndarray) -> None:
        """Inject a request into a running serve() loop (thread-safe;
        blocks when the queue is full — backpressure)."""
        self._queue.put((rid, embed, time.monotonic()))

    def shutdown(self) -> None:
        """End a running serve() loop after it drains what it has."""
        self._queue.put(_Shutdown)

    def serve(self, requests: Iterable[Tuple[Any, np.ndarray]],
              stop_on_exhaust: bool = True
              ) -> Iterable[Tuple[Any, str]]:
        """Continuous-batching generator.

        Pulls (id, embedding) pairs from `requests` on a feeder thread,
        coalesces up to batch_size (launching early after max_wait_s),
        yields (id, caption). With stop_on_exhaust (default) the loop
        drains and returns when the iterable ends; with
        stop_on_exhaust=False it keeps serving requests injected via
        `submit()` until `shutdown()` is called.

        The loop keeps ONE batch in flight: each iteration coalesces and
        dispatches the next batch to the device BEFORE blocking on the
        previous batch's transfer + detokenization, so the device starts
        batch k+1 the instant k completes instead of idling through k's
        host-side finalization. When a finished batch is waiting and no
        new request is queued, the captions are yielded immediately (the
        coalescing wait never delays delivery of completed work)."""
        cfg = self._cfg
        q = self._queue

        def feeder():
            for rid, emb in requests:
                q.put((rid, emb, time.monotonic()))
            q.put(None)  # exhaust sentinel

        t = threading.Thread(target=feeder, daemon=True)
        t.start()
        done = False
        # (ids, arrivals, finisher) of the batch running on device
        pending: Optional[Tuple[List[Any], List[float], Callable, float]] = None
        while not done or pending is not None:
            batch: List[Tuple[Any, np.ndarray, float]] = []
            deadline = None
            while not done and len(batch) < cfg.batch_size:
                if deadline is not None:
                    timeout = max(0.0, deadline - time.monotonic())
                elif pending is not None:
                    timeout = 0.0  # drain what's queued, don't stall the
                    #                finished batch waiting for traffic
                else:
                    timeout = None
                try:
                    item = q.get(timeout=timeout)
                except queue.Empty:
                    break
                if item is None:  # requests iterable exhausted
                    if stop_on_exhaust:
                        done = True
                        break
                    continue  # keep waiting for submit()/shutdown()
                if item is _Shutdown:
                    done = True
                    break
                batch.append(item)
                if deadline is None:
                    deadline = time.monotonic() + cfg.max_wait_s
            launched = None
            if batch:
                ids = [i for i, _, _ in batch]
                arrivals = [a for _, _, a in batch]
                embeds = np.stack([e for _, e, _ in batch]).astype(
                    np.float32)
                launched = (ids, arrivals, self._launch(embeds),
                            time.perf_counter())
            if pending is not None:
                p_ids, p_arrivals, finish, t_launch = pending
                t0 = time.perf_counter()
                texts = finish()
                t_fin = time.perf_counter()
                # decode_s: the NON-OVERLAPPED critical path only (blocking
                # finish(): D2H + detokenize). Device compute that overlaps
                # the next batch's coalescing is deliberately excluded, so
                # requests/decode_s can exceed the synchronous caption()
                # rate. batch_span_s is the full launch->finish interval per
                # batch (intervals of consecutive batches overlap; their sum
                # can exceed wall time). End-to-end throughput should be
                # measured as served/wall by the caller.
                self.stats["decode_s"] += t_fin - t0
                self.stats["batch_span_s"] += t_fin - t_launch
                t_done = time.monotonic()
                for arr in p_arrivals:
                    self._latencies.append(t_done - arr)
                if len(self._latencies) > cfg.latency_window:
                    del self._latencies[:-cfg.latency_window]
                for rid, text in zip(p_ids, texts):
                    yield rid, text
            pending = launched

    def latency_percentiles(self) -> Dict[str, float]:
        """p50/p95/p99 request latency (seconds, enqueue -> yield) over
        the latest `latency_window` served requests."""
        if not self._latencies:
            return {"p50": 0.0, "p95": 0.0, "p99": 0.0, "n": 0}
        arr = np.asarray(self._latencies)
        return {"p50": float(np.percentile(arr, 50)),
                "p95": float(np.percentile(arr, 95)),
                "p99": float(np.percentile(arr, 99)),
                "n": int(arr.size)}

    def throughput(self) -> float:
        """requests / decode_s. In the synchronous caption() path decode_s
        is the full launch+finish time; in the pipelined serve() loop it is
        only the non-overlapped critical path (blocking finish()), so this
        can exceed the synchronous rate — use served/wall for end-to-end
        serving throughput (scripts/serve_throughput.py does)."""
        s = self.stats
        return s["requests"] / s["decode_s"] if s["decode_s"] else 0.0
