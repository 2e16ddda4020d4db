"""Batch-serving layer: fixed-shape padded batching, continuous
coalescing, and the serving CLI's pickle mode (tiny model on CPU)."""
import json
import pickle
import time

import numpy as np
import pytest

import jax

from capdec_tpu import serve as serve_lib
from capdec_tpu.models import caption_model, gpt2
from capdec_tpu.utils.tokenizer import ByteTokenizer

TINY = caption_model.CaptionModelConfig(
    prefix_length=4, clip_length=4, prefix_size=16, num_layers=1,
    mapping_type="mlp",
    gpt2=gpt2.GPT2Config(vocab_size=128, n_positions=48, n_embd=32,
                         n_layer=1, n_head=4))


@pytest.fixture(scope="module")
def server():
    params = caption_model.init_params(jax.random.PRNGKey(0), TINY)
    cfg = serve_lib.ServeConfig(
        batch_size=8, max_wait_s=0.01,
        beam_config=serve_lib.BeamConfig(beam_size=3, entry_length=6,
                                         stop_token=-1))
    return serve_lib.CaptionServer(params, TINY, ByteTokenizer(), cfg)


@pytest.mark.slow
def test_padding_never_leaks_and_results_match_full_batch(server):
    """A ragged request set padded to the fixed batch returns exactly the
    captions the same rows get in a full batch (padding rows dropped)."""
    rng = np.random.RandomState(0)
    embeds = rng.randn(8, TINY.prefix_size).astype(np.float32)
    full = server.caption(embeds)
    assert len(full) == 8
    part = server.caption(embeds[:3])
    assert part == full[:3]
    with pytest.raises(ValueError):
        server.caption(rng.randn(9, TINY.prefix_size).astype(np.float32))


@pytest.mark.slow
def test_mesh_sharded_serving_matches_unsharded(server):
    """ServeConfig.mesh: the fixed batch shards over dp; captions must be
    identical to the single-device server (decode is embarrassingly
    parallel over images). Runs on the 8-virtual-device CPU backend."""
    from capdec_tpu.parallel import mesh as mesh_lib
    params = caption_model.init_params(jax.random.PRNGKey(0), TINY)
    cfg = serve_lib.ServeConfig(
        batch_size=8, max_wait_s=0.01, mesh=mesh_lib.make_mesh(dp=8, tp=1),
        beam_config=serve_lib.BeamConfig(beam_size=3, entry_length=6,
                                         stop_token=-1))
    srv = serve_lib.CaptionServer(params, TINY, ByteTokenizer(), cfg)
    rng = np.random.RandomState(0)
    embeds = rng.randn(8, TINY.prefix_size).astype(np.float32)
    assert srv.caption(embeds) == server.caption(embeds)
    # ragged request counts still work — padding fills the fixed shape
    assert srv.caption(embeds[:5]) == server.caption(embeds)[:5]
    with pytest.raises(ValueError):
        serve_lib.CaptionServer(
            params, TINY, ByteTokenizer(),
            serve_lib.ServeConfig(batch_size=6,
                                  mesh=mesh_lib.make_mesh(dp=8, tp=1)))


def test_serve_coalesces_and_answers_every_request(server):
    rng = np.random.RandomState(1)
    n = 19  # not a batch multiple: exercises ragged tails
    embeds = rng.randn(n, TINY.prefix_size).astype(np.float32)

    def slow_requests():
        for i in range(n):
            if i == 10:
                time.sleep(0.05)  # force a timeout-launched partial batch
            yield i, embeds[i]

    got = dict(server.serve(slow_requests()))
    assert sorted(got) == list(range(n))
    assert all(isinstance(v, str) for v in got.values())
    # answers must equal the synchronous path for the same embedding
    direct = server.caption(embeds[:1])[0]
    assert got[0] == direct


@pytest.mark.slow
def test_serve_cli_pickle_mode(tmp_path, capsys, monkeypatch):
    """The serving CLI end-to-end: full GPT-2 sized checkpoint (the CLI
    contract), short decode, JSONL output + throughput summary."""
    from capdec_tpu.cli import serve as serve_cli
    from capdec_tpu.utils import checkpoint as ckpt_lib

    monkeypatch.setenv("CAPDEC_JAX_CACHE", str(tmp_path / "jaxcache"))
    full = caption_model.CaptionModelConfig(
        prefix_length=2, clip_length=2, prefix_size=16, num_layers=1,
        mapping_type="mlp", gpt2=gpt2.GPT2Config())
    params = caption_model.init_params(jax.random.PRNGKey(2), full)
    ckpt = str(tmp_path / "tiny.pt")
    ckpt_lib.save_caption_checkpoint(params, full, ckpt)

    rng = np.random.RandomState(3)
    data = {"clip_embedding": rng.randn(10, full.prefix_size
                                        ).astype(np.float32),
            "captions": [], "clip_embedding_text_dave": None}
    pkl = str(tmp_path / "emb.pkl")
    pickle.dump(data, open(pkl, "wb"))

    serve_cli.main([
        "--checkpoint", ckpt, "--embeddings_pickle", pkl,
        "--batch_size", "4", "--no_bf16",
        "--prefix_dim", str(full.prefix_size),
        "--prefix_length", "2", "--prefix_length_clip", "2",
        "--num_layers", "1", "--mapping_type", "mlp",
        "--beam_size", "3", "--entry_length", "5"])
    lines = [json.loads(line) for line in
             capsys.readouterr().out.strip().splitlines()]
    served = [r for r in lines if "caption" in r]
    summary = [r for r in lines if "captions_per_s" in r]
    assert len(served) == 10
    assert summary and summary[0]["served"] == 10


def test_serve_keeps_running_past_exhaust_and_honors_shutdown(server):
    """With stop_on_exhaust=False the loop outlives the request iterable:
    requests injected later via submit() are still served, and shutdown()
    ends it (the ADVICE r2 finding: the flag used to be ignored)."""
    import threading

    rng = np.random.RandomState(4)
    e0, e1 = (rng.randn(TINY.prefix_size).astype(np.float32)
              for _ in range(2))
    results = []

    def run():
        for rid, text in server.serve(iter([("early", e0)]),
                                      stop_on_exhaust=False):
            results.append((rid, text))

    t = threading.Thread(target=run, daemon=True)
    t.start()
    deadline = time.monotonic() + 10
    while len(results) < 1 and time.monotonic() < deadline:
        time.sleep(0.01)
    assert [r for r, _ in results] == ["early"]  # iterable exhausted here
    server.submit("late", e1)                    # loop must still be alive
    while len(results) < 2 and time.monotonic() < deadline:
        time.sleep(0.01)
    assert [r for r, _ in results] == ["early", "late"]
    server.shutdown()
    t.join(timeout=10)
    assert not t.is_alive()


@pytest.mark.slow
def test_serve_latency_percentiles_under_poisson_load(server):
    """A Poisson arrival stream: every request is answered and the serving
    stats pin tail latency (p50 <= p95 <= p99, all positive and bounded
    by the run's wall time)."""
    rng = np.random.RandomState(5)
    n = 40
    embeds = rng.randn(n, TINY.prefix_size).astype(np.float32)
    # ~2000 req/s Poisson arrivals against a tiny model: keeps the test
    # fast while still exercising timeout-launched partial batches.
    gaps = rng.exponential(scale=1 / 2000.0, size=n)

    def poisson_requests():
        for i in range(n):
            time.sleep(gaps[i])
            yield i, embeds[i]

    t0 = time.monotonic()
    got = dict(server.serve(poisson_requests()))
    wall = time.monotonic() - t0
    assert sorted(got) == list(range(n))
    pct = server.latency_percentiles()
    assert pct["n"] >= n
    assert 0 < pct["p50"] <= pct["p95"] <= pct["p99"] <= wall + 1.0


@pytest.mark.slow
def test_serve_queue_backpressure():
    """max_queue bounds the request queue: a producer faster than the
    consumer blocks in submit() instead of growing memory."""
    import threading

    params = caption_model.init_params(jax.random.PRNGKey(0), TINY)
    cfg = serve_lib.ServeConfig(
        batch_size=2, max_wait_s=0.01, max_queue=3,
        beam_config=serve_lib.BeamConfig(beam_size=3, entry_length=4,
                                         stop_token=-1))
    srv = serve_lib.CaptionServer(params, TINY, ByteTokenizer(), cfg)
    emb = np.zeros(TINY.prefix_size, np.float32)
    submitted = []

    def producer():
        for i in range(12):
            srv.submit(i, emb)  # blocks when 3 are queued
            submitted.append(i)
        srv.shutdown()

    t = threading.Thread(target=producer, daemon=True)
    t.start()
    time.sleep(0.2)
    # the queue bound must have stopped the producer well short of 12
    assert len(submitted) <= 3 + 1  # capacity + one blocked in put()
    got = dict(srv.serve(iter([]), stop_on_exhaust=False))
    t.join(timeout=10)
    assert sorted(got) == list(range(12))


def test_watch_requests_picks_up_new_files(tmp_path):
    """The watch-mode request source: yields each .npy once, tolerates
    unreadable files (retried next poll), preserves sorted order."""
    from capdec_tpu.cli.serve import _watch_requests
    d = str(tmp_path)
    np.save(f"{d}/a.npy", np.ones(4, np.float32))
    np.save(f"{d}/b.npy", np.full(4, 2.0, np.float32))
    open(f"{d}/broken.npy", "wb").write(b"not-an-npy")
    gen = _watch_requests(d, poll_s=0.01)
    first = next(gen)
    second = next(gen)
    paths = {p for p, _ in (first, second)}
    assert paths == {f"{d}/a.npy", f"{d}/b.npy"}
    np.save(f"{d}/c.npy", np.zeros(4, np.float32))
    path3, emb3 = next(gen)
    assert path3 == f"{d}/c.npy"
    np.testing.assert_array_equal(emb3, np.zeros(4, np.float32))


def test_watch_requests_gives_up_on_permanently_bad_file(tmp_path):
    """A corrupt .npy is retried a bounded number of times, then marked
    seen for good; a rewritten (new-mtime) file is served again."""
    import os

    from capdec_tpu.cli.serve import _watch_requests
    d = str(tmp_path)
    open(f"{d}/bad.npy", "wb").write(b"never-valid")
    gen = _watch_requests(d, poll_s=0.0, max_retries=3)
    # Nothing valid yet: drive polls by adding a good file, which bounds
    # how long next(gen) can block.
    np.save(f"{d}/ok.npy", np.ones(2, np.float32))
    assert next(gen)[0] == f"{d}/ok.npy"
    # let several polls pass; the bad file must stop being retried
    np.save(f"{d}/ok2.npy", np.ones(2, np.float32))
    assert next(gen)[0] == f"{d}/ok2.npy"
    for i in range(5):
        np.save(f"{d}/z{i}.npy", np.ones(2, np.float32))
        assert next(gen)[0] == f"{d}/z{i}.npy"
    # rewrite bad.npy validly with a fresh mtime: served exactly once
    np.save(f"{d}/bad.npy", np.full(2, 7.0, np.float32))
    os.utime(f"{d}/bad.npy")
    path, emb = next(gen)
    assert path == f"{d}/bad.npy"
    np.testing.assert_array_equal(emb, np.full(2, 7.0, np.float32))
