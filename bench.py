"""Headline benchmark: captions/sec/chip at beam=5 on the flagship model.

Prints ONE JSON line on stdout: {"metric", "value", "unit", "vs_baseline", ...}.

Setup mirrors the reference's eval hot path (predictions_runner.py:229-232,
gpt2_prefix_eval.py:50-115): GPT-2 base + TransformerMapper(8L) prefixes of
length 40, beam 5, 67 decode steps. Weights are random (zero-egress
environment) — decode throughput is weight-independent; stopping is
disabled so every caption runs the full 67 steps (worst case, conservative).

`vs_baseline` is measured, not assumed: we time a faithful re-creation of
the *reference algorithm* on the same chip — batch-1, no KV cache, full
re-forward over the growing sequence each step — and report the ratio.

CRASH-PROOF STRUCTURE (round-3 postmortem): round 3's single-process bench
died with RESOURCE_EXHAUSTED on a tiny H2D copy after earlier sections
fragmented HBM, and the one trailing print lost EVERY measurement. Now each
section runs in its OWN subprocess (fresh TPU allocator, nothing leaks
across sections), the parent collects results incrementally with per-section
try/except + timeouts + smaller-batch fallbacks, and the final JSON emits in
a `finally:` no matter which sections failed. All diagnostics go to stderr;
stdout carries exactly the one JSON line.

MEASUREMENT HONESTY (round-4 finding): on the relay-tunneled axon backend,
`jax.block_until_ready` returns without waiting for remote execution —
timed loops without a host fetch measure dispatch latency, not compute
(observed: 0.07 ms/"step" for a GPT-2 forward that takes ~50 ms with a
real sync). Every timed iteration below therefore (a) ends with a small
D2H fetch of the result — the only operation that provably waits — and
(b) uses a DIFFERENT input buffer, so no cache/memo layer anywhere in the
stack can serve a repeat. For the naive reference baseline the per-step
host sync is also faithful: the reference's beam loop syncs every step
(`if is_stopped.all(): break`, gpt2_prefix_eval.py:108).

TIMEOUT-PROOF STRUCTURE (round-5, after r3 rc=1 and r4 rc=124 both left
`parsed: null`): measured this round, a single first-execution of a
GPT-2-sized program through the remote-compile relay costs anywhere from
30 s to 1300 s — the SAME mapper program compiled in 219 s and 1266 s
twenty minutes apart — while post-compile timed runs are stable to 0.5%.
Neither the client persistent cache nor any server-side cache reliably
covers these programs, so compile cost is unpredictable external
contention and no ordering can guarantee every section fits the driver
budget. Therefore:
  * the current best-effort JSON line is printed+flushed to stdout after
    EVERY section (last line wins) and again from a SIGTERM/SIGINT
    handler — a kill at any moment leaves everything measured so far;
  * the orchestrator keeps its own wall-clock deadline
    (CAPDEC_BENCH_BUDGET seconds, default 1620 — inside the driver's
    observed ~1800 s cap) and SKIPS remaining sections when the budget
    runs out, exiting 0 with `sections_skipped` listing what was cut;
  * sections run in strict information-value order: the headline beam
    number first, then the MFU/peak and training-baseline fields the
    BASELINE.md table needs, then the serving/embed/int8/greedy extras;
  * warmup-only programs were cut where provably value-independent: the
    greedy section's prefix mapper (one 219–1266 s first-run, used only
    to build inputs OUTSIDE the timed region) is replaced by on-device
    synthesis — greedy does fixed work per step (argmax, no fork
    copies, stop disabled). The BEAM section keeps the real mapper:
    fork-copy count depends on the logit distribution, and synthetic
    unit-normal prefixes measured 237.6 caps/s vs ~255 through the
    mapper (round 5) — not comparable;
  * per-iteration times use the MEDIAN, so one contention spike cannot
    skew a headline number.
"""
import argparse
import json
import os
import signal
import subprocess
import sys
import time

class _LazyNumpy:
    """Deferred `import numpy as np`. This container's sitecustomize
    imports ALL of jax at every interpreter start (~2.3 s warm); the
    contract tests therefore run the orchestrator under `python -S`,
    where site-packages is absent — numpy must not be imported until a
    real section needs it (the orchestrator itself is stdlib-only)."""

    def __getattr__(self, name):
        import numpy
        globals()["np"] = numpy  # swap the real module in after first use
        return getattr(numpy, name)


np = _LazyNumpy()

_REPO = os.path.dirname(os.path.abspath(__file__))


# ---------------------------------------------------------------------------
# Section implementations — each runs inside a child process.
# ---------------------------------------------------------------------------

def _jax_init():
    from capdec_tpu.utils.jax_setup import setup_jax
    setup_jax()
    import jax
    return jax


def _flagship_cfg(only_prefix: bool = False):
    import jax.numpy as jnp
    from capdec_tpu.models import caption_model, gpt2
    return caption_model.CaptionModelConfig(
        prefix_length=40, clip_length=40, prefix_size=640, num_layers=8,
        mapping_type="transformer", only_prefix=only_prefix,
        gpt2=gpt2.GPT2Config(compute_dtype=jnp.bfloat16))


def section_peak(args):
    """Chip's achievable bf16 matmul peak (denominator for the MFU figure).

    Runs on an empty chip (own process): the two 8192^2 operands need a
    contiguous 256 MB which a fragmented allocator may not carve out —
    exactly the r3 failure mode, now structurally impossible.
    """
    jax = _jax_init()
    import jax.numpy as jnp

    rng = np.random.RandomState(0)
    a8 = jnp.asarray(rng.randn(8192, 8192), jnp.bfloat16)
    b8 = jnp.asarray(rng.randn(8192, 8192), jnp.bfloat16)

    @jax.jit
    def mm(a, b, seed):
        def body(s, _):
            out = jnp.dot(a + (s * 1e-30).astype(a.dtype), b,
                          preferred_element_type=jnp.float32)
            return out.sum() * 1e-30, None
        # carry starts at `seed` so every timed call computes on distinct
        # operand values (the 1e-30 perturbation never changes bf16 bits,
        # but no layer can prove that without running the matmuls).
        # 128 chained matmuls (~0.7 s) amortize the ~30 ms relay RTT of
        # the per-call D2H sync to <5%.
        s, _ = jax.lax.scan(body, seed, None, length=128)
        return s

    float(mm(a8, b8, jnp.float32(-1.0)))  # compile + first run, synced
    t0 = time.perf_counter()
    iters = 3
    for i in range(iters):
        float(mm(a8, b8, jnp.float32(i)))  # D2H fetch = honest sync
    peak = 2 * 8192 ** 3 * 128 / ((time.perf_counter() - t0) / iters)
    return {"peak_flops": peak}


def _synth_prefixes(jax, n, k, d, iters):
    """Device-resident prefix-embedding batches, one DISTINCT buffer per
    timed iteration. Replaces running the jitted mapper to build inputs:
    the mapper ran OUTSIDE the timed region anyway, so its only bench
    contribution was a 219–1266 s first-run compile (measured round 5) —
    decode throughput does not depend on how the prefixes were made."""
    import jax.numpy as jnp
    gen = jax.jit(lambda key: jax.random.normal(key, (n, k, d), jnp.float32))
    out = []
    for i in range(iters):
        p = gen(jax.random.PRNGKey(i))
        np.asarray(p[0, 0, :1])  # sync: resident before timing starts
        out.append(p)
    return out


def _median(xs):
    return float(np.median(xs))


def section_naive_decode(args):
    """Reference-algorithm decode baseline on the same chip: batch-1,
    beam-5, no KV cache — re-forward the full growing sequence every step
    (gpt2_prefix_eval.py:76) at the mean decode length. The per-step D2H
    fetch is part of the reference algorithm: its loop host-syncs every
    step on `is_stopped.all()` (gpt2_prefix_eval.py:108).

    MEDIAN per-step time (round-5 correction): the r4 driver figure of
    0.1229 caps/s was a contention-skewed MEAN — the measured per-step
    distribution on this relay is a stable 26-35 ms with occasional
    ~1000 ms relay stalls (16-step probe: median 30.5 ms, one 973 ms
    outlier dragging the mean to 89 ms). The honest steady-state rate is
    ~0.43-0.49 caps/s (r2 measured 0.577 the same way), which makes
    vs_baseline ~500x, not the ~2100x the skewed mean implied."""
    jax = _jax_init()
    import jax.numpy as jnp
    from capdec_tpu.models import caption_model, gpt2

    cfg = _flagship_cfg()
    params = caption_model.init_params(jax.random.PRNGKey(0), cfg)
    E = 67

    @jax.jit
    def naive_step(p, embeds):
        return gpt2.forward(p, cfg.gpt2, embeds)[:, -1, :]

    rng = np.random.RandomState(0)
    seqs = [jnp.asarray(rng.randn(5, cfg.prefix_length + E // 2, 768),
                        jnp.float32) for _ in range(6)]
    np.asarray(naive_step(params["gpt"], seqs[0]))  # compile, synced
    times = []
    for seq in seqs:  # distinct input every step: no memo can serve it
        t0 = time.perf_counter()
        np.asarray(naive_step(params["gpt"], seq)[0, :1])
        times.append(time.perf_counter() - t0)
    return {"baseline_captions_per_sec": 1.0 / (_median(times) * E)}


def section_beam(args):
    """Beam-5 full-67-step decode throughput at batch `--n`.

    --int8 switches on the opt-in int8 KV cache (serving knob, not
    token-identical). --slot-chunks/--cache-stages select the chunked
    fused-attention kernel (v3) + single full-size cache configuration.
    """
    jax = _jax_init()
    import dataclasses
    from capdec_tpu.decode import BeamConfig, beam_search
    from capdec_tpu.models import caption_model

    cfg = _flagship_cfg()
    params = caption_model.init_params(jax.random.PRNGKey(0), cfg)
    N = args.n
    iters = 5
    # One distinct device-resident prefix batch per timed iteration,
    # produced by the REAL mapper: beam throughput is value-DEPENDENT
    # (fork-copy count varies with the logit distribution — synthetic
    # unit-normal prefixes measured 237.6 caps/s vs 255 through the
    # mapper, round 5), so the mapper's one first-run compile is the
    # price of a number comparable to r2–r4 and to production.
    import jax.numpy as jnp
    rng = np.random.RandomState(0)
    map_fn = jax.jit(caption_model.map_prefix, static_argnums=(1,))
    prefixes = []
    for _ in range(iters):
        p = map_fn(params, cfg,
                   jnp.asarray(rng.randn(N, cfg.prefix_size), jnp.float32))
        np.asarray(p[0, 0, :1])  # sync the H2D+map out of the timed region
        prefixes.append(p)

    # stop disabled: every caption runs the full 67 steps (worst case).
    bc = BeamConfig(beam_size=5, entry_length=67, stop_token=-1)
    if args.int8:
        bc = dataclasses.replace(bc, kv_cache_int8=True, fused_attention=True)
    if args.slot_chunks:
        bc = dataclasses.replace(bc, fused_slot_chunks=args.slot_chunks,
                                 cache_stages=args.cache_stages or 1,
                                 fused_attention=True)
    elif args.cache_stages:
        # staging knob alone (e.g. --cache-stages 1: one full-size cache
        # from step 0 — no grow copies, no transient double allocation)
        bc = dataclasses.replace(bc, cache_stages=args.cache_stages)
    if args.block_beams:
        bc = dataclasses.replace(bc, fused_block_beams=args.block_beams)
    if args.full_alloc >= 0:
        # A/B knob: -1 = resolve_config default, 0/1 force off/on
        bc = dataclasses.replace(bc, full_alloc=bool(args.full_alloc))

    def run(prefix_embeds):
        toks, lens, scores, order = beam_search(params["gpt"], cfg.gpt2,
                                                prefix_embeds, bc)
        np.asarray(toks[0, 0, :1])  # D2H fetch = honest sync

    run(prefixes[0])  # compile
    times = []
    for p in prefixes:
        t0 = time.perf_counter()
        run(p)
        times.append(time.perf_counter() - t0)
    return {"captions_per_sec": N / _median(times), "n": N}


def section_greedy(args):
    """Greedy/top-p decode (reference generate2 path) at batch `--ng`."""
    jax = _jax_init()
    from capdec_tpu.decode.topp import ToppConfig, greedy_topp_search
    from capdec_tpu.models import caption_model

    cfg = _flagship_cfg()
    params = caption_model.init_params(jax.random.PRNGKey(0), cfg)
    NG = args.ng
    iters = 5
    # Synthetic prefixes are safe HERE (unlike the beam section): greedy
    # does fixed work per step — argmax, no fork copies, stop disabled —
    # so throughput is value-independent and the mapper's 100-1300s
    # first-run compile buys nothing.
    prefixes = _synth_prefixes(jax, NG, cfg.prefix_length, 768, iters)
    tc = ToppConfig(entry_length=67, stop_token=-1, extra_stop_token=-1)

    def run(greedy_prefix):
        toks, _ = greedy_topp_search(params["gpt"], cfg.gpt2, greedy_prefix,
                                     tc)
        np.asarray(toks[0, 0])  # honest D2H sync

    run(prefixes[0])  # compile
    times = []
    for p in prefixes:
        t0 = time.perf_counter()
        run(p)
        times.append(time.perf_counter() - t0)
    return {"greedy_captions_per_sec": NG / _median(times), "ng": NG}


def section_train(args):
    """Training throughput: the reference bs=30 contract (train.py:419 COCO
    preset) plus the throughput-optimal batch, and MFU at that batch (XLA
    cost-analysis FLOPs over the chip's measured bf16 matmul peak, passed
    in via --peak-flops from the `peak` section)."""
    jax = _jax_init()
    import jax.numpy as jnp
    from capdec_tpu.models import caption_model
    from capdec_tpu.train import optim as optim_lib
    from capdec_tpu.train import step as step_lib

    T = 40
    cfg_t = _flagship_cfg(only_prefix=True)
    params_t = caption_model.init_params(jax.random.PRNGKey(1), cfg_t)
    tx = optim_lib.make_optimizer(
        2e-5, warmup_steps=5000, total_steps=100000,
        trainable_mask=caption_model.trainable_mask(params_t, cfg_t))
    multi_step = step_lib.make_train_multi_step(
        cfg_t, tx, step_lib.NoiseConfig(variance=0.016))
    key = jax.random.PRNGKey(2)
    rng = np.random.RandomState(0)

    def measure_train(bs, K=16):
        """Sustained-training samples/s at batch `bs`: K steps per compiled
        dispatch (lax.scan, bit-identical to K single steps — train/step.py).
        Returns (samples/s, model FLOPs per step from XLA cost analysis).

        Two sync protocols (relay `block_until_ready` is a no-op, see
        module docstring): (a) fetch one loss element per dispatch, (b)
        chain all dispatches through the donated state (device-side data
        dependency serializes them) and fetch once at the end. Both are
        honest — (b) matches a real training loop that only reads losses
        at logging cadence; report the better one."""
        batches = []
        for _ in range(2):  # distinct batch per dispatch, alternating
            b = {
                "tokens": np.asarray(rng.randint(1, 50257, (bs, T)),
                                     np.int32),
                "mask": np.ones((bs, 80), np.float32),
                "prefix": np.asarray(rng.randn(bs, 640), np.float32),
            }
            batches.append({k: jnp.asarray(np.broadcast_to(v, (K,) + v.shape))
                            for k, v in b.items()})
        state = step_lib.init_train_state(
            jax.tree.map(lambda a: a.copy(), params_t), tx)
        # Analytic matmul FLOPs (utils/flops.py). XLA cost_analysis on
        # this backend under-reports several-fold and varies across runs
        # (409 and 897 GFLOP observed for the bs=120 step whose matmuls
        # alone are ~6.2 TFLOP), so it is kept only as a diagnostic field.
        from capdec_tpu.utils.flops import train_step_matmul_flops
        flops = train_step_matmul_flops(cfg_t, bs, T)
        try:
            cost = (multi_step.lower(state, batches[0], key).compile()
                    .cost_analysis())
            if cost:
                c = cost[0] if isinstance(cost, (list, tuple)) else cost
                measure_train.xla_flops = float(c.get("flops", 0.0)) / K
        except Exception:
            pass
        state, losses = multi_step(state, batches[0], key)  # compile
        float(losses[-1])
        iters = 4
        # protocol (a): per-dispatch loss fetch
        t0 = time.perf_counter()
        for i in range(iters):
            state, losses = multi_step(state, batches[i % 2], key)
            float(losses[-1])
        sps_a = bs * K * iters / (time.perf_counter() - t0)
        # protocol (b): chained dispatches, one final fetch
        t0 = time.perf_counter()
        for i in range(iters):
            state, losses = multi_step(state, batches[i % 2], key)
        float(losses[-1])
        sps_b = bs * K * iters / (time.perf_counter() - t0)
        del state, batches, losses
        return max(sps_a, sps_b), flops

    train_sps, contract_flops = measure_train(30)
    out = {"train_samples_per_sec_contract": train_sps}
    # Throughput-optimal batch (VERDICT r2: show the TPU-appropriate number
    # alongside the parity contract). Measured knee bs=120 on v5e across
    # rounds 3+4 (scripts/train_scaling.py: 256 slower, 512 OOMs), so only
    # the knee is re-measured — a third compile bought no information and
    # compile time is the budget killer on this relay. Guarded so an OOM
    # on a different chip degrades to the contract number.
    best_sps, best_bs, best_flops = train_sps, 30, contract_flops
    if not args.contract_only:
        for bs_opt in (120,):
            try:
                sps, flops = measure_train(bs_opt, K=8)
            except Exception as e:
                print(f"train bs={bs_opt} failed: {e!r}", file=sys.stderr)
                continue
            if sps > best_sps:
                best_sps, best_bs, best_flops = sps, bs_opt, flops
    out.update(train_samples_per_sec_best=best_sps, train_best_batch=best_bs)
    # Always report the analytic FLOPs: the orchestrator recomputes MFU
    # from them if the peak section only succeeds on its late retry.
    out["train_model_flops_per_step"] = best_flops
    xla_flops = getattr(measure_train, "xla_flops", 0.0)
    if xla_flops:
        out["train_xla_cost_analysis_flops"] = xla_flops  # diagnostic
    if best_flops > 0 and args.peak_flops > 0:
        step_t_best = best_bs / best_sps
        out["train_mfu_best"] = best_flops / step_t_best / args.peak_flops
    else:
        out["train_mfu_best"] = -1.0
    return out


def section_train_baseline(args):
    """Reference-structure training baseline on the SAME chip: the
    reference's per-step structure (train.py:344-356) — fresh host batch
    copied in every step, forward/backward and optimizer as separate jit
    dispatches, loss synced to host each step for the tqdm postfix."""
    jax = _jax_init()
    import jax.numpy as jnp
    import optax
    from capdec_tpu.models import caption_model
    from capdec_tpu.ops import noise as noise_ops
    from capdec_tpu.train import optim as optim_lib

    T = 40
    cfg_t = _flagship_cfg(only_prefix=True)
    p_ref = caption_model.init_params(jax.random.PRNGKey(1), cfg_t)
    tx = optim_lib.make_optimizer(
        2e-5, warmup_steps=5000, total_steps=100000,
        trainable_mask=caption_model.trainable_mask(p_ref, cfg_t))
    o_ref = tx.init(p_ref)
    key = jax.random.PRNGKey(2)
    rng = np.random.RandomState(0)

    bs = 30
    iters_b = 10
    host_batches = [{
        "tokens": np.asarray(rng.randint(1, 50257, (bs, T)), np.int32),
        "mask": np.ones((bs, 80), np.float32),
        "prefix": np.asarray(rng.randn(bs, 640), np.float32),
    } for _ in range(iters_b)]

    def loss_fn(p, b, k):
        prefix = noise_ops.noise_injection(k, b["prefix"], variance=0.016)
        logits = caption_model.forward(p, cfg_t, b["tokens"], prefix,
                                       b["mask"])
        return caption_model.loss_fn(logits, b["tokens"], cfg_t.prefix_length)

    grad_step = jax.jit(jax.value_and_grad(loss_fn))
    upd_step = jax.jit(lambda g, o, p: tx.update(g, o, p))
    app_step = jax.jit(optax.apply_updates)
    b_dev = {k: jnp.asarray(v) for k, v in host_batches[0].items()}
    l, g = grad_step(p_ref, b_dev, key)
    u, o_ref = upd_step(g, o_ref, p_ref)
    p_ref = app_step(p_ref, u)
    float(l)  # compile all three dispatches, synced
    # protocol (a): faithful reference structure incl. per-step loss.item()
    # (train.py:356). Over the relay that sync costs an RTT the reference
    # never paid on a local GPU, so we ALSO time (b) without it (steps
    # still serialized by the params data dependency, one final fetch) and
    # report the FASTER baseline — conservative for our vs-baseline ratio.
    sps = []
    for fetch_each in (True, False):
        t0 = time.perf_counter()
        for hb in host_batches:
            b_dev = {k: jnp.asarray(v) for k, v in hb.items()}  # H2D
            l, g = grad_step(p_ref, b_dev, key)
            u, o_ref = upd_step(g, o_ref, p_ref)
            p_ref = app_step(p_ref, u)
            if fetch_each:
                float(l)  # per-step host sync (reference loss.item())
        float(l)
        sps.append(bs / ((time.perf_counter() - t0) / iters_b))
    return {"baseline_train_sps": max(sps)}


def section_train_baseline_torch(args):
    """The reference training algorithm in torch on this container's CPU —
    the only hardware the reference code (torch-CUDA) can actually run on
    here. A faithful re-creation, NOT a copy: frozen GPT-2 + trained
    transformer mapper (train.py:276-284), per-batch noise injection
    (train.py:347), CE on logits[:, K-1:-1] (train.py:349-350), AdamW +
    per-step loss.item() (train.py:326,356). Random-init weights
    (zero-egress); throughput is weight-independent."""
    import torch
    import torch.nn as nn
    from transformers import GPT2Config as HFConfig
    from transformers import GPT2LMHeadModel

    torch.manual_seed(0)
    K, T, bs = 40, 40, 30
    d = 768

    class MapperLayer(nn.Module):
        # reference Transformer layer: pre-LN, fused to_keys_values,
        # mlp_ratio 2 (train.py:138-189)
        def __init__(self):
            super().__init__()
            self.norm1 = nn.LayerNorm(d)
            self.to_queries = nn.Linear(d, d, bias=False)
            self.to_keys_values = nn.Linear(d, 2 * d, bias=False)
            self.project = nn.Linear(d, d)
            self.norm2 = nn.LayerNorm(d)
            self.fc1 = nn.Linear(d, 2 * d)
            self.fc2 = nn.Linear(2 * d, d)

        def forward(self, x):
            h = self.norm1(x)
            B, S, _ = h.shape
            q = self.to_queries(h).reshape(B, S, 8, d // 8)
            kv = self.to_keys_values(h).reshape(B, S, 2, 8, d // 8)
            att = torch.einsum("bqhd,bkhd->bqkh", q, kv[:, :, 0]) * (d // 8) ** -0.5
            out = torch.einsum("bqkh,bkhd->bqhd", att.softmax(dim=2), kv[:, :, 1])
            x = x + self.project(out.reshape(B, S, d))
            return x + self.fc2(torch.relu(self.fc1(self.norm2(x))))

    class Mapper(nn.Module):
        # TransformerMapper: linear -> clip_length pseudo tokens ++
        # learned prefix_const, keep last K slots (train.py:229-243)
        def __init__(self):
            super().__init__()
            self.linear = nn.Linear(640, K * d)
            self.prefix_const = nn.Parameter(torch.randn(K, d))
            self.layers = nn.ModuleList([MapperLayer() for _ in range(8)])

        def forward(self, p):
            x = self.linear(p).reshape(-1, K, d)
            x = torch.cat([x, self.prefix_const.expand(x.shape[0], -1, -1)], 1)
            for l in self.layers:
                x = l(x)
            return x[:, K:]

    gpt = GPT2LMHeadModel(HFConfig())  # random init; no download
    gpt.eval()
    for p in gpt.parameters():
        p.requires_grad_(False)
    mapper = Mapper()
    opt = torch.optim.AdamW(mapper.parameters(), lr=2e-5)
    ce = nn.CrossEntropyLoss(ignore_index=0)
    rng = np.random.RandomState(0)
    host_batches = [
        (rng.randint(1, 50257, (bs, T)).astype(np.int64),
         rng.randn(bs, 640).astype(np.float32)) for _ in range(3)]

    def step(tokens_np, prefix_np):
        tokens = torch.from_numpy(tokens_np)
        prefix = torch.from_numpy(prefix_np)
        prefix = prefix / prefix.norm(dim=-1, keepdim=True)
        prefix = prefix + torch.randn_like(prefix) * 0.016 ** 0.5
        prefix = prefix / prefix.norm(dim=-1, keepdim=True)
        embeds = torch.cat([mapper(prefix),
                            gpt.transformer.wte(tokens)], dim=1)
        logits = gpt(inputs_embeds=embeds).logits[:, K - 1:-1]
        loss = ce(logits.reshape(-1, logits.shape[-1]), tokens.reshape(-1))
        opt.zero_grad()
        loss.backward()
        opt.step()
        return loss.item()  # per-step host sync (train.py:356)

    step(*host_batches[0])  # warmup
    # Wall-clock-capped: torch-CPU runs ~1 sample/s here (~30 s/step), so
    # measure whole steps until the 75 s cap and report the per-step rate
    # — the number is stable step-to-step (same fixed-shape compute).
    t0 = time.perf_counter()
    steps = 0
    for tok, pre in host_batches:
        step(tok, pre)
        steps += 1
        if time.perf_counter() - t0 > 75 and steps >= 1:
            break
    return {"torch_cpu_train_sps": bs * steps / (time.perf_counter() - t0),
            "torch_cpu_steps_timed": steps}


def section_serve(args):
    """End-to-end serving throughput (the framework's headline advantage
    over the reference's batch-1 offline loop, predictions_runner.py:153-342):
    CaptionServer.serve() — feeder thread, fixed-shape coalescing, one
    batch in flight, device-side rank-0 selection, host detokenize —
    pipelined AND synchronous (caption() per batch) over the same compiled
    engine, so the A/B isolates the pipeline's win. Requests carry real
    per-request embeddings (distinct buffers)."""
    jax = _jax_init()
    from capdec_tpu import serve as serve_lib
    from capdec_tpu.models import caption_model
    from capdec_tpu.utils.tokenizer import load_tokenizer

    cfg = _flagship_cfg()
    params = caption_model.init_params(jax.random.PRNGKey(0), cfg)
    B = args.n
    scfg = serve_lib.ServeConfig(
        batch_size=B, max_wait_s=0.05,
        beam_config=serve_lib.BeamConfig(beam_size=5, entry_length=67,
                                         stop_token=-1))
    server = serve_lib.CaptionServer(params, cfg, load_tokenizer(), scfg)
    server.warmup()  # the one compile (map + beam + rank-0 select)

    rng = np.random.RandomState(0)
    n_req = 3 * B
    embeds = rng.randn(n_req, cfg.prefix_size).astype(np.float32)
    out = {}
    t0 = time.perf_counter()
    served = sum(1 for _ in server.serve(
        (i, embeds[i]) for i in range(n_req)))
    out["serve_captions_per_sec"] = served / (time.perf_counter() - t0)
    pct = server.latency_percentiles()
    out["serve_latency_p50_s"] = round(pct["p50"], 3)
    out["serve_latency_p99_s"] = round(pct["p99"], 3)
    # sum of launch->finish spans per batch: with the wall time above it
    # bounds how much decode the pipeline actually overlapped
    out["serve_batch_span_s"] = round(server.stats["batch_span_s"], 2)
    # synchronous A/B: same engine, no overlap of host finalize with decode
    t0 = time.perf_counter()
    served = 0
    for i in range(0, n_req, B):
        served += len(server.caption(embeds[i:i + B]))
    out["serve_sync_captions_per_sec"] = served / (time.perf_counter() - t0)
    out["serve_batch"] = B
    return out


def section_embed(args):
    """CLIP ViT-B/32 text-encode throughput, batched+jitted — vs the
    reference's one-record-per-dispatch structure (embeddings_generator
    .py:58-89) timed on the same chip with the same per-record host sync
    the reference's .cpu() forces."""
    jax = _jax_init()
    import jax.numpy as jnp
    from capdec_tpu.models import clip as clip_lib

    cfg = clip_lib.CLIPTextConfig()
    params = clip_lib.init_text_params(jax.random.PRNGKey(0), cfg)
    B, iters = 1024, 5
    rng = np.random.RandomState(0)

    def make_tokens(seed_rng):
        toks = np.zeros((B, cfg.context_length), np.int32)
        lens = seed_rng.randint(4, 30, size=B)
        for i, L in enumerate(lens):
            toks[i, 0] = 49406
            toks[i, 1:L - 1] = seed_rng.randint(1, 49000, size=L - 2)
            toks[i, L - 1] = 49407
        return jnp.asarray(toks)

    enc = jax.jit(lambda p, t: clip_lib.encode_text(p, cfg, t))
    batches = [make_tokens(rng) for _ in range(iters)]  # distinct buffers
    for b in batches:
        np.asarray(b[0, :1])  # resident before timing
    np.asarray(enc(params, batches[0])[0, :1])  # compile
    times = []
    for b in batches:
        t0 = time.perf_counter()
        np.asarray(enc(params, b)[0, :1])
        times.append(time.perf_counter() - t0)
    out = {"embed_text_captions_per_sec": B / _median(times)}
    # reference batch-1 structure: one dispatch + host fetch per record
    singles = [b[i:i + 1] for i, b in enumerate(batches)]
    np.asarray(enc(params, singles[0])[0, :1])  # compile the B=1 shape
    times1 = []
    for s in singles:
        t0 = time.perf_counter()
        np.asarray(enc(params, s)[0, :1])
        times1.append(time.perf_counter() - t0)
    out["embed_text_batch1_per_sec"] = 1.0 / _median(times1)
    return out


_SECTIONS = {
    "peak": section_peak,
    "naive_decode": section_naive_decode,
    "beam": section_beam,
    "greedy": section_greedy,
    "train": section_train,
    "train_baseline": section_train_baseline,
    "train_baseline_torch": section_train_baseline_torch,
    "serve": section_serve,
    "embed": section_embed,
}


# ---------------------------------------------------------------------------
# Orchestrator (parent process) — never imports jax, never crashes.
# ---------------------------------------------------------------------------

_CURRENT_CHILD = [None]  # Popen of the in-flight section, for the handler


def _run_section(name, extra=(), timeout=1800):
    """Run one section in a child process; return (result_dict | None, err)."""
    # Children inherit -S when the parent runs without site (test mode:
    # skips sitecustomize's ~2.3 s jax import per child; production
    # drivers run plain python and are unaffected).
    cmd = [sys.executable, *(["-S"] if sys.flags.no_site else []),
           os.path.abspath(__file__), "--section", name, *map(str, extra)]
    print(f"[bench] {' '.join(cmd[1:])}", file=sys.stderr)
    t0 = time.perf_counter()
    try:
        proc = subprocess.Popen(cmd, stdout=subprocess.PIPE,
                                stderr=subprocess.PIPE, text=True, cwd=_REPO)
        _CURRENT_CHILD[0] = proc
        try:
            stdout, stderr = proc.communicate(timeout=timeout)
        except subprocess.TimeoutExpired:
            proc.kill()
            proc.communicate()
            return None, f"{name}: timeout after {timeout:.0f}s"
        finally:
            _CURRENT_CHILD[0] = None
    except Exception as e:  # pragma: no cover - defensive
        return None, f"{name}: {e!r}"
    if stderr:
        sys.stderr.write(stderr[-4000:])
    dt = time.perf_counter() - t0
    if proc.returncode != 0:
        return None, f"{name}: rc={proc.returncode}"
    for line in reversed(stdout.strip().splitlines()):
        try:
            out = json.loads(line)
            print(f"[bench] {name} ok in {dt:.0f}s: {line}", file=sys.stderr)
            return out, None
        except ValueError:
            continue
    return None, f"{name}: no JSON line in child stdout"


def main():
    t_start = time.monotonic()
    budget = float(os.environ.get("CAPDEC_BENCH_BUDGET", "1620"))
    deadline = t_start + budget
    out = {"metric": "captions_per_sec_per_chip_beam5", "value": -1.0,
           "unit": "captions/s", "vs_baseline": -1.0}
    failed, skipped = [], []

    def emit():
        # Best-effort line after EVERY section (and from the signal
        # handler): the last complete line on stdout always carries
        # everything measured so far. rc stays 0 unless python dies.
        snap = dict(out)
        snap["elapsed_s"] = round(time.monotonic() - t_start, 1)
        if failed:
            snap["sections_failed"] = failed
        if skipped:
            snap["sections_skipped"] = skipped
        print(json.dumps(snap))
        sys.stdout.flush()

    def on_signal(sig, frame):  # driver timeout sends SIGTERM first
        failed.append(f"killed_by_signal_{sig}")
        child = _CURRENT_CHILD[0]
        if child is not None:  # don't orphan a chip-holding section
            try:
                child.kill()
            except OSError:  # pragma: no cover - already gone
                pass
        emit()
        os._exit(1)

    signal.signal(signal.SIGTERM, on_signal)
    signal.signal(signal.SIGINT, on_signal)

    def note(err):
        if err:
            failed.append(err)
            print(f"[bench] FAILED: {err}", file=sys.stderr)

    def gated(name, extra=(), cap=900, floor=90):
        """Run a section with its child timeout clamped to the remaining
        budget (less a 45 s reserve for later emits); skip outright when
        less than `floor` seconds remain — a section that cannot finish
        only burns the budget of everything behind it."""
        rem = deadline - time.monotonic() - 45
        if rem < floor:
            skipped.append(name + ("" if not extra else
                                   " " + " ".join(map(str, extra))))
            print(f"[bench] SKIP {name}: {rem:.0f}s left", file=sys.stderr)
            return None, None
        res, err = _run_section(name, extra, timeout=min(cap, rem))
        note(err)
        return res, err

    # Section order = information value per second. The four REQUIRED
    # fields (value, train_*, train_vs_baseline, torch_cpu_train_sps)
    # land first; compile-heavy/low-information sections (int8, serve,
    # naive ratio) run on whatever budget remains. A relay having a slow
    # day (round-5 run: peak compile >420 s, naive >600 s) then costs
    # tail sections, never the contract fields.
    # Best peak this chip has measured across rounds (183.7 TFLOP/s,
    # round-5 standalone; BENCH history + docs/PERFORMANCE.md). Used ONLY
    # as the MFU denominator when this run's peak section is starved by
    # relay contention (it timed out in all three round-5 full runs), so
    # the required train_mfu_best field still lands — `peak_source` says
    # which denominator was used. Using the best-ever peak makes the
    # fallback MFU a LOWER bound: a starved run can only under-report.
    _PRIOR_PEAK_FLOPS = 183.7e12

    def fold_mfu(train, peak_flops):
        if peak_flops:  # report the peak even when the train section died
            out["measured_peak_tflops"] = round(peak_flops / 1e12, 1)
            out["peak_source"] = "measured_this_run"
        if not train:
            return
        denom = peak_flops
        if not denom:
            denom = _PRIOR_PEAK_FLOPS
            out["peak_source"] = "prior_best_r5_standalone"
        if train.get("train_model_flops_per_step", 0) > 0:
            step_t = (train["train_best_batch"]
                      / train["train_samples_per_sec_best"])
            out["train_mfu_best"] = round(
                train["train_model_flops_per_step"] / step_t
                / denom, 3)

    try:
        # ---- 1. exact-path beam headline (THE number) ----
        beam, _ = gated("beam", ("--n", 512), cap=1200)
        if not beam:  # one smaller-batch fallback, budget permitting
            beam, _ = gated("beam", ("--n", 256), cap=900, floor=400)
        if beam:
            out["value"] = round(beam["captions_per_sec"], 2)
            out["beam_batch"] = beam["n"]
        emit()

        # ---- 2. training throughput (MFU folded in once peak lands) ----
        train, _ = gated("train", ("--peak-flops", 0.0), cap=900)
        if not train:  # contract-only retry: ONE compile (bs=30) keeps
            train, _ = gated(  # the required train fields alive
                "train", ("--peak-flops", 0.0, "--contract-only"),
                cap=600, floor=180)
        if train:
            sps = train["train_samples_per_sec_contract"]
            out["train_samples_per_sec"] = round(sps, 1)
            out["train_samples_per_sec_contract"] = round(sps, 1)
            out["train_samples_per_sec_best"] = round(
                train["train_samples_per_sec_best"], 1)
            out["train_best_batch"] = train["train_best_batch"]
        emit()

        # ---- 3. reference-structure training baseline (same chip) ----
        tb, _ = gated("train_baseline", cap=600)
        if train and tb:
            out["train_vs_baseline"] = round(
                train["train_samples_per_sec_contract"]
                / tb["baseline_train_sps"], 2)
        elif train:
            # Starved-relay fallback: the jitted same-chip baseline is a
            # stable 897-920 sps across r4/r5 runs; use the FASTEST prior
            # measurement so the fallback ratio is a lower bound.
            out["train_vs_baseline"] = round(
                train["train_samples_per_sec_contract"] / 920.0, 2)
            out["train_vs_baseline_source"] = "prior_best_r5_run2_920sps"
        emit()

        # ---- 4. the reference algorithm in torch on this CPU ----
        # floor 180: model build + untimed warmup step cost ~80-100 s
        # before its internal 75 s measurement cap even starts; a
        # smaller window gets killed mid-measurement (round-5 run).
        tt, _ = gated("train_baseline_torch", cap=300, floor=180)
        if tt:
            out["torch_cpu_train_sps"] = round(tt["torch_cpu_train_sps"], 2)
        elif train:
            # Starved-CPU fallback: prior measurements span 0.77-1.03 sps
            # depending on container load; quote the FASTEST so the
            # implied ratio is a lower bound.
            out["torch_cpu_train_sps"] = 1.03
            out["torch_cpu_train_sps_source"] = "prior_best_r4_measured"
        if train and out.get("torch_cpu_train_sps"):
            out["train_vs_torch_cpu"] = round(
                train["train_samples_per_sec_contract"]
                / out["torch_cpu_train_sps"], 1)
        emit()

        # ---- 5. matmul peak (MFU denominator) — empty chip ----
        peak, _ = gated("peak", cap=300, floor=60)
        peak_flops = (peak or {}).get("peak_flops", 0.0)
        fold_mfu(train, peak_flops)
        emit()

        # ---- 6. CLIP text-embed throughput (C4's architectural win) ----
        emb, _ = gated("embed", cap=300, floor=120)
        if emb:
            out["embed_text_captions_per_sec"] = round(
                emb["embed_text_captions_per_sec"], 0)
            out["embed_text_batch1_per_sec"] = round(
                emb["embed_text_batch1_per_sec"], 1)
        emit()

        # ---- 7. greedy/top-p path ----
        greedy, _ = gated("greedy", ("--ng", 1024), cap=600, floor=150)
        if greedy:
            out["greedy_captions_per_sec"] = round(
                greedy["greedy_captions_per_sec"], 1)
        emit()

        # ---- 8. opt-in int8 KV (serving knob; not token-identical) ----
        int8, _ = gated("beam", ("--n", 512, "--int8"), cap=900, floor=300)
        if int8:
            out["int8_kv_captions_per_sec"] = round(
                int8["captions_per_sec"], 1)
            out["int8_beam_batch"] = int8["n"]
        emit()

        # ---- 9. end-to-end serving pipeline (+sync A/B) ----
        srv, _ = gated("serve", ("--n", 512), cap=900, floor=360)
        if srv:
            out["serve_captions_per_sec"] = round(
                srv["serve_captions_per_sec"], 1)
            out["serve_sync_captions_per_sec"] = round(
                srv["serve_sync_captions_per_sec"], 1)
            out["serve_latency_p99_s"] = srv["serve_latency_p99_s"]
        emit()

        # ---- 10. reference-algorithm decode baseline -> vs_baseline ----
        # Last: one compile-heavy section that only restates a stable
        # ~500x ratio (its per-step cost is relay-RTT-dominated).
        naive, _ = gated("naive_decode", cap=600, floor=90)
        if beam and naive:
            out["vs_baseline"] = round(
                beam["captions_per_sec"]
                / naive["baseline_captions_per_sec"], 2)
        elif beam:
            # Starved-relay fallback: the naive reference-algorithm rate is
            # relay-RTT-dominated and stable in the median (0.43-0.51
            # caps/s across r5 probes); use the FASTEST prior measurement
            # (0.5057, r5 standalone) so the fallback ratio is a lower
            # bound rather than a -1 sentinel.
            out["vs_baseline"] = round(
                beam["captions_per_sec"] / 0.5057, 2)
            out["vs_baseline_source"] = "prior_best_r5_standalone_0.5057cps"
        emit()

        # ---- 11. late peak retry: a starved attempt must not cost the
        # run its MFU (one more try on whatever budget remains) ----
        if not peak_flops:
            peak, _ = gated("peak", cap=300, floor=90)
            peak_flops = (peak or {}).get("peak_flops", 0.0)
            fold_mfu(train, peak_flops)
        emit()
    except Exception as e:  # pragma: no cover - defensive
        failed.append(f"orchestrator: {e!r}")
    finally:
        emit()


def _child():
    # Test hook: CAPDEC_BENCH_FAKE points at a JSON file mapping section
    # name -> canned result dict | "fail". Lets tests/test_bench_contract.py
    # drive the REAL orchestrator (fallback fields, emit-after-every-
    # section, budget gating) without a chip or a jax import.
    fake = os.environ.get("CAPDEC_BENCH_FAKE")
    if fake:
        section = sys.argv[sys.argv.index("--section") + 1]
        with open(fake) as f:
            spec = json.load(f).get(section, "fail")
        if spec == "fail":
            sys.exit(3)
        if spec == "hang":
            time.sleep(float(os.environ.get("CAPDEC_BENCH_FAKE_HANG_S", "60")))
            sys.exit(3)
        print(json.dumps(spec))
        return
    p = argparse.ArgumentParser()
    p.add_argument("--section", required=True, choices=sorted(_SECTIONS))
    p.add_argument("--n", type=int, default=512)
    p.add_argument("--ng", type=int, default=1024)
    p.add_argument("--int8", action="store_true")
    p.add_argument("--slot-chunks", type=int, default=0)
    p.add_argument("--cache-stages", type=int, default=0)  # 0 = default
    p.add_argument("--block-beams", type=int, default=0)
    p.add_argument("--full-alloc", type=int, default=-1)  # -1 auto, 0/1 force
    p.add_argument("--peak-flops", type=float, default=0.0)
    p.add_argument("--contract-only", action="store_true")
    args = p.parse_args()
    result = _SECTIONS[args.section](args)
    print(json.dumps(result))


if __name__ == "__main__":
    if "--section" in sys.argv:
        _child()
    else:
        main()
