"""Headline benchmark: captions/sec/chip at beam=5 on the flagship model.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Setup mirrors the reference's eval hot path (predictions_runner.py:229-232,
gpt2_prefix_eval.py:50-115): GPT-2 base + TransformerMapper(8L) prefixes of
length 40, beam 5, 67 decode steps. Weights are random (zero-egress
environment) — decode throughput is weight-independent; stopping is
disabled so every caption runs the full 67 steps (worst case, conservative).

`vs_baseline` is measured, not assumed: we time a faithful re-creation of
the *reference algorithm* on the same chip — batch-1, no KV cache, full
re-forward over the growing sequence each step — and report the ratio.
"""
import json
import time

import numpy as np


def main():
    from capdec_tpu.utils.jax_setup import setup_jax
    setup_jax()
    import jax
    import jax.numpy as jnp

    from capdec_tpu.decode import BeamConfig, beam_search
    from capdec_tpu.models import caption_model, gpt2

    # --- chip's achievable bf16 matmul peak (for the MFU figure below) ------
    # Measured FIRST, on an empty chip: the two 8192^2 operands need a
    # contiguous 256 MB which the allocator could not always carve out
    # after the train sweep's near-OOM batches (observed RESOURCE_EXHAUSTED
    # when this ran last). Same methodology as scripts/chip_roofline.py.
    rng = np.random.RandomState(0)
    peak_flops = 0.0
    a8 = b8 = out = None
    try:
        a8 = jnp.asarray(rng.randn(8192, 8192), jnp.bfloat16)
        b8 = jnp.asarray(rng.randn(8192, 8192), jnp.bfloat16)

        @jax.jit
        def mm(a, b):
            def body(s, _):
                out = jnp.dot(a + (s * 1e-30).astype(a.dtype), b,
                              preferred_element_type=jnp.float32)
                return out.sum() * 1e-30, None
            s, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=4)
            return s

        jax.block_until_ready(mm(a8, b8))
        t0 = time.perf_counter()
        for _ in range(3):
            out = mm(a8, b8)
        jax.block_until_ready(out)
        peak_flops = 2 * 8192 ** 3 * 4 / ((time.perf_counter() - t0) / 3)
    except Exception:
        pass  # MFU degrades to -1 below
    finally:
        # always release the 256 MB of operands — a leak here squeezes
        # the memory-sensitive decode/train measurements that follow
        del a8, b8, out

    cfg = caption_model.CaptionModelConfig(
        prefix_length=40, clip_length=40, prefix_size=640, num_layers=8,
        mapping_type="transformer",
        gpt2=gpt2.GPT2Config(compute_dtype=jnp.bfloat16))
    params = caption_model.init_params(jax.random.PRNGKey(0), cfg)

    # Images per decode batch. Measured (chunked-write config, caps/s):
    # 128 -> 219, 256 -> 225, 384 -> 227, 512 -> 232, 640 -> HBM OOM
    # (the stage-growth copy holds old+new caches briefly).
    N = 512
    rng = np.random.RandomState(0)
    clip_embeds = jnp.asarray(rng.randn(N, cfg.prefix_size), jnp.float32)
    map_fn = jax.jit(caption_model.map_prefix, static_argnums=(1,))
    prefix_embeds = map_fn(params, cfg, clip_embeds)
    jax.block_until_ready(prefix_embeds)
    # stop disabled: every caption runs the full 67 steps (worst case).
    bc = BeamConfig(beam_size=5, entry_length=67, stop_token=-1)

    # --- our engine ---------------------------------------------------------
    def run():
        toks, lens, scores, order = beam_search(params["gpt"], cfg.gpt2,
                                                prefix_embeds, bc)
        jax.block_until_ready(toks)

    run()  # compile (persistent-cache backed)
    t0 = time.perf_counter()
    iters = 5
    for _ in range(iters):
        run()
    dt = (time.perf_counter() - t0) / iters
    captions_per_sec = N / dt

    # --- opt-in int8 KV cache (serving knob; not token-identical) -----------
    import dataclasses
    bc_q = dataclasses.replace(bc, kv_cache_int8=True, fused_attention=True)

    def run_q():
        toks, *_ = beam_search(params["gpt"], cfg.gpt2, prefix_embeds, bc_q)
        jax.block_until_ready(toks)

    run_q()  # compile
    t0 = time.perf_counter()
    for _ in range(iters):
        run_q()
    int8_caps = N / ((time.perf_counter() - t0) / iters)

    # --- reference-algorithm baseline on the same chip ----------------------
    # batch-1, beam-5, no KV cache: re-forward the full growing sequence
    # every step (gpt2_prefix_eval.py:76) at the mean decode length.
    # Params are passed as jit args (closure capture would bake 124M
    # constants into the HLO).
    E = 67

    @jax.jit
    def naive_step(p, embeds):
        return gpt2.forward(p, cfg.gpt2, embeds)[:, -1, :]

    seq = jnp.asarray(rng.randn(5, cfg.prefix_length + E // 2, 768),
                      jnp.float32)
    jax.block_until_ready(naive_step(params["gpt"], seq))  # compile
    t0 = time.perf_counter()
    for _ in range(10):
        jax.block_until_ready(naive_step(params["gpt"], seq))
    step_t = (time.perf_counter() - t0) / 10
    baseline_captions_per_sec = 1.0 / (step_t * E)

    ratio = captions_per_sec / baseline_captions_per_sec

    # --- greedy/top-p decode (reference generate2 path) ---------------------
    from capdec_tpu.decode.topp import ToppConfig, greedy_topp_search
    # measured (staged cache growth): 256 -> ~1070, 512 -> ~1207,
    # 1024 -> ~1470, 2048 -> ~913 (HBM pressure)
    NG = 1024
    greedy_prefix = map_fn(params, cfg,
                           jnp.asarray(rng.randn(NG, cfg.prefix_size),
                                       jnp.float32))
    tc = ToppConfig(entry_length=67, stop_token=-1, extra_stop_token=-1)

    def run_greedy():
        toks, _ = greedy_topp_search(params["gpt"], cfg.gpt2, greedy_prefix,
                                     tc)
        np.asarray(toks[0, 0])  # honest D2H sync

    run_greedy()  # compile
    t0 = time.perf_counter()
    for _ in range(5):
        run_greedy()
    greedy_caps = NG / ((time.perf_counter() - t0) / 5)

    # --- training throughput (VERDICT r1 item 6) ----------------------------
    # Ours: ONE fused jitted step (noise -> forward -> CE -> AdamW), donated
    # state, device-resident batch. Reference-algorithm baseline on the SAME
    # chip: the reference's per-step structure (train.py:344-356) — fresh
    # host batch copied in, forward/backward and optimizer as separate
    # dispatches, loss synced to host every step for the tqdm postfix.
    from capdec_tpu.train import optim as optim_lib
    from capdec_tpu.train import step as step_lib

    T = 40
    cfg_t = caption_model.CaptionModelConfig(
        prefix_length=40, clip_length=40, prefix_size=640, num_layers=8,
        mapping_type="transformer", only_prefix=True,
        gpt2=gpt2.GPT2Config(compute_dtype=jnp.bfloat16))
    params_t = caption_model.init_params(jax.random.PRNGKey(1), cfg_t)
    tx = optim_lib.make_optimizer(
        2e-5, warmup_steps=5000, total_steps=100000,
        trainable_mask=caption_model.trainable_mask(params_t, cfg_t))
    # separate copy for the baseline below: the fused step DONATES its
    # state, deleting these buffers
    p_ref = jax.tree.map(lambda a: a.copy(), params_t)
    o_ref = tx.init(p_ref)
    multi_step = step_lib.make_train_multi_step(
        cfg_t, tx, step_lib.NoiseConfig(variance=0.016))
    key = jax.random.PRNGKey(2)

    def measure_train(bs, K=16):
        """Sustained-training samples/s at batch `bs`: K steps per
        compiled dispatch (lax.scan, bit-identical to K single steps —
        see train/step.py). Returns (samples/s, model FLOPs per step
        from XLA's cost analysis, or 0.0 if unavailable)."""
        state = step_lib.init_train_state(
            jax.tree.map(lambda a: a.copy(), params_t), tx)
        batch = {
            "tokens": np.asarray(rng.randint(1, 50257, (bs, T)), np.int32),
            "mask": np.ones((bs, 80), np.float32),
            "prefix": np.asarray(rng.randn(bs, 640), np.float32),
        }
        stacked = {k: jnp.asarray(np.broadcast_to(v, (K,) + v.shape))
                   for k, v in batch.items()}
        flops = 0.0
        try:
            cost = (multi_step.lower(state, stacked, key).compile()
                    .cost_analysis())
            if cost:
                c = cost[0] if isinstance(cost, (list, tuple)) else cost
                flops = float(c.get("flops", 0.0)) / K
        except Exception:
            pass
        state, _ = multi_step(state, stacked, key)  # compile
        jax.block_until_ready(state["step"])
        iters = 5
        t0 = time.perf_counter()
        for _ in range(iters):
            state, losses = multi_step(state, stacked, key)
        jax.block_until_ready(losses)
        return bs * K / ((time.perf_counter() - t0) / iters), flops

    # reference bs=30 contract (train.py:419 COCO preset)
    train_sps, contract_flops = measure_train(30)
    # throughput-optimal batch (VERDICT r2: show the TPU-appropriate
    # number alongside the parity contract). Measured sweep (v5e,
    # scripts/train_scaling.py): bs=30 1533, bs=120 1715 (knee),
    # bs=256 1524, bs=512 HBM-OOM (23.2 G > 15.75 G; chunked-remat CE
    # doesn't save it — the layer-activation stash dominates);
    # ce_chunk_rows=64 at bs=256 measured SLOWER (1459). Guarded so an
    # OOM on a different chip degrades to the contract number.
    best_sps, best_bs, best_flops = train_sps, 30, contract_flops
    for bs_opt in (120, 256):
        try:
            sps, flops = measure_train(bs_opt, K=8)
        except Exception:
            continue
        if sps > best_sps:
            best_sps, best_bs, best_flops = sps, bs_opt, flops

    # MFU at the optimal batch: model FLOPs per step (XLA cost analysis)
    # over step time, against the chip's MEASURED big-matmul bf16 peak
    # (computed at the top of main on an empty chip) — the achievable
    # ceiling, not the datasheet number.
    if best_flops > 0 and peak_flops > 0:
        step_t_best = best_bs / best_sps
        train_mfu = best_flops / step_t_best / peak_flops
    else:
        train_mfu = -1.0  # cost analysis unavailable on this backend

    # reference-structure baseline: separate grad/update dispatches,
    # per-step H2D + loss.item() sync, at the reference's bs=30 contract
    import optax

    bs = 30
    host_batch = {
        "tokens": np.asarray(rng.randint(1, 50257, (bs, T)), np.int32),
        "mask": np.ones((bs, 80), np.float32),
        "prefix": np.asarray(rng.randn(bs, 640), np.float32),
    }

    def loss_fn(p, b, k):
        from capdec_tpu.ops import noise as noise_ops
        prefix = noise_ops.noise_injection(k, b["prefix"], variance=0.016)
        logits = caption_model.forward(p, cfg_t, b["tokens"], prefix,
                                       b["mask"])
        return caption_model.loss_fn(logits, b["tokens"], cfg_t.prefix_length)

    grad_step = jax.jit(jax.value_and_grad(loss_fn))
    upd_step = jax.jit(lambda g, o, p: tx.update(g, o, p))
    app_step = jax.jit(optax.apply_updates)
    b_dev = {k: jnp.asarray(v) for k, v in host_batch.items()}
    l, g = grad_step(p_ref, b_dev, key)
    u, o_ref = upd_step(g, o_ref, p_ref)
    p_ref = app_step(p_ref, u)
    jax.block_until_ready(l)
    iters_b = 10
    t0 = time.perf_counter()
    for _ in range(iters_b):
        b_dev = {k: jnp.asarray(v) for k, v in host_batch.items()}  # H2D
        l, g = grad_step(p_ref, b_dev, key)
        u, o_ref = upd_step(g, o_ref, p_ref)
        p_ref = app_step(p_ref, u)
        float(l)  # per-step host sync (reference train.py:356 loss.item())
    baseline_train_sps = bs / ((time.perf_counter() - t0) / iters_b)

    print(json.dumps({
        "metric": "captions_per_sec_per_chip_beam5",
        "value": round(captions_per_sec, 2),
        "unit": "captions/s",
        "vs_baseline": round(ratio, 2),
        "int8_kv_captions_per_sec": round(int8_caps, 1),
        "greedy_captions_per_sec": round(greedy_caps, 1),
        "train_samples_per_sec": round(train_sps, 1),
        "train_samples_per_sec_contract": round(train_sps, 1),
        "train_samples_per_sec_best": round(best_sps, 1),
        "train_best_batch": best_bs,
        "train_mfu_best": round(train_mfu, 3),
        "measured_peak_tflops": round(peak_flops / 1e12, 1),
        "train_vs_baseline": round(train_sps / baseline_train_sps, 2),
    }))


if __name__ == "__main__":
    main()
