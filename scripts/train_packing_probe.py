"""Sequence-packing probe for the training step (round-4 verdict item 3).

Hypothesis under test: the ~49% train MFU ceiling is partly the
under-filled [S=80] MXU contractions (docs/PERFORMANCE.md §MFU), and
packing P=2 (prefix+caption) segments per row — S=160, block-diagonal
causal mask, per-segment position reset, same samples/step — fills the
tiles better and raises samples/s.

What packing changes, stated honestly BEFORE the measurement:
  * QKV/MLP/LM-head matmuls: identical FLOPs and identical [rows=B*S]
    shapes (B halves, S doubles) — no change expected.
  * Attention scores/values: the block-diagonal [S,S] is computed DENSE
    (XLA has no block-sparse matmul here), so attention matmul FLOPs
    DOUBLE at P=2; the bet is that better tile fill (S 80->160) + fewer
    per-row fixed costs outweigh the 2x on a term that is ~15% of the
    step.
  * Softmax/VPU work on [B,H,S,S] likewise doubles.

The probe measures BOTH directions on the same chip with bench.py's
honest-sync protocol (distinct device batches per dispatch, K-step
scan, per-dispatch loss fetch), and first proves the packed loss is
bit-equal (f32 tolerance) to the unpacked loss over the same samples.

Usage: python scripts/train_packing_probe.py [--bs 120] [--steps 8]
       [--check-only]  (correctness check runs on CPU; add --cpu to
       force the throughput probe onto CPU too)
Reference contract being attacked: train.py:317-392 (the loop whose
per-step structure bench.py's train section models).
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def packed_loss_forward(params, cfg, tokens, prefix, mask):
    """Masked-mean CE over P packed (prefix+caption) segments per row.

    tokens [B, P, T] int32, prefix [B, P, Dp] f32, mask [B, P, K+T].
    Equals caption_model.loss_forward over the same B*P samples: CE is
    sum(nll*valid)/sum(valid) either way, segments are isolated by the
    block-diagonal causal bias, and positions restart per segment.
    """
    import jax
    import jax.numpy as jnp
    from capdec_tpu.models import caption_model, gpt2

    B, P, T = tokens.shape
    K = cfg.prefix_length
    seg_len = K + T
    tok_e = gpt2.embed_tokens(params["gpt"], tokens.reshape(B * P, T))
    pre_e = caption_model.map_prefix(
        params, cfg, prefix.reshape(B * P, -1)).astype(tok_e.dtype)
    D = tok_e.shape[-1]
    seg = jnp.concatenate([pre_e, tok_e], axis=1)       # [B*P, K+T, D]
    seg = seg.reshape(B, P * seg_len, D)
    blk = jnp.tril(jnp.ones((seg_len, seg_len), jnp.int8))
    bias = jnp.where(jnp.kron(jnp.eye(P, dtype=jnp.int8), blk) > 0,
                     0.0, gpt2.NEG_INF)                  # [S, S] block-diag
    positions = jnp.tile(jnp.arange(seg_len), P)
    hidden = gpt2.forward_hidden(
        params["gpt"], cfg.gpt2, seg, mask.reshape(B, P * seg_len),
        attention_bias=bias, positions=positions)
    hidden = hidden.reshape(B * P, seg_len, D)
    scored = hidden[:, K - 1:K + T - 1]                  # same slice as
    logits = gpt2.final_logits(params["gpt"], cfg.gpt2,  # loss_forward
                               scored).astype(jnp.float32)
    lse = jax.nn.logsumexp(logits, axis=-1)
    toks = tokens.reshape(B * P, T)
    picked = jnp.take_along_axis(logits, toks[..., None], axis=-1)[..., 0]
    valid = (toks != 0).astype(jnp.float32)
    return jnp.sum((lse - picked) * valid) / jnp.maximum(valid.sum(), 1.0)


def _tiny_cfg():
    import jax.numpy as jnp
    from capdec_tpu.models import caption_model, gpt2
    return caption_model.CaptionModelConfig(
        prefix_length=6, clip_length=6, prefix_size=16, num_layers=2,
        mapping_type="transformer",
        gpt2=gpt2.GPT2Config(n_layer=2, n_embd=64, n_head=2, vocab_size=300,
                             n_positions=64))


def check_correctness():
    """Packed loss == unpacked loss over the same samples (CPU, tiny)."""
    import jax
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    from capdec_tpu.models import caption_model

    cfg = _tiny_cfg()
    params = caption_model.init_params(jax.random.PRNGKey(0), cfg)
    rng = np.random.RandomState(0)
    B, P, T = 4, 2, 5
    K = cfg.prefix_length
    tokens = rng.randint(1, 300, (B, P, T)).astype(np.int32)
    tokens[0, 0, 3:] = 0  # ragged caption: pad + loss mask must agree
    mask = np.concatenate([np.ones((B, P, K), np.float32),
                           (tokens != 0).astype(np.float32)], axis=-1)
    prefix = rng.randn(B, P, cfg.prefix_size).astype(np.float32)

    packed = float(packed_loss_forward(
        params, cfg, jnp.asarray(tokens), jnp.asarray(prefix),
        jnp.asarray(mask)))
    flat = float(caption_model.loss_forward(
        params, cfg, jnp.asarray(tokens.reshape(B * P, T)),
        jnp.asarray(prefix.reshape(B * P, -1)),
        jnp.asarray(mask.reshape(B * P, K + T))))
    print(f"packed loss {packed:.6f}  unpacked loss {flat:.6f}")
    assert abs(packed - flat) < 1e-4, "packing changed the loss"
    print("OK: packed == unpacked over the same samples")


def measure(args):
    from capdec_tpu.utils.jax_setup import setup_jax
    setup_jax()
    import jax
    import jax.numpy as jnp
    import optax
    from capdec_tpu.models import caption_model, gpt2
    from capdec_tpu.ops import noise as noise_ops
    from capdec_tpu.train import optim as optim_lib

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    T = 40
    cfg = caption_model.CaptionModelConfig(
        prefix_length=40, clip_length=40, prefix_size=640, num_layers=8,
        mapping_type="transformer", only_prefix=True,
        gpt2=gpt2.GPT2Config(compute_dtype=jnp.bfloat16))
    params0 = caption_model.init_params(jax.random.PRNGKey(1), cfg)
    tx = optim_lib.make_optimizer(
        2e-5, warmup_steps=5000, total_steps=100000,
        trainable_mask=caption_model.trainable_mask(params0, cfg))
    key = jax.random.PRNGKey(2)
    rng = np.random.RandomState(0)
    K_STEPS = args.steps
    samples = args.bs  # per optimizer step, both variants

    def run(packed: bool):
        params = jax.tree.map(lambda a: a.copy(), params0)
        opt = tx.init(params)

        def one_step(carry, batch):
            p, o, k = carry
            k, kn = jax.random.split(k)

            def loss_of(pp):
                noised = noise_ops.noise_injection(
                    kn, batch["prefix"].reshape(-1, cfg.prefix_size),
                    variance=0.016).reshape(batch["prefix"].shape)
                if packed:
                    return packed_loss_forward(pp, cfg, batch["tokens"],
                                               noised, batch["mask"])
                return caption_model.loss_forward(pp, cfg, batch["tokens"],
                                                  noised, batch["mask"])

            l, g = jax.value_and_grad(loss_of)(p)
            upd, o = tx.update(g, o, p)
            return (optax.apply_updates(p, upd), o, k), l

        @jax.jit
        def multi(p, o, k, batches):
            (p, o, k), losses = jax.lax.scan(one_step, (p, o, k), batches)
            return p, o, k, losses

        def make_batch():
            if packed:
                b, pp = samples // 2, 2
                toks = rng.randint(1, 50257, (b, pp, T)).astype(np.int32)
                return {
                    "tokens": toks,
                    "mask": np.ones((b, pp, 80), np.float32),
                    "prefix": rng.randn(b, pp, 640).astype(np.float32)}
            toks = rng.randint(1, 50257, (samples, T)).astype(np.int32)
            return {"tokens": toks,
                    "mask": np.ones((samples, 80), np.float32),
                    "prefix": rng.randn(samples, 640).astype(np.float32)}

        batches = []
        for _ in range(2):
            hb = make_batch()
            batches.append({k2: jnp.asarray(
                np.broadcast_to(v, (K_STEPS,) + v.shape))
                for k2, v in hb.items()})
        p, o, k2, losses = multi(params, opt, key, batches[0])  # compile
        float(losses[-1])
        iters = 4
        t0 = time.perf_counter()
        for i in range(iters):
            p, o, k2, losses = multi(p, o, k2, batches[i % 2])
            float(losses[-1])  # honest per-dispatch sync
        sps = samples * K_STEPS * iters / (time.perf_counter() - t0)
        return sps

    flat_sps = run(packed=False)
    print(f"unpacked bs={samples}: {flat_sps:.1f} samples/s", flush=True)
    packed_sps = run(packed=True)
    print(f"packed   bs={samples // 2}x2 (S=160): {packed_sps:.1f} samples/s",
          flush=True)
    print(json.dumps({"unpacked_sps": round(flat_sps, 1),
                      "packed_sps": round(packed_sps, 1),
                      "packed_speedup": round(packed_sps / flat_sps, 3),
                      "samples_per_step": samples}))


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--bs", type=int, default=120)
    ap.add_argument("--steps", type=int, default=8)
    ap.add_argument("--check-only", action="store_true")
    ap.add_argument("--cpu", action="store_true")
    a = ap.parse_args()
    if a.check_only:
        check_correctness()
    else:
        # correctness gate runs in a child so its forced-CPU config can't
        # leak into the TPU throughput measurement
        import subprocess
        subprocess.run([sys.executable, os.path.abspath(__file__),
                        "--check-only"], check=True)
        measure(a)
