"""int8-KV quality delta on an UNSATURATED model (VERDICT r3 weak #6).

The integration test pins the int8 serving knob's quality cost on a
converged toy (delta 0.0 — but a saturated model's peaked logits make
token flips nearly impossible, so that zero has little power). This
probe measures the delta where flips CAN happen: a compositional corpus
(adjective x noun x verb templates, 80 caption classes) and a model
trained only a few epochs, so next-token distributions stay soft. It
decodes the eval set with the exact bf16 beam and the int8-KV beam
(the production serving knob) and reports CIDEr/BLEU-4 deltas plus the
raw token-flip rate.

Usage: python scripts/int8_quality_probe.py [epochs=4] [n=512] [eval_n=64]
Runs the real fused kernels on TPU, interpret mode elsewhere.
Record results in docs/PERFORMANCE.md.
"""
import os
import pickle
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def make_hard_corpus(path, n, dim, seed=0):
    """Compositional captions: 4 adjectives x 5 nouns x 4 verbs = 80
    classes; embeddings = sum of per-factor codes + noise, so the mapper
    must compose factors instead of memorizing classes."""
    import numpy as np
    rng = np.random.RandomState(seed)
    adjs = ["red", "big", "old", "wet"]
    nouns = ["cat", "dog", "bus", "man", "bird"]
    verbs = ["runs", "sits", "jumps", "waits"]
    a_code = rng.randn(len(adjs), dim).astype(np.float32)
    n_code = rng.randn(len(nouns), dim).astype(np.float32)
    v_code = rng.randn(len(verbs), dim).astype(np.float32)
    caps, embeds = [], []
    for i in range(n):
        ai, ni, vi = (int(rng.randint(len(adjs))), int(rng.randint(len(nouns))),
                      int(rng.randint(len(verbs))))
        caps.append({"caption": f"a {adjs[ai]} {nouns[ni]} {verbs[vi]}.",
                     "image_id": i, "id": i, "clip_embedding": i})
        embeds.append(a_code[ai] + n_code[ni] + v_code[vi]
                      + 0.15 * rng.randn(dim).astype(np.float32))
    embeds = np.stack(embeds)
    with open(path, "wb") as f:
        pickle.dump({"clip_embedding": embeds, "captions": caps,
                     "clip_embedding_text_dave": embeds.copy()}, f)


def main():
    opts = dict(kv.split("=") for kv in sys.argv[1:])
    epochs = int(opts.get("epochs", 4))
    n = int(opts.get("n", 512))
    eval_n = int(opts.get("eval_n", 64))

    from capdec_tpu.utils.jax_setup import setup_jax
    setup_jax()
    import jax
    import numpy as np

    from capdec_tpu.data import dataset as data_lib
    from capdec_tpu.decode import BeamConfig
    from capdec_tpu.eval import metrics, predictions as pred_lib
    from capdec_tpu.models import caption_model, gpt2
    from capdec_tpu.train import loop as loop_lib
    from capdec_tpu.train import step as step_lib
    from capdec_tpu.utils.tokenizer import ByteTokenizer

    on_tpu = jax.default_backend() == "tpu"
    # 128-wide model: the real Pallas kernels lower on TPU
    # (beam.kernels_supported needs n_embd % 128 == 0)
    cfg = caption_model.CaptionModelConfig(
        prefix_length=4, clip_length=4, prefix_size=16, num_layers=2,
        mapping_type="mlp",
        gpt2=gpt2.GPT2Config(vocab_size=256, n_positions=64, n_embd=128,
                             n_layer=2, n_head=2))

    with tempfile.TemporaryDirectory(prefix="int8probe_") as tmp:
        data_path = os.path.join(tmp, "corpus.pkl")
        make_hard_corpus(data_path, n=n, dim=cfg.prefix_size)
        tok = ByteTokenizer()
        ds = data_lib.load_caption_dataset(data_path, cfg.prefix_length, tok)
        loop_cfg = loop_lib.TrainLoopConfig(
            epochs=epochs, batch_size=32, lr=2e-3, warmup_steps=0,
            save_every=1000, out_dir=os.path.join(tmp, "run"),
            prefix="probe", log_every=10000, save_state=False)
        result = loop_lib.train(cfg, loop_cfg, ds,
                                step_lib.NoiseConfig(variance=0.001))
        params = result["params"]
        print(f"train loss: {result['loss_per_epoch']['train'][0]:.3f} -> "
              f"{result['loss_per_epoch']['train'][-1]:.3f} "
              f"({epochs} epochs — deliberately undertrained)")

        with open(data_path, "rb") as f:
            corpus = pickle.load(f)
        records = [{"image_id": c["image_id"],
                    "clip_embedding": c["clip_embedding"],
                    "caption": c["caption"]}
                   for c in corpus["captions"][:eval_n]]
        embed_fn = pred_lib.make_pickle_embed_fn(corpus["clip_embedding"])
        gt = {"images": [{"id": r["image_id"]} for r in records],
              "annotations": [{"image_id": r["image_id"],
                               "caption": r["caption"], "id": i}
                              for i, r in enumerate(records)]}

        base = dict(beam_size=5, entry_length=18, stop_token=ord("."))
        kern = (dict(fused_interpret=False) if on_tpu
                else dict(fused_interpret=True, pallas_reorder=False))
        variants = {
            "exact": BeamConfig(**base, **kern),
            "int8": BeamConfig(**base, **kern, kv_cache_int8=True,
                               fused_attention=True),
        }
        preds, scores = {}, {}
        for name, bc in variants.items():
            pcfg = pred_lib.PredictConfig(beam=True, batch_size=eval_n,
                                          beam_config=bc)
            preds[name] = pred_lib.run_predictions(
                records, embed_fn, params, cfg, tok, pcfg)
            scores[name] = metrics.score_predictions(preds[name], gt)

        flips = sum(a["caption"] != b["caption"]
                    for a, b in zip(preds["exact"], preds["int8"]))
        print(f"backend={jax.default_backend()} eval_n={eval_n} "
              f"caption flips: {flips}/{eval_n} ({flips / eval_n:.1%})")
        for k in ("CIDEr", "Bleu_4", "Bleu_1", "METEOR"):
            e, q = scores["exact"][k], scores["int8"][k]
            print(f"{k:8s} exact={e:.4f} int8={q:.4f} delta={q - e:+.4f}")

        # ---- beam-SCORE deltas (VERDICT r4 item 7): a quantitative ----
        # error bound that transfers to real weights better than flip
        # counting. beam_search returns length-NORMALIZED scores
        # (cumulative log-prob / seq_length, decode/beam.py); with
        # stop_token=-1 every beam runs exactly `length` steps, so
        # cumulative = returned * length. |Δcumulative| integrates the
        # int8 cache's per-step logit error over the decode; reporting
        # it at several lengths shows how the error GROWS per step.
        import jax.numpy as jnp
        from capdec_tpu.decode import beam_search

        embeds = np.asarray(embed_fn(records), np.float32)
        embeds /= np.maximum(
            np.linalg.norm(embeds, axis=-1, keepdims=True), 1e-12)
        prefix = caption_model.map_prefix(params, cfg, jnp.asarray(embeds))
        print("\nbeam-score |delta| (exact vs int8-KV), cumulative "
              "log-prob of each ranked beam:")
        import dataclasses
        for length in (4, 9, 18):
            sc = {}
            for name, bc in variants.items():
                bc_l = dataclasses.replace(bc, entry_length=length,
                                           stop_token=-1)  # fixed length:
                # scores at equal step counts are directly comparable
                _, _, s, order = beam_search(params["gpt"], cfg.gpt2,
                                             prefix, bc_l)
                # order ranks beams; compare rank-aligned CUMULATIVE
                # log-probs (un-normalize the returned score by length)
                sc[name] = np.take_along_axis(np.asarray(s),
                                              np.asarray(order),
                                              axis=1) * length
            d = np.abs(sc["exact"] - sc["int8"])
            mag = np.abs(sc["exact"]).mean()
            print(f"  E={length:2d}: rank-0 cum mean|d|={d[:, 0].mean():.5f} "
                  f"max|d|={d[:, 0].max():.5f}  all-ranks "
                  f"mean|d|={d.mean():.5f} p99={np.percentile(d, 99):.5f} "
                  f"per-step mean|d|={d[:, 0].mean() / length:.6f} "
                  f"(mean |cum score|={mag:.3f})")


if __name__ == "__main__":
    main()
