"""End-to-end CLI main() runs on CPU with tiny configs: train then predict,
exercising the full glue (arg parsing, dataset load, loop, checkpoint IO,
prediction writing, scoring)."""
import json
import pickle

import numpy as np
import pytest


def _write_corpus(path, n=40, dim=640):
    rng = np.random.RandomState(0)
    caps = [{"caption": f"a tiny caption {i % 4}.", "image_id": i, "id": i,
             "clip_embedding": i} for i in range(n)]
    data = {"clip_embedding": rng.randn(n, dim).astype(np.float32),
            "captions": caps,
            "clip_embedding_text_dave": rng.randn(n, dim).astype(np.float32)}
    with open(path, "wb") as f:
        pickle.dump(data, f)


@pytest.mark.slow
def test_train_then_predict_cli(tmp_path, monkeypatch):
    from capdec_tpu.cli import predict as predict_cli
    from capdec_tpu.cli import train as train_cli

    monkeypatch.setenv("CAPDEC_JAX_CACHE", str(tmp_path / "jaxcache"))
    data = str(tmp_path / "train.pkl")
    _write_corpus(data)
    out_dir = str(tmp_path / "ckpt")

    train_cli.main([
        "--data", data, "--out_dir", out_dir, "--epochs", "1",
        "--bs", "8", "--noise_variance", "0.016", "--mapping_type", "mlp",
        "--only_prefix", "--prefix_length", "2", "--prefix_length_clip", "2",
        "--num_layers", "1", "--lr", "1e-4", "--prefix", "tiny"])

    ckpt = f"{out_dir}/tiny-000.pt"
    assert json.load(open(f"{out_dir}/loss_per_epoch.json"))["train"]

    # GT registry under a temp data root (dataset_mode 0)
    root = tmp_path / "dataroot"
    (root / "coco" / "annotations").mkdir(parents=True)
    records = [{"image_id": i, "caption": f"a tiny caption {i % 4}.",
                "clip_embedding": i} for i in range(8)]
    (root / "coco" / "annotations" /
     "single_caption_per_sample_val.json").write_text(json.dumps(records))
    gt = {"images": [{"id": r["image_id"]} for r in records],
          "annotations": [{"image_id": r["image_id"], "caption": r["caption"],
                           "id": i} for i, r in enumerate(records)]}
    gt_path = str(tmp_path / "gt.json")
    open(gt_path, "w").write(json.dumps(gt))
    monkeypatch.setenv("CAPDEC_DATA_ROOT", str(root))

    out_json = str(tmp_path / "preds.json")
    predict_cli.main([
        "--checkpoint", ckpt, "--embeddings_pickle", data,
        "--prefix_length", "2", "--prefix_length_clip", "2",
        "--num_layers", "1", "--mapping_type", "mlp", "--no_bf16",
        "--batch_size", "8", "--out", out_json, "--score_gt", gt_path,
        "--dataset_mode", "0"])

    preds = json.load(open(out_json))
    assert len(preds) == 8
    assert all(set(p) == {"caption", "image_id"} for p in preds)
