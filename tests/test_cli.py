"""CLI surface tests: flag names, presets, registries (no device work)."""
import json
import os
import pickle

import numpy as np


def test_train_parser_flag_surface():
    from capdec_tpu.cli.train import build_parser
    p = build_parser()
    args = p.parse_args([
        "--data", "x.pkl", "--noise_variance", "0.016", "--uniform_noise",
        "--dont_norm", "--lr", "1e-4", "--epochs", "3", "--save_every", "2",
        "--prefix_length", "20", "--prefix_length_clip", "10", "--bs", "16",
        "--only_prefix", "--mapping_type", "mlp", "--num_layers", "4",
        "--is_not_rn", "--use_image_embedding_as_clipcap",
        "--add_modality_offset", "--prefix", "run1", "--val_pt", "v.pkl",
        "--pretrain_weights", "w.pt", "--out_dir", "o"])
    assert args.noise_variance == 0.016 and args.uniform_noise
    assert args.prefix_length == 20 and args.bs == 16 and args.only_prefix


def test_train_presets(monkeypatch):
    from capdec_tpu.cli.train import apply_presets, build_parser
    monkeypatch.setenv("CAPDEC_DATA_ROOT", "/data")
    args = build_parser().parse_args(["--data", "COCO"])
    args = apply_presets(args)
    assert args.bs == 30
    assert args.data.startswith("/data/coco/")
    assert "val" in args.val_pt.lower() or args.val_pt

    args = build_parser().parse_args(["--data", "FLICKR"])
    args = apply_presets(args)
    assert args.bs == 16
    assert "flicker30" in args.data

    args = build_parser().parse_args(["--data", "COCO", "--dont_norm"])
    args = apply_presets(args)
    assert "not_norm" in args.data and args.val_pt == ""


def test_predict_registry_and_path_fns():
    from capdec_tpu.cli.predict import dataset_registry, image_path_fn_for_mode
    reg = dataset_registry("/data")
    assert set(reg) == set(range(9))
    fn = image_path_fn_for_mode(0, "/imgs")
    assert fn({"image_id": 42}) == "/imgs/COCO_val2014_000000000042.jpg"
    fn6 = image_path_fn_for_mode(6, "/imgs")
    assert "train2014" in fn6({"image_id": 1})
    fn1 = image_path_fn_for_mode(1, "/imgs")
    assert fn1({"filename": "a.jpg"}) == "/imgs/a.jpg"


def test_embeddings_mode_table():
    from capdec_tpu.cli.embeddings_generator import mode_table
    t = mode_table("/data", "RN50x4", True, 0)
    assert set(t) == {0.0, 0.5, 1.0, 1.5, 2.0, 3.0, 4.0, 6.0, 7.0, 8.0, 9.0}
    # text-only corpora have no image root
    for m in (6.0, 7.0, 8.0, 9.0):
        assert t[m][2] == "NoImgs"
    assert "not_norm" in t[0.0][0]


def test_modality_offset_loader(tmp_path):
    from capdec_tpu.cli.train import load_modality_offset
    path = str(tmp_path / "centers.pkl")
    with open(path, "wb") as f:
        pickle.dump({"offset_to_add_in_training":
                     np.ones((1, 8), np.float32) * 0.5}, f)
    off = load_modality_offset(path)
    assert off.shape == (1, 8) and off.dtype == np.float32


def test_predict_parser_int8_kv_flag():
    from capdec_tpu.cli.predict import build_parser
    p = build_parser()
    assert p.parse_args([]).int8_kv is False
    assert p.parse_args(["--int8_kv"]).int8_kv is True
