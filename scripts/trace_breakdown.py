"""Per-term breakdown of a jax.profiler trace written by scripts/train_profile.py.

Groups device-side leaf ops of the newest trace by compute term (attention
matmuls, other matmuls, attention softmax/VPU, layernorm, noise, optimizer,
cache/stash copies, ...) using each op's `source` (file:line) and `tf_op`
metadata, and prints ms, share of the dispatch, achieved TFLOP/s and GB/s
per term. This quantifies the MFU ceiling analysis in docs/PERFORMANCE.md
(the reference has no profiling story at all — predictions_runner.py:125-151
is a wall-clock Timer).

Usage: python scripts/trace_breakdown.py [/tmp/train_trace]
"""
from __future__ import annotations

import glob
import gzip
import json
import os
import sys
from collections import defaultdict


import re

# Source-line anchors in the CURRENT tree (update if the functions move):
# gpt2.py _layer_norm body 140-146; _attention scores/softmax/AV 148-155.
_LAYERNORM = re.compile(r"gpt2\.py:14[0-6]$")
_ATTN_BLOCK = re.compile(r"gpt2\.py:1(4[89]|5[0-5])$")


def _out_rank(long_name: str) -> int:
    m = re.search(r"= \w+\[([\d,]*)\]", long_name)
    return len(m.group(1).split(",")) if m and m.group(1) else 0


def classify(name: str, args: dict) -> str:
    src = args.get("source", "")
    tf_op = args.get("tf_op", "")
    cat = args.get("hlo_category", "")
    long_name = args.get("long_name", "")
    is_mm = ("convolution" in cat or "convolution" in name
             or " dot(" in long_name or "%dot" in long_name)
    if "noise.py" in src:
        return "noise injection"
    if "optim" in src or "/optax/" in src or "update.py" in src:
        return "optimizer"
    if is_mm:
        # Attention score/value contractions produce [B,H,T,S]-rank-4
        # outputs; every dense projection is rank<=3. Robust to line moves.
        if _out_rank(long_name) >= 4 or _ATTN_BLOCK.search(src):
            return "attention matmuls (QK^T, AV)"
        return "dense matmuls (QKV/proj/MLP/LM-head/mapper)"
    if _ATTN_BLOCK.search(src) or "softmax" in tf_op:
        return "attention softmax/scale (VPU)"
    if _LAYERNORM.search(src) or "layer_norm" in tf_op:
        return "layernorm (VPU)"
    if "dynamic-update-slice" in name or "dynamic_update" in tf_op:
        return "stash/cache updates (HBM copies)"
    if "copy" in name or cat == "copy":
        return "layout copies"
    if "log_softmax" in tf_op or "logsumexp" in tf_op or "nll" in tf_op:
        return "loss (log-softmax/NLL)"
    return "other elementwise/VPU"


def main() -> None:
    log_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/train_trace"
    paths = sorted(glob.glob(
        os.path.join(log_dir, "plugins/profile/*/*.trace.json.gz")))
    if not paths:
        raise SystemExit(f"no trace under {log_dir}")
    with gzip.open(paths[-1], "rt") as f:
        data = json.load(f)

    groups = defaultdict(lambda: [0.0, 0.0, 0.0, 0])  # ms, flops, bytes, n
    top_ops = defaultdict(lambda: [0.0, 0])
    total_ms = 0.0
    for e in data.get("traceEvents", []):
        if e.get("ph") != "X":
            continue
        args = e.get("args") or {}
        if "device_duration_ps" not in args:
            continue  # host-side python frame, not a device op
        name = e.get("name", "?")
        if name.startswith(("while", "jit_", "jit(")) or name == "0":
            continue  # container regions double-count their leaves
        ms = float(args["device_duration_ps"]) / 1e9
        term = classify(name, args)
        g = groups[term]
        g[0] += ms
        g[1] += float(args.get("model_flops", 0) or 0)
        g[2] += float(args.get("bytes_accessed", 0) or 0)
        g[3] += 1
        total_ms += ms
        key = (term, args.get("source", "?"),
               args.get("tf_op", "?").rsplit("/", 1)[-1])
        top_ops[key][0] += ms
        top_ops[key][1] += 1

    print(f"{'term':44s} {'ms':>9s} {'%':>6s} {'TFLOP/s':>8s} "
          f"{'GB/s':>7s} {'ops':>6s}")
    for term, (ms, fl, by, n) in sorted(groups.items(),
                                        key=lambda kv: -kv[1][0]):
        tflops = fl / (ms / 1e3) / 1e12 if ms else 0.0
        gbs = by / (ms / 1e3) / 1e9 if ms else 0.0
        print(f"{term:44s} {ms:9.2f} {100 * ms / total_ms:5.1f}% "
              f"{tflops:8.1f} {gbs:7.0f} {n:6d}")
    print(f"{'TOTAL (leaf device ops)':44s} {total_ms:9.2f} 100.0%")
    print("\ntop sources:")
    for (term, src, op), (ms, n) in sorted(top_ops.items(),
                                           key=lambda kv: -kv[1][0])[:18]:
        print(f"{ms:9.2f} ms  x{n:<5d} {term:34.34s} "
              f"{os.path.basename(src):28.28s} {op[:40]}")


if __name__ == "__main__":
    main()
