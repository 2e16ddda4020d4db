#!/usr/bin/env bash
# Wave 3: the fused LM-head + lse + top-R kernel (ops/lm_head.py) on the
# candidate champion configs from waves 1-2.
set -u
OUT=${OUT:-/tmp/r3_sweep3.jsonl}
cd "$(dirname "$0")/.."
run() {
  echo ">>> $*" >&2
  timeout 2400 python "$@" 2>>"${OUT%.jsonl}.err" | tail -1 | tee -a "$OUT"
}
# greedy XLA-attention baseline + fused LM head (greedy's logits path is
# relatively bigger: 1024x50257 f32 = 206 MB/step + argmax pass)
run scripts/greedy_sweep.py N=1024 fused=0 stages=8 flm=1
# beam round-2 production config + fused LM head
run scripts/decode_sweep.py N=512 slotchunks=0 bfc=0 stages=8 flm=1
# beam v3 candidate + fused LM head
run scripts/decode_sweep.py N=512 slotchunks=24 bfc=1 stages=1 block=40 flm=1
echo "sweep3 done" >&2
