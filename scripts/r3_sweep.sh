#!/usr/bin/env bash
# Round-3 beam/greedy sweep: v3 slot-bounded kernel configs, run
# sequentially on the one TPU chip (each line is a fresh process; the
# persistent compile cache amortizes repeats). Results append to
# $OUT (default /tmp/r3_sweep.jsonl).
set -u
OUT=${OUT:-/tmp/r3_sweep.jsonl}
cd "$(dirname "$0")/.."
run() {
  echo ">>> $*" >&2
  timeout 2400 python "$@" 2>/dev/null | tail -1 | tee -a "$OUT"
}
# 1. v2 baseline refresh (round-2 production config)
run scripts/decode_sweep.py N=512 slotchunks=0 bfc=0 stages=8
# 2. v3 candidate default: slot-bounded + bounded fork + single cache
run scripts/decode_sweep.py N=512 slotchunks=8 bfc=1 stages=1
# 3. staging interplay
run scripts/decode_sweep.py N=512 slotchunks=8 bfc=1 stages=4
# 4. chunk size
run scripts/decode_sweep.py N=512 slotchunks=16 bfc=1 stages=1
# 5. block size
run scripts/decode_sweep.py N=512 slotchunks=8 bfc=1 stages=1 block=40
# 6. batch sweep at candidate config
run scripts/decode_sweep.py N=768 slotchunks=8 bfc=1 stages=1
run scripts/decode_sweep.py N=1024 slotchunks=8 bfc=1 stages=1
# 7. int8 + v3
run scripts/decode_sweep.py N=512 slotchunks=8 bfc=1 stages=1 int8=1
# 8. greedy: v3 fused vs current default
run scripts/greedy_sweep.py N=1024 fused=1 slotchunks=8 stages=1
run scripts/greedy_sweep.py N=1024 fused=1 slotchunks=8 stages=1 block=64
run scripts/greedy_sweep.py N=1024 fused=0 stages=8
echo "sweep done" >&2
