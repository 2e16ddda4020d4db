#!/usr/bin/env bash
# Follow-up sweep: the chunk grid's per-program overhead (main sweep
# finding: block 20->40 at chunk 8 gave 206.7 -> 223.7 caps/s) is
# attacked with fewer, bigger programs — larger row blocks (feasible
# ONLY under the chunked kernel: full-E blocks at block=40 OOM'd VMEM
# in round 2) and larger slot chunks. chunk must divide E_pad=72:
# valid {8, 24, 36, 72}. Ordered by decision value.
set -u
OUT=${OUT:-/tmp/r3_sweep2.jsonl}
cd "$(dirname "$0")/.."
run() {
  echo ">>> $*" >&2
  timeout 2400 python "$@" 2>>"${OUT%.jsonl}.err" | tail -1 | tee -a "$OUT"
}
# candidate exact-path champion: 96 programs/layer (vs v2's 128)
run scripts/decode_sweep.py N=512 slotchunks=24 bfc=1 stages=1 block=80
# fallback if 80 OOMs VMEM
run scripts/decode_sweep.py N=512 slotchunks=24 bfc=1 stages=1 block=40
# greedy: R=1 makes the prefix block scale with TB (block=64 OOM'd);
# chunk=24 cuts programs 3x at feasible blocks
run scripts/greedy_sweep.py N=1024 fused=1 slotchunks=24 stages=1 block=24
# int8 beam at the better geometry (block=20 run was overhead-bound)
run scripts/decode_sweep.py N=512 slotchunks=24 bfc=1 stages=1 block=40 int8=1
# chunk-vs-block disentangling + fork-copy ablation
run scripts/decode_sweep.py N=512 slotchunks=8 bfc=1 stages=1 block=80
run scripts/decode_sweep.py N=512 slotchunks=8 bfc=0 stages=1 block=40
run scripts/greedy_sweep.py N=1024 fused=1 slotchunks=24 stages=1 block=32
echo "sweep2 done" >&2
