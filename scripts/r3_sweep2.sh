#!/usr/bin/env bash
# Follow-up sweep: the chunk grid's per-program overhead (main sweep
# finding: block 20->40 at chunk 8 gave 206.7 -> 223.7) is attacked with
# fewer, bigger programs — larger row blocks (feasible ONLY under the
# chunked kernel: full-E blocks at block=40 OOM'd VMEM in round 2) and
# larger slot chunks. chunk must divide E_pad=72: valid {8, 24, 36, 72}.
set -u
OUT=${OUT:-/tmp/r3_sweep2.jsonl}
cd "$(dirname "$0")/.."
run() {
  echo ">>> $*" >&2
  timeout 2400 python "$@" 2>/dev/null | tail -1 | tee -a "$OUT"
}
run scripts/decode_sweep.py N=512 slotchunks=24 bfc=1 stages=1 block=40
run scripts/decode_sweep.py N=512 slotchunks=8 bfc=1 stages=1 block=80
run scripts/decode_sweep.py N=512 slotchunks=24 bfc=1 stages=1 block=80
# is the bounded fork copy pulling its weight vs whole-row at stages=1?
run scripts/decode_sweep.py N=512 slotchunks=8 bfc=0 stages=1 block=40
echo "sweep2 done" >&2
