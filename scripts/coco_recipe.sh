#!/usr/bin/env bash
# End-to-end COCO text-only captioning recipe (reference README.md:26-78
# workflow on the TPU stack). Requires the external artifacts this
# zero-egress build environment cannot ship:
#   $KARPATHY_JSON   Karpathy-split dataset_coco.json
#   $CLIP_CKPT       OpenAI CLIP RN50x4.pt
#   $GPT2_DIR        dir with GPT-2 vocab.json, merges.txt and a torch
#                    state_dict (pytorch_model.bin)
set -euo pipefail
export CAPDEC_DATA_ROOT=${CAPDEC_DATA_ROOT:-./data}
export CAPDEC_GPT2_VOCAB_DIR=$GPT2_DIR
export CAPDEC_CLIP_BPE_PATH=${CAPDEC_CLIP_BPE_PATH:-bpe_simple_vocab_16e6.txt.gz}

# 1. Karpathy split -> annotation JSONs (+ metrics-format ground truth)
python - <<PY
from capdec_tpu.data.parsers import parse_karpathy_split
parse_karpathy_split("$KARPATHY_JSON", "$CAPDEC_DATA_ROOT/coco/annotations")
PY

# 2. CLIP text embeddings for the train split (batched, jitted)
python -m capdec_tpu.cli.embeddings_generator \
    --dataset_mode 0 --clip_model_type RN50x4 --clip_checkpoint "$CLIP_CKPT" \
    --annotations "$CAPDEC_DATA_ROOT/coco/annotations/train.json" \
    --out "$CAPDEC_DATA_ROOT/coco/oscar_split_RN50x4_train_with_text_embeddings.pkl"

# 3. text-only training with noise injection (paper: sigma^2 = 0.016)
python -m capdec_tpu.cli.train --data COCO --out_dir ckpt_coco \
    --noise_variance 0.016 --only_prefix --bf16 \
    --gpt2_weights "$GPT2_DIR/pytorch_model.bin"

# 4. caption the test split + score BLEU/ROUGE-L/CIDEr in-process
python -m capdec_tpu.cli.predict \
    --checkpoint ckpt_coco/coco_prefix-009.pt --dataset_mode 0 \
    --clip_checkpoint "$CLIP_CKPT" \
    --score_gt "$CAPDEC_DATA_ROOT/coco/annotations/test_metrics_format.json"
