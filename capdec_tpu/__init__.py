"""capdec_tpu — TPU-native text-only image captioning framework.

A ground-up JAX/XLA/Pallas rebuild of the capabilities of CapDec
("Text-Only Training for Image Captioning using Noise-Injected CLIP",
EMNLP 2022 findings; reference implementation surveyed in SURVEY.md).

The framework trains a captioning model from text alone: captions are
embedded with CLIP's text encoder, Gaussian/uniform-ball noise is injected
to bridge the CLIP modality gap, a mapper network produces a GPT-2 prefix,
and the model is trained with next-token cross-entropy. At inference an
image CLIP embedding drives a fixed-shape, KV-cached beam decode.

Package layout:
  models/    GPT-2 LM, mapper family, CLIP encoders, the caption model
  ops/       noise injection, attention/decode primitives, Pallas kernels
  parallel/  device mesh construction and sharding rules
  data/      corpus parsers, embedding pickles, batching
  train/     optimizer, jitted train step, training loop, checkpoints
  decode/    beam search and top-p decoding engines
  eval/      predictions runner, captioning metrics
  utils/     torch checkpoint converters, tokenizer, timers
  cli/       command-line entry points mirroring the reference surface
"""

__version__ = "0.1.0"
