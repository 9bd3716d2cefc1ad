"""omnibiote_tpu: a TPU-native (JAX/XLA/Pallas) framework with the
capabilities of nyuolab/OmniBioTE.

Public surface:
  * config.OmniBioTAConfig / TrainConfig — typed configuration
  * models.omnibiota — init_params / forward / encode
  * ops — Pallas flash attention, segment-id masking, XLA oracle
  * data — streaming shard reader, packer, mixture batcher, prefetch
  * tokenizer — SentencePiece-compatible BPE (C++ core, Python binding)
  * training — MLM pretraining loop, µP-AdamW, checkpointing
  * evals — GUE / TAPE / ProteinGLUE / ProNAB / PDB-contact harness
"""
from .config import (
    OmniBioTAConfig,
    TrainConfig,
    preset,
    EOS_TOKEN,
    PAD_TOKEN,
    MASK_TOKEN,
    UNK_TOKEN,
    BANNED_TOKEN,
)
from .models.omnibiota import init_params, forward, encode, num_params

__version__ = "0.1.0"
