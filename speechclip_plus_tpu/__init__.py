"""speechclip_plus_tpu: a TPU-native JAX/Flax rebuild of SpeechCLIP /
SpeechCLIP+ (reference: ShampooWang/SpeechCLIP_plus).

Layout:
  config    - attribute-style nested config tree (YAML-compatible)
  ops       - pure jit-safe kernels (losses, VQ, CIF, BN, retrieval, ...)
  nn        - Flax building blocks (attention, transformers, MLP)
  models    - HuBERT / CLIP towers, SpeechCLIP branches, the full model
  parallel  - mesh setup, sharded train/eval steps
  data      - datasets, audio/image pipeline, tokenizer
  optim     - optimizer/schedule wiring
  checkpoint- orbax IO + torch checkpoint importers
  tasks     - CLI task runners
  utils     - logging, metrics, keyword extraction, visualization
"""

__version__ = "0.1.0"

from . import config, ops  # noqa: F401
from .config import ConfigNode, load_config, merge_configs  # noqa: F401
