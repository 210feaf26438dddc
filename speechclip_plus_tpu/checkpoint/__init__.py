"""Checkpoint IO: orbax (native) + torch importers (fairseq / OpenAI CLIP /
HuggingFace / PyTorch-Lightning SpeechCLIP+ releases)."""
from .lightning_import import (  # noqa: F401
    lightning_to_kwclip,
    load_lightning_checkpoint,
)
from .orbax_io import CheckpointManager  # noqa: F401
from .torch_import import load_torch_state_dict  # noqa: F401
from .towers import (  # noqa: F401
    clip_config_from_openai_sd,
    fairseq_hubert_to_flax,
    hf_clip_to_flax,
    hf_hubert_to_flax,
    hubert_config_from_fairseq_sd,
    materialize_weight_norm,
    openai_clip_to_flax,
    reduce_token_embedding,
)
