from .masks import key_padding_mask, lengths_from_mask, valid_mask
from .gelu import fast_gelu
from .conv_frontend import conv0_pallas
from .weighted_sum import layer_norm, weighted_sum
from .losses import (
    contrastive_temperature,
    masked_contrastive_loss,
    quantity_l1_loss,
    supcon_loss,
)
from .retrieval import mutual_retrieval, recall_at_k
from .schedulers import get_schedule, linear_warmup_decay_schedule, noam_schedule
from .vq import scheduled_temperature, simple_vector_quantizer
from .kw_bn import (
    batch_norm_apply,
    init_bn_params,
    init_bn_state,
    kw_bn_dynamic,
    kw_bn_fixed,
)
from .cif import MAX_FEAT_LEN, integrate_and_fire, scale_alpha

__all__ = [
    "key_padding_mask",
    "valid_mask",
    "lengths_from_mask",
    "weighted_sum",
    "layer_norm",
    "masked_contrastive_loss",
    "contrastive_temperature",
    "supcon_loss",
    "quantity_l1_loss",
    "mutual_retrieval",
    "recall_at_k",
    "get_schedule",
    "noam_schedule",
    "linear_warmup_decay_schedule",
    "simple_vector_quantizer",
    "scheduled_temperature",
    "batch_norm_apply",
    "init_bn_params",
    "init_bn_state",
    "kw_bn_fixed",
    "kw_bn_dynamic",
    "MAX_FEAT_LEN",
    "integrate_and_fire",
    "scale_alpha",
]
