"""Optimizer + schedule wiring.

Reference semantics: one torch.optim.Adam over the *trainable* parameters
only (`avssl/model/kwClip.py:646-674` + `getTrainableParams`): encoder
weighted-sum weights, loss temperature, branch/projection params; frozen
HuBERT/CLIP excluded (`speech_encoder_plus.py:478-494`,
`clip_official.py:136-147`). LR schedule `linear_warmup_decay` or `noam`
stepped per optimizer step (`avssl/optim/scheduler.py`), grad-norm clip 4 and
grad accumulation from the trainer config (`config/.../spchclip_h+.yaml`).

JAX realization: an optax chain — clip_by_global_norm -> add_decayed_weights
(torch Adam's coupled L2) -> scale_by_adam -> lr schedule — optionally
wrapped in optax.MultiSteps for grad accumulation, all INSIDE a
multi_transform whose frozen subtrees get `set_to_zero` (their grads are
already zero via stop_gradient; zeroing updates keeps them bit-identical).
MultiSteps must sit inside the multi_transform, not around it: outside, its
`acc_grads` buffer is zeros_like(FULL param tree) — ~3 GB of dead HBM for
the frozen HuBERT-Large + ViT-L/14 towers — and its running-mean update
`acc + (g - acc)/(n+1)` is a real multiply XLA cannot fold even when g == 0,
i.e. a ~6 GB/micro-step HBM round trip over buffers that stay zero forever.
Inside, optax.masked materializes accumulator state only for trainable
leaves (frozen leaves are MaskedNode sentinels with no storage).
"""
from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..ops.schedulers import get_schedule

__all__ = [
    "trainable_mask", "build_optimizer", "audio_subset_mask",
    "find_multisteps_state",
]

FROZEN_PREFIXES_DEFAULT = ("audio_encoder", "clip")


def trainable_mask(params: Dict, cfg) -> Dict:
    """Label pytree: 'train' vs 'freeze' per top-level module, following the
    reference's trainable-parameter policy."""
    frozen_roots = set()
    if not cfg.audio_trainable:
        frozen_roots.add("audio_encoder")
    if not (cfg.image_encoder_trainable or cfg.text_encoder_trainable):
        frozen_roots.add("clip")

    def label_tree(root_name, subtree):
        if root_name == "clip" and root_name not in frozen_roots:
            # partial freeze inside clip when only one tower is trainable
            out = {}
            for k, v in subtree.items():
                if k == "visual":
                    lbl = "train" if cfg.image_encoder_trainable else "freeze"
                elif k in ("text",):
                    lbl = "train" if cfg.text_encoder_trainable else "freeze"
                else:  # logit_scale rides with the text tower in the reference
                    lbl = "train" if cfg.text_encoder_trainable else "freeze"
                out[k] = jax.tree_util.tree_map(lambda _: lbl, v)
            return out
        lbl = "freeze" if root_name in frozen_roots else "train"
        return jax.tree_util.tree_map(lambda _: lbl, subtree)

    return {k: label_tree(k, v) for k, v in params.items()}


def audio_subset_mask(params: Dict, cfg) -> Optional[Dict]:
    """Per-leaf update multipliers realizing the reference's trainable-subset
    policy (`speech_encoder_plus.py:418-449,478-494`): when `reinit_layers` /
    `unfreeze_layers` select transformer layers, ONLY those layers train
    (plus the post-norm final encoder LayerNorm); the conv frontend,
    post_extract_proj, pos_conv and the remaining layers stay frozen.

    With `scan_layers` the layer params are stacked (L, ...), so the subset
    cannot be expressed as a pytree label — the mask is a (L,1,..)-shaped
    multiplier applied to gradients before, and updates after, the inner
    transform. Returns None when no subset policy is active.
    """
    sel = tuple(cfg.reinit_layers) or tuple(cfg.unfreeze_layers)
    if not (cfg.audio_trainable and sel):
        return None
    n_layers = cfg.audio.n_layers
    keep = np.zeros((n_layers,), np.float32)
    keep[list(sel)] = 1.0

    def mask_for(key: str, subtree):
        if key == "layers":  # scanned: leaves have a leading (L, ...) axis
            return jax.tree_util.tree_map(
                lambda p: jnp.asarray(keep).reshape(
                    (n_layers,) + (1,) * (p.ndim - 1)
                ),
                subtree,
            )
        if key.startswith("layers_"):  # unrolled variant
            k = float(keep[int(key.split("_")[-1])])
            return jax.tree_util.tree_map(lambda p: jnp.asarray(k), subtree)
        if key == "encoder_layer_norm" and not cfg.audio.layer_norm_first:
            # reference trainable_params adds the final post-norm LN (:489)
            return jax.tree_util.tree_map(lambda p: jnp.asarray(1.0), subtree)
        return jax.tree_util.tree_map(lambda p: jnp.asarray(0.0), subtree)

    mask = {
        k: (
            {kk: mask_for(kk, vv) for kk, vv in v.items()}
            if k == "audio_encoder"
            else jax.tree_util.tree_map(lambda p: jnp.asarray(1.0), v)
        )
        for k, v in params.items()
    }
    return mask


def _apply_subset_mask(tx: optax.GradientTransformation, mask_tree):
    """Multiply grads going in and updates coming out by the mask tree, so
    neither grad clipping nor weight decay leaks into frozen layer slices."""

    def init(params):
        return tx.init(params)

    def update(grads, state, params=None):
        grads = jax.tree_util.tree_map(lambda g, m: g * m, grads, mask_tree)
        updates, state = tx.update(grads, state, params)
        updates = jax.tree_util.tree_map(lambda u, m: u * m, updates, mask_tree)
        return updates, state

    return optax.GradientTransformation(init, update)


def build_optimizer(
    params: Dict,
    cfg,
    *,
    optim_name: str = "Adam",
    lr: float = 1e-4,
    weight_decay: float = 1e-6,
    scheduler_name: str = "linear_warmup_decay",
    scheduler_args: Optional[Dict[str, Any]] = None,
    gradient_clip_val: float = 4.0,
    accumulate_grad_batches: int = 1,
) -> optax.GradientTransformation:
    """Build the full optax transformation (reference trainer settings)."""
    schedule = get_schedule(scheduler_name, lr, **(scheduler_args or {}))

    parts = []
    if gradient_clip_val and gradient_clip_val > 0:
        parts.append(optax.clip_by_global_norm(gradient_clip_val))
    if optim_name.lower() in ("adam", "adamw"):
        if weight_decay and optim_name.lower() == "adam":
            # torch Adam couples L2 into the gradient before the moments
            parts.append(optax.add_decayed_weights(weight_decay))
        parts.append(optax.scale_by_adam(b1=0.9, b2=0.999, eps=1e-8))
        if weight_decay and optim_name.lower() == "adamw":
            parts.append(optax.add_decayed_weights(weight_decay))
    else:
        raise NotImplementedError(optim_name)
    parts.append(optax.scale_by_learning_rate(schedule))
    inner = optax.chain(*parts)
    if accumulate_grad_batches and accumulate_grad_batches > 1:
        # inside the multi_transform (see module docstring): accumulator
        # state exists only for trainable leaves
        inner = optax.MultiSteps(inner, every_k_schedule=accumulate_grad_batches)

    labels = trainable_mask(params, cfg)
    tx = optax.multi_transform(
        {"train": inner, "freeze": optax.set_to_zero()}, param_labels=labels
    )
    subset = audio_subset_mask(params, cfg)
    if subset is not None:
        tx = _apply_subset_mask(tx, subset)
    return tx


def find_multisteps_state(opt_state) -> Optional["optax.MultiStepsState"]:
    """Locate the MultiStepsState nested inside the optimizer state tree
    (MultiSteps lives inside multi_transform's 'train' slot). None when the
    optimizer was built without grad accumulation."""
    found = []

    def is_ms(x):
        if isinstance(x, optax.MultiStepsState):
            found.append(x)
            return True
        return False

    jax.tree_util.tree_flatten(opt_state, is_leaf=is_ms)
    return found[0] if found else None


def build_optimizer_from_config(params: Dict, model_cfg, cfg_node):
    """Convenience: read the reference YAML `audio_encoder.optim/scheduler`
    + `trainer` sections (`base_task.py:196-208`, `kwClip.py:646-674`)."""
    optim = cfg_node.audio_encoder.optim
    sched = cfg_node.audio_encoder.scheduler
    trainer = cfg_node.trainer
    sched_d = sched.to_dict() if hasattr(sched, "to_dict") else dict(sched)
    name = sched_d.pop("name")
    optim_args = optim.args.to_dict() if hasattr(optim.args, "to_dict") else dict(optim.args)
    return build_optimizer(
        params,
        model_cfg,
        optim_name=optim.name,
        lr=float(optim_args.get("lr", 1e-4)),
        weight_decay=float(optim_args.get("weight_decay", 0.0)),
        scheduler_name=name,
        scheduler_args={k: (int(v) if k in ("warmup", "max_step") else float(v))
                        for k, v in sched_d.items()},
        gradient_clip_val=float(getattr(trainer, "gradient_clip_val", 0.0) or 0.0),
        accumulate_grad_batches=int(getattr(trainer, "accumulate_grad_batches", 1)),
    )
