"""Sharded train / eval steps.

One jitted global-view step reproduces the reference's two-phase
Lightning-DP protocol (`avssl/model/kwClip.py:145-193`: per-GPU forward ->
gather -> loss on the concatenated batch) with zero orchestration code: the
batch is sharded over the mesh's data axis, the forward runs SPMD, and the
contrastive similarity matrix forces XLA to all-gather the (tiny) projected
features over ICI. Gradients are psum-reduced automatically; keyword
BatchNorm statistics are likewise computed over the global batch, matching
DP's single-process batch-stat view.

Mixed precision: the reference trains fp16 via Lightning (`trainer.precision:
16`); on TPU the towers run bf16 when `KWClipConfig.audio.dtype` /
`clip.dtype` are set to bfloat16, while losses, BN stats, VQ statistics and
the CIF accumulator stay fp32 (see ops/*).
"""
from __future__ import annotations

from typing import Any, Callable, Dict, Optional, Tuple

import flax.struct
import jax
import jax.numpy as jnp
import optax

from ..models.kwclip import KWClip
from .mesh import batch_sharding, replicated_sharding

__all__ = [
    "TrainState", "create_train_state", "make_train_step", "make_eval_step",
    "training_key",
]


def training_key(seed: int, impl: Optional[str] = None) -> jax.Array:
    """Training RNG key (dropout / VQ gumbel / LayerDrop).

    Defaults to the TPU hardware generator ("rbg") on TPU backends:
    generating the step's dropout masks with the default threefry measures
    62 ms at the reference shapes (2.6G bernoulli draws — train-mode
    dropout runs inside the frozen towers, reference behavior via
    Lightning's train()) vs 36 ms with rbg, on a 297 ms step. threefry
    elsewhere, or on request (config `trainer.rng_impl: threefry2x32`) —
    rbg trades splittability guarantees that dropout does not need.
    """
    if impl is None:
        impl = "rbg" if jax.default_backend() == "tpu" else "threefry2x32"
    return jax.random.key(seed, impl=str(impl))


@flax.struct.dataclass
class TrainState:
    step: jnp.ndarray
    params: Any
    batch_stats: Any
    opt_state: Any


def create_train_state(
    model: KWClip, variables: Dict, tx: optax.GradientTransformation
) -> TrainState:
    params = variables["params"]
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        batch_stats=variables.get("batch_stats", {}),
        opt_state=tx.init(params),
    )


def _forward_and_loss(
    model: KWClip, params, batch_stats, batch, step, rngs, training: bool
):
    variables = {"params": params, "batch_stats": batch_stats}
    if training:
        (loss_feats, log_metrics, others), new_vars = model.apply(
            variables,
            batch,
            training=True,
            global_step=step,
            rngs=rngs,
            mutable=["batch_stats"],
        )
        new_stats = new_vars.get("batch_stats", batch_stats)
    else:
        loss_feats, log_metrics, others = model.apply(
            variables, batch, training=False
        )
        new_stats = batch_stats
    if "valid" in batch:
        loss_feats = dict(loss_feats, valid=batch["valid"])
    losses = model.apply(variables, loss_feats, method=KWClip.compute_loss)
    return losses, log_metrics, others, new_stats


def make_train_step(
    model: KWClip,
    tx: optax.GradientTransformation,
    mesh=None,
    donate: bool = True,
    accumulate_grad_batches: int = 1,
    state_sharding=None,
) -> Callable[[TrainState, Dict, jax.Array], Tuple[TrainState, Dict]]:
    """Build the jitted SPMD train step.

    Returns `step_fn(state, batch, rng) -> (state, metrics)`. When `mesh` is
    given, input batches are expected sharded on the leading axis and the
    state replicated; without a mesh it is an ordinary single-device jit.
    `state_sharding` (a NamedSharding tree matching TrainState, e.g. from
    `tp.train_state_shardings`) overrides the replicated state layout for
    tensor parallelism over a 2-D ("data", "model") mesh.

    `state.step` counts *micro*-steps (one per call); all schedule clocks —
    the LR schedule (via optax.MultiSteps' inner count), the VQ temperature
    decay and CIF `scaling_step` — advance per *optimizer* step, i.e.
    `state.step // accumulate_grad_batches`, matching Lightning's
    `global_step` semantics under `accumulate_grad_batches`
    (reference `cif.py:102-104`, `my_vector_quantizer.py:124-137`).
    """

    cfg = model.cfg
    accum = max(int(accumulate_grad_batches), 1)
    frozen_roots = []
    if not cfg.audio_trainable:
        frozen_roots.append("audio_encoder")
    if not (cfg.image_encoder_trainable or cfg.text_encoder_trainable):
        frozen_roots.append("clip")

    def step_fn(state: TrainState, batch: Dict, rng: jax.Array):
        rngs = {"dropout": jax.random.fold_in(rng, state.step)}
        rngs["vq"] = jax.random.fold_in(rngs["dropout"], 1)
        rngs["layer_drop"] = jax.random.fold_in(rngs["dropout"], 2)
        opt_step = state.step // accum  # Lightning global_step equivalent

        def loss_fn(params):
            # frozen towers: cut the parameter cotangents entirely (grads
            # still flow through *activations*, e.g. into the keywords fed
            # to the frozen CLIP text tower) - XLA then DCEs the tower
            # weight-gradient matmuls
            p = dict(params)
            for root in frozen_roots:
                p[root] = jax.lax.stop_gradient(params[root])
            losses, log_metrics, _, new_stats = _forward_and_loss(
                model, p, state.batch_stats, batch, opt_step, rngs, True
            )
            return losses["loss"], (losses, log_metrics, new_stats)

        (_, (losses, log_metrics, new_stats)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params)

        updates, new_opt_state = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        new_state = TrainState(
            step=state.step + 1,
            params=new_params,
            batch_stats=new_stats,
            opt_state=new_opt_state,
        )
        metrics = {f"train_{k}": v for k, v in losses.items()}
        metrics.update({f"train_{k}": v for k, v in log_metrics.items()})
        metrics["grad_norm"] = optax.global_norm(grads)
        return new_state, metrics

    if mesh is not None:
        repl = replicated_sharding(mesh)
        data = batch_sharding(mesh)
        state_in = state_sharding if state_sharding is not None else repl
        return jax.jit(
            step_fn,
            in_shardings=(state_in, data, repl),
            out_shardings=(state_in, repl),
            donate_argnums=(0,) if donate else (),
        )
    return jax.jit(step_fn, donate_argnums=(0,) if donate else ())


def make_eval_step(model: KWClip, mesh=None, state_sharding=None) -> Callable:
    """Jitted validation step: loss metrics + retrieval features
    (reference `validation_step`, `kwClip.py:195-246`)."""

    def step_fn(state: TrainState, batch: Dict):
        losses, log_metrics, others, _ = _forward_and_loss(
            model, state.params, state.batch_stats, batch, state.step, None, False
        )
        audio_feat = (
            others["cascaded_audio_feat"]
            if model.cfg.retrieval_audio_feat_src == "cascaded"
            else others["parallel_audio_feat"]
        )
        out = {
            "id": batch["id"],
            "audio_feat": audio_feat,
            "image_feat": others["image_feat"],
        }
        if others.get("keywords") is not None:
            out["keywords"] = others["keywords"]
        if others.get("keywords_len") is not None:
            out["keywords_len"] = others["keywords_len"]
        if "text" in batch:
            out["text"] = batch["text"]  # gold captions for detokenization
        if "valid" in batch:
            out["valid"] = batch["valid"]
        metrics = {f"val_{k}": v for k, v in losses.items()}
        metrics.update({f"val_{k}": v for k, v in log_metrics.items()})
        return metrics, out

    if mesh is not None:
        repl = replicated_sharding(mesh)
        data = batch_sharding(mesh)
        state_in = state_sharding if state_sharding is not None else repl
        return jax.jit(
            step_fn, in_shardings=(state_in, data), out_shardings=(repl, repl)
        )
    return jax.jit(step_fn)
