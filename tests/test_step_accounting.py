"""Optimizer-step accounting under gradient accumulation.

The reference counts schedules in Lightning `global_step` = *optimizer*
steps: with `accumulate_grad_batches: 2` (large recipe) the LR schedule, the
VQ temperature decay (`my_vector_quantizer.py:124-137`) and CIF
`scaling_step` (`cif.py:102-104`) all advance once per TWO micro-batches,
and `trainer.max_steps: 50000` means 50k optimizer steps (100k micro).
These tests pin that clock on every consumer.
"""
import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax

from speechclip_plus_tpu.models import KWClip, VQConfig
from speechclip_plus_tpu.optim import build_optimizer
from speechclip_plus_tpu.parallel import create_train_state, make_train_step

from test_kwclip_model import make_batch, tiny_cfg

# slow tier: torch-oracle parity / end-to-end (run_test.sh default skips)
pytestmark = pytest.mark.slow


def _scheduled_model():
    """Tiny hybrid+ with a steep VQ temp decay so temp(opt_step) is visible."""
    cfg = tiny_cfg("HybridBranch_plus")
    head = dataclasses.replace(
        cfg.head,
        vq=VQConfig(temp_type="scheduled", temp_schedule=(2.0, 0.01, 0.5)),
    )
    return dataclasses.replace(cfg, head=head)


def _setup(accum):
    cfg = _scheduled_model()
    model = KWClip(cfg)
    rng = np.random.RandomState(0)
    batch = make_batch(rng)
    variables = model.init({"params": jax.random.PRNGKey(0)}, batch, training=False)
    tx = build_optimizer(
        variables["params"], cfg,
        scheduler_args={"warmup": 2, "max_step": 8, "final_lr": 1e-8},
        accumulate_grad_batches=accum,
    )
    state = create_train_state(model, variables, tx)
    step = make_train_step(model, tx, accumulate_grad_batches=accum)
    return state, step, batch


def test_vq_temperature_follows_optimizer_steps():
    """temp = max * decay**opt_step: micro-steps 0,1 see opt_step 0 and
    micro-steps 2,3 see opt_step 1 when accumulating over 2 batches."""
    state, step, batch = _setup(accum=2)
    key = jax.random.PRNGKey(1)
    temps = []
    for _ in range(4):
        state, metrics = step(state, batch, key)
        temps.append(float(metrics["train_temp"]))
    assert temps[0] == temps[1] == pytest.approx(2.0)
    assert temps[2] == temps[3] == pytest.approx(1.0)

    # without accumulation the clock is per micro-step
    state1, step1, batch = _setup(accum=1)
    t0 = float(step1(state1, batch, key)[1]["train_temp"])
    assert t0 == pytest.approx(2.0)


def test_multisteps_inner_count_is_optimizer_steps():
    from speechclip_plus_tpu.optim.optimizer import find_multisteps_state

    state, step, batch = _setup(accum=2)
    key = jax.random.PRNGKey(1)
    for _ in range(4):
        state, _ = step(state, batch, key)
    assert int(state.step) == 4  # micro-steps
    ms = find_multisteps_state(state.opt_state)
    assert isinstance(ms, optax.MultiStepsState)
    assert int(ms.gradient_step) == 2  # optimizer steps
    assert int(ms.mini_step) == 0


def test_multisteps_accumulator_excludes_frozen_towers():
    """MultiSteps sits INSIDE the multi_transform: its acc_grads buffer
    must hold storage for trainable leaves only — zeros_like(full tree)
    would be ~3 GB of dead HBM (plus an unfoldable ~6 GB/micro-step
    running-mean pass) for the frozen HuBERT-Large + ViT-L/14 towers."""
    from speechclip_plus_tpu.optim.optimizer import find_multisteps_state
    from speechclip_plus_tpu.optim import trainable_mask

    state, step, batch = _setup(accum=2)
    ms = find_multisteps_state(state.opt_state)

    def nbytes(tree):
        return sum(
            x.size * x.dtype.itemsize
            for x in jax.tree_util.tree_leaves(tree)
            if hasattr(x, "size")
        )

    labels = trainable_mask(state.params, _scheduled_model())
    train_bytes = 0
    frozen_bytes = 0
    for lbl, p in zip(
        jax.tree_util.tree_leaves(labels), jax.tree_util.tree_leaves(state.params)
    ):
        if lbl == "train":
            train_bytes += p.size * p.dtype.itemsize
        else:
            frozen_bytes += p.size * p.dtype.itemsize
    assert frozen_bytes > 0  # the tiny config does freeze its towers
    acc_bytes = nbytes(ms.acc_grads)
    # accumulator == trainable bytes, not full-tree bytes
    assert acc_bytes <= train_bytes, (acc_bytes, train_bytes)
    assert acc_bytes < train_bytes + frozen_bytes


def test_trainer_max_steps_counts_optimizer_steps(tmp_path):
    """Trainer.fit(max_steps=2, accum=2) must run 4 micro-steps."""
    from speechclip_plus_tpu.config import ConfigNode
    from speechclip_plus_tpu.tasks.trainer import Trainer

    cfg = _scheduled_model()
    model = KWClip(cfg)
    rng = np.random.RandomState(0)
    batch = {k: np.asarray(v) for k, v in make_batch(rng).items()}
    variables = model.init(
        {"params": jax.random.PRNGKey(0)},
        {k: jnp.asarray(v) for k, v in batch.items()},
        training=False,
    )
    node = ConfigNode({
        "trainer": {"max_steps": 2, "accumulate_grad_batches": 2,
                    "gradient_clip_val": 4, "log_every_n_steps": 1},
        "retrieval": {"audio_feat_src": "parallel", "recall_at": [1, 5, 10]},
        "audio_encoder": {
            "optim": {"name": "Adam", "args": {"lr": 1e-3, "weight_decay": 0}},
            "scheduler": {"name": "linear_warmup_decay", "warmup": 2,
                          "max_step": 8, "final_lr": 1e-8},
        },
    })
    trainer = Trainer(model, variables, node, str(tmp_path), devices=1)
    trainer.fit([batch, batch, batch, batch, batch, batch])
    assert int(trainer.state.step) == 4
    assert trainer.opt_step == 2
