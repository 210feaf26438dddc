"""Multi-chip data parallelism tests on the 8-device virtual CPU mesh.

Validates the TPU replacement for the reference's Lightning-DP strategy
(`avssl/model/kwClip.py:145-193`): a batch sharded over the mesh must produce
the *same* loss/update as the unsharded global batch (DP gathers features so
in-batch negatives span devices — here XLA's all-gather does it).
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp
from speechclip_plus_tpu.optim import build_optimizer
from speechclip_plus_tpu.parallel import (
    create_train_state,
    make_eval_step,
    make_mesh,
    make_train_step,
)
from speechclip_plus_tpu.parallel.mesh import shard_batch

from test_kwclip_model import make_batch, tiny_cfg
from speechclip_plus_tpu.models import KWClip


def big_batch(rng, B=8, T=900, img=32):
    wav = rng.randn(B, T).astype(np.float32)
    wav_len = np.minimum(T, 300 + rng.randint(0, T - 300, size=B))
    wav_len[0] = T
    for b, l in enumerate(wav_len):
        wav[b, l:] = 0.0
    text = np.zeros((B, 16), np.int32)
    text[:, 0] = 62
    eot = 3 + rng.randint(0, 8, size=B)
    text[np.arange(B), eot] = 63
    return {
        "wav": jnp.asarray(wav),
        "wav_len": jnp.asarray(wav_len),
        "image": jnp.asarray(rng.randn(B, img, img, 3).astype(np.float32)),
        "id": jnp.asarray(rng.randint(0, 6, size=B)),
        "text": jnp.asarray(text),
    }


@pytest.mark.parametrize("branch_type", ["HybridBranch_plus"])
def test_sharded_step_matches_single_device(branch_type):
    assert jax.device_count() >= 8, "conftest must provide 8 virtual devices"
    cfg = tiny_cfg(branch_type)
    model = KWClip(cfg)
    rng = np.random.RandomState(0)
    batch = big_batch(rng)
    variables = model.init({"params": jax.random.PRNGKey(0)}, batch, training=False)
    tx = build_optimizer(
        variables["params"], cfg, lr=1e-3,
        scheduler_args={"warmup": 10, "max_step": 100, "final_lr": 1e-8},
    )

    # single-device reference
    state0 = create_train_state(model, variables, tx)
    step_single = make_train_step(model, tx, mesh=None, donate=False)
    key = jax.random.PRNGKey(42)
    state1_ref, metrics_ref = step_single(state0, batch, key)

    # 8-way sharded
    mesh = make_mesh(jax.devices()[:8])
    state0b = create_train_state(model, variables, tx)
    step_sharded = make_train_step(model, tx, mesh=mesh, donate=False)
    sbatch = shard_batch(batch, mesh)
    state1_dp, metrics_dp = step_sharded(state0b, sbatch, key)

    np.testing.assert_allclose(
        float(metrics_ref["train_loss"]), float(metrics_dp["train_loss"]),
        rtol=1e-4,
    )
    # parameters after one update must agree (global-batch semantics)
    flat_ref = jax.tree_util.tree_leaves(state1_ref.params)
    flat_dp = jax.tree_util.tree_leaves(state1_dp.params)
    for a, b in zip(flat_ref, flat_dp):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-5)


def test_multi_step_training_decreases_loss():
    cfg = tiny_cfg("HybridBranch_plus")
    model = KWClip(cfg)
    rng = np.random.RandomState(1)
    batch = big_batch(rng)
    variables = model.init({"params": jax.random.PRNGKey(0)}, batch, training=False)
    tx = build_optimizer(
        variables["params"], cfg, lr=5e-3,
        scheduler_args={"warmup": 2, "max_step": 1000, "final_lr": 1e-8},
    )
    mesh = make_mesh(jax.devices()[:8])
    state = create_train_state(model, variables, tx)
    step = make_train_step(model, tx, mesh=mesh)
    sbatch = shard_batch(batch, mesh)
    key = jax.random.PRNGKey(7)
    losses = []
    for i in range(8):
        state, metrics = step(state, sbatch, key)
        losses.append(float(metrics["train_loss"]))
    assert losses[-1] < losses[0], losses
    # frozen towers must stay bit-identical through updates
    a0 = jax.tree_util.tree_leaves(variables["params"]["audio_encoder"])
    a1 = jax.tree_util.tree_leaves(state.params["audio_encoder"])
    for x, y in zip(a0, a1):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_eval_step_runs_sharded():
    cfg = tiny_cfg("HybridBranch_plus")
    model = KWClip(cfg)
    rng = np.random.RandomState(2)
    batch = big_batch(rng)
    variables = model.init({"params": jax.random.PRNGKey(0)}, batch, training=False)
    tx = build_optimizer(variables["params"], cfg)
    mesh = make_mesh(jax.devices()[:8])
    state = create_train_state(model, variables, tx)
    eval_step = make_eval_step(model, mesh=mesh)
    metrics, out = eval_step(state, shard_batch(batch, mesh))
    assert np.isfinite(float(metrics["val_loss"]))
    assert out["audio_feat"].shape == (8, cfg.clip.text_width)
    assert out["image_feat"].shape == (8, cfg.clip.embed_dim)
