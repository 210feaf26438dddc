"""End-to-end learning smoke test: on synthetic correlated audio-image pairs
the full training step (frozen random towers + trainable branch, contrastive
loss over the global batch on an 8-device mesh) must drive the loss down and
make retrieval beat chance.

This is the strongest hermetic proof that gradients, masking, DP sharding,
optimizer wiring and the retrieval metric compose correctly.
"""
import numpy as np

import jax
import jax.numpy as jnp
from speechclip_plus_tpu.ops.retrieval import mutual_retrieval
from speechclip_plus_tpu.optim import build_optimizer
from speechclip_plus_tpu.parallel import (
    create_train_state,
    make_eval_step,
    make_mesh,
    make_train_step,
)
from speechclip_plus_tpu.parallel.mesh import shard_batch

from test_kwclip_model import tiny_cfg
from speechclip_plus_tpu.models import KWClip
import pytest

# slow tier: torch-oracle parity / end-to-end (run_test.sh default skips)
pytestmark = pytest.mark.slow


def correlated_batch(rng, n_class=8, per_class=2, T=640, img=32):
    """Audio = class-specific tone + noise; image = class-specific pattern."""
    B = n_class * per_class
    cls = np.repeat(np.arange(n_class), per_class)
    t = np.arange(T) / 16000.0
    wav = np.stack([
        np.sin(2 * np.pi * (300 + 120 * c) * t) + 0.05 * rng.randn(T)
        for c in cls
    ]).astype(np.float32)
    base = rng.randn(n_class, img, img, 3).astype(np.float32)
    image = base[cls] + 0.05 * rng.randn(B, img, img, 3).astype(np.float32)
    text = np.zeros((B, 16), np.int32)
    text[:, 0] = 62
    text[:, 5] = 63
    return {
        "wav": jnp.asarray(wav),
        "wav_len": jnp.asarray(np.full(B, T)),
        "image": jnp.asarray(image),
        "id": jnp.asarray(cls),
        "text": jnp.asarray(text),
    }, cls


def test_training_learns_retrieval():
    cfg = tiny_cfg("", parallel_w=1.0, cascaded_w=0.0)  # parallel SpeechCLIP
    model = KWClip(cfg)
    rng = np.random.RandomState(0)
    batch, cls = correlated_batch(rng)
    variables = model.init({"params": jax.random.PRNGKey(0)}, batch, training=False)
    tx = build_optimizer(
        variables["params"], cfg, lr=3e-3,
        scheduler_args={"warmup": 5, "max_step": 4000, "final_lr": 1e-4},
    )
    mesh = make_mesh(jax.devices()[:8])
    state = create_train_state(model, variables, tx)
    step = make_train_step(model, tx, mesh=mesh)
    eval_step = make_eval_step(model, mesh=mesh)
    sbatch = shard_batch(batch, mesh)
    key = jax.random.PRNGKey(3)

    def recall_at_1(state):
        _, out = eval_step(state, sbatch)
        a = np.asarray(out["audio_feat"])
        ids = np.asarray(out["id"])
        uniq, first = np.unique(ids, return_index=True)
        g = np.asarray(out["image_feat"])[first]
        scores = a @ g.T
        r_ab, _, _ = mutual_retrieval(scores, scores.T, ids, uniq, [1])
        return r_ab["recall@1"]

    first_loss = None
    for i in range(60):
        state, metrics = step(state, sbatch, key)
        if first_loss is None:
            first_loss = float(metrics["train_loss"])
    last_loss = float(metrics["train_loss"])
    assert last_loss < 0.5 * first_loss, (first_loss, last_loss)

    r1 = recall_at_1(state)
    # chance level = 1/8 classes = 12.5%; trained model must do far better
    assert r1 >= 50.0, f"recall@1 after training = {r1}"
