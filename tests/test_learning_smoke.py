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


def _train_and_eval(cfg, n_steps, lr=3e-3, seed=0):
    """Build + train cfg on the correlated world; returns loss trajectory,
    recall@1 and the dsample_len_diff trajectory (plus families)."""
    import dataclasses

    model = KWClip(cfg)
    rng = np.random.RandomState(seed)
    batch, cls = correlated_batch(rng)
    variables = model.init({"params": jax.random.PRNGKey(0)}, batch, training=False)
    tx = build_optimizer(
        variables["params"], cfg, lr=lr,
        scheduler_args={"warmup": 5, "max_step": 4000, "final_lr": 1e-4},
    )
    mesh = make_mesh(jax.devices()[:8])
    state = create_train_state(model, variables, tx)
    step = make_train_step(model, tx, mesh=mesh)
    eval_step = make_eval_step(model, mesh=mesh)
    sbatch = shard_batch(batch, mesh)
    key = jax.random.PRNGKey(3)

    losses, len_diffs = [], []
    for i in range(n_steps):
        state, metrics = step(state, sbatch, key)
        losses.append(float(metrics["train_loss"]))
        if "train_quantity_loss" in metrics:
            len_diffs.append(float(metrics["train_quantity_loss"]))

    _, out = eval_step(state, sbatch)
    a = np.asarray(out["audio_feat"])
    ids = np.asarray(out["id"])
    uniq, first = np.unique(ids, return_index=True)
    g = np.asarray(out["image_feat"])[first]
    scores = a @ g.T
    r_ab, _, _ = mutual_retrieval(scores, scores.T, ids, uniq, [1])
    return losses, r_ab["recall@1"], len_diffs


def test_training_learns_retrieval():
    cfg = tiny_cfg("", parallel_w=1.0, cascaded_w=0.0)  # parallel SpeechCLIP
    losses, r1, _ = _train_and_eval(cfg, 60)
    assert losses[-1] < 0.5 * losses[0], (losses[0], losses[-1])
    # chance level = 1/8 classes = 12.5%; trained model must do far better
    assert r1 >= 50.0, f"recall@1 after training = {r1}"


# The four keyword families: the straight-through VQ (+ CIF quantity loss)
# training dynamics behind the reference's headline models
# (avssl/model/kw_branches.py:285-891) must demonstrably LEARN — reduce the
# contrastive loss and beat chance retrieval — not merely differentiate.
# Cascaded-only families retrieve through the cascaded (VQ->CLIP-text)
# feature; plus families must also shrink the CIF length error.
_FAMILIES = [
    # (branch_type, parallel_w, cascaded_w, audio_feat_src, steps, min_r1)
    # cascaded-only retrieval through VQ -> CLIP-text converges slower than
    # the parallel feature (measured trajectory: chance until ~step 250,
    # 31-50% by step 350-400); thresholds are >= 2.5x chance
    ("CascadedBranch", 0.0, 1.0, "cascaded", 150, 37.5),
    ("CascadedBranch_plus", 0.0, 1.0, "cascaded", 400, 31.25),
    ("HybridBranch", 1.0, 1.0, "parallel", 100, 37.5),
    ("HybridBranch_plus", 1.0, 1.0, "parallel", 100, 37.5),
]


@pytest.mark.parametrize("branch,pw,cw,src,steps,min_r1", _FAMILIES,
                         ids=[f[0] for f in _FAMILIES])
def test_all_families_learn(branch, pw, cw, src, steps, min_r1):
    import dataclasses

    cfg = tiny_cfg(branch, parallel_w=pw, cascaded_w=cw)
    cfg = dataclasses.replace(cfg, retrieval_audio_feat_src=src)
    losses, r1, qlosses = _train_and_eval(cfg, steps)

    assert losses[-1] == losses[-1], f"{branch}: NaN loss"
    assert losses[-1] < 0.6 * losses[0], (
        f"{branch}: loss did not drop: {losses[0]:.3f} -> {losses[-1]:.3f}"
    )
    # chance = 12.5%; require a clear margin through the trained path
    assert r1 >= min_r1, f"{branch}: recall@1 after training = {r1}"
    if branch.endswith("_plus"):
        # the CIF quantity (L1 length) loss must shrink: the alpha head
        # learns to put sum(alpha) near the target length. (The logged
        # dsample_len_diff is 0 by construction while train-time scaling
        # is active — scaling forces the fired count to the target — so
        # the pre-scaling quantity loss is the honest learning signal.)
        k = max(len(qlosses) // 10, 1)
        early = np.mean(qlosses[:k])
        late = np.mean(qlosses[-k:])
        assert late < 0.5 * early, (
            f"{branch}: quantity loss did not shrink: "
            f"{early:.3f} -> {late:.3f}"
        )
