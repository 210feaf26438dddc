"""Tensor-parallelism tests on the 8-device virtual CPU mesh.

The reference has no TP (Lightning DP only, SURVEY §2.16); this is the
TPU-native capability beyond it: Megatron-style column/row sharding applied
purely as annotations (`parallel/tp.py`), collectives inserted by XLA's SPMD
partitioner. Parity tests pin that the sharded step computes the *same*
loss/update as the single-device step.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P
from jax.tree_util import DictKey

from speechclip_plus_tpu.models import KWClip
from speechclip_plus_tpu.optim import build_optimizer
from speechclip_plus_tpu.parallel import (
    create_train_state,
    make_mesh_2d,
    make_train_step,
    shard_train_state,
    train_state_shardings,
)
from speechclip_plus_tpu.parallel.mesh import shard_batch
from speechclip_plus_tpu.parallel.tp import MODEL_AXIS, param_partition_spec

from test_kwclip_model import tiny_cfg
from test_parallel_dp import big_batch


def _path(*names):
    return tuple(DictKey(n) for n in names)


def _make_grad_fn(model, mesh=None, state_sharding=None):
    """Raw loss gradients with the exact rng/stop_gradient construction of
    `make_train_step` (same dropout masks, frozen towers cut), so sharded
    and single-device gradients are directly comparable."""
    from speechclip_plus_tpu.parallel.mesh import (batch_sharding,
                                                   replicated_sharding)
    from speechclip_plus_tpu.parallel.train_step import _forward_and_loss

    cfg = model.cfg
    frozen_roots = []
    if not cfg.audio_trainable:
        frozen_roots.append("audio_encoder")
    if not (cfg.image_encoder_trainable or cfg.text_encoder_trainable):
        frozen_roots.append("clip")

    def grad_fn(state, batch, rng):
        rngs = {"dropout": jax.random.fold_in(rng, state.step)}
        rngs["vq"] = jax.random.fold_in(rngs["dropout"], 1)
        rngs["layer_drop"] = jax.random.fold_in(rngs["dropout"], 2)

        def loss_fn(params):
            p = dict(params)
            for root in frozen_roots:
                p[root] = jax.lax.stop_gradient(params[root])
            losses, _, _, _ = _forward_and_loss(
                model, p, state.batch_stats, batch, state.step, rngs, True
            )
            return losses["loss"]

        return jax.grad(loss_fn)(state.params)

    if mesh is not None:
        repl = replicated_sharding(mesh)
        state_in = state_sharding if state_sharding is not None else repl
        return jax.jit(grad_fn,
                       in_shardings=(state_in, batch_sharding(mesh), repl))
    return jax.jit(grad_fn)


def test_param_partition_specs():
    tp = 2
    # hubert scanned layers: column-parallel qkv/fc1, row-parallel out/fc2
    assert param_partition_spec(
        _path("audio_encoder", "layers", "layer", "q_proj", "kernel"),
        (12, 768, 768), tp) == P(None, None, MODEL_AXIS)
    assert param_partition_spec(
        _path("audio_encoder", "layers", "layer", "fc1", "bias"),
        (12, 3072), tp) == P(None, MODEL_AXIS)
    assert param_partition_spec(
        _path("audio_encoder", "layers", "layer", "out_proj", "kernel"),
        (12, 768, 768), tp) == P(None, MODEL_AXIS, None)
    assert param_partition_spec(
        _path("audio_encoder", "layers", "layer", "fc2", "kernel"),
        (12, 3072, 768), tp) == P(None, MODEL_AXIS, None)
    # row-parallel bias stays replicated
    assert param_partition_spec(
        _path("audio_encoder", "layers", "layer", "fc2", "bias"),
        (12, 768), tp) == P()
    # clip MLP sharded; packed-QKV attention replicated (incl. its out_proj)
    assert param_partition_spec(
        _path("clip", "text", "transformer", "blocks", "block", "c_fc",
              "kernel"), (12, 512, 2048), tp) == P(None, None, MODEL_AXIS)
    assert param_partition_spec(
        _path("clip", "text", "transformer", "blocks", "block", "attn",
              "in_proj", "kernel"), (12, 512, 1536), tp) == P()
    assert param_partition_spec(
        _path("clip", "text", "transformer", "blocks", "block", "attn",
              "out_proj", "kernel"), (12, 512, 512), tp) == P()
    assert param_partition_spec(
        _path("cascaded_branch", "self_att", "multihead_attn_layer",
              "out_proj", "kernel"), (768, 768), tp) == P()
    # vocab-sharded token embedding
    assert param_partition_spec(
        _path("clip", "text", "token_embedding", "embedding"),
        (8112, 512), tp) == P(MODEL_AXIS, None)
    # indivisible dims fall back to replicated
    assert param_partition_spec(
        _path("audio_encoder", "layers", "layer", "q_proj", "kernel"),
        (12, 768, 769), tp) == P()
    # norms / scalars replicated
    assert param_partition_spec(
        _path("audio_encoder", "layers", "layer", "self_attn_layer_norm",
              "scale"), (12, 768), tp) == P()


def test_opt_state_mirrors_param_shardings():
    """`train_state_shardings` suffix-matches optax's nested params-shaped
    trees (Adam mu/nu) so a *trainable* sharded tower keeps its optimizer
    state sharded the same way. (In the shipped configs the sharded towers
    are frozen and masked out of the Adam state — this pins the fine-tuning
    path.)"""
    import optax

    from speechclip_plus_tpu.parallel import TrainState

    params = {
        "audio_encoder": {
            "layers": {"layer": {
                "q_proj": {"kernel": jnp.zeros((2, 32, 32))},
                "fc2": {"kernel": jnp.zeros((2, 64, 32)),
                        "bias": jnp.zeros((2, 32))},
            }},
        },
        "proj": {"kernel": jnp.zeros((32, 16))},
    }
    tx = optax.adam(1e-3)
    state = TrainState(
        step=jnp.zeros((), jnp.int32), params=params,
        batch_stats={}, opt_state=tx.init(params),
    )
    mesh = make_mesh_2d(2, jax.devices()[:8])
    sh = train_state_shardings(state, mesh)
    q_spec = sh.params["audio_encoder"]["layers"]["layer"]["q_proj"][
        "kernel"].spec
    assert q_spec == P(None, None, MODEL_AXIS)
    flat = jax.tree_util.tree_flatten_with_path(sh.opt_state)[0]
    mirrored = [s for path, s in flat if "q_proj" in str(path)]
    assert mirrored and all(s.spec == q_spec for s in mirrored)
    # scalar counters replicated
    counts = [s for path, s in flat if "count" in str(path)]
    assert counts and all(s.spec == P() for s in counts)


# slow tier below: full-model sharded-vs-single parity


@pytest.mark.slow
@pytest.mark.parametrize("dp,tp", [(4, 2), (2, 4)])
@pytest.mark.parametrize("branch_type,pw,cw", [
    ("", 1.0, 0.0),                   # continuous path: exact TP parity
    ("HybridBranch_plus", 1.0, 1.0),  # hard-VQ path: loss-level parity
])
def test_tp_step_matches_single_device(dp, tp, branch_type, pw, cw):
    assert jax.device_count() >= 8, "conftest must provide 8 virtual devices"
    cfg = tiny_cfg(branch_type, parallel_w=pw, cascaded_w=cw)
    model = KWClip(cfg)
    rng = np.random.RandomState(0)
    batch = big_batch(rng)
    variables = model.init(
        {"params": jax.random.PRNGKey(0)}, batch, training=False
    )
    tx = build_optimizer(
        variables["params"], cfg, lr=1e-3,
        scheduler_args={"warmup": 10, "max_step": 100, "final_lr": 1e-8},
    )

    # single-device reference
    state0 = create_train_state(model, variables, tx)
    step_single = make_train_step(model, tx, mesh=None, donate=False)
    key = jax.random.PRNGKey(42)
    state1_ref, metrics_ref = step_single(state0, batch, key)

    # dp x tp sharded
    mesh = make_mesh_2d(tp, jax.devices()[: dp * tp])
    state0b = create_train_state(model, variables, tx)
    shardings = train_state_shardings(state0b, mesh)
    state0b = jax.device_put(state0b, shardings)
    step_tp = make_train_step(
        model, tx, mesh=mesh, donate=False, state_sharding=shardings
    )
    sbatch = shard_batch(batch, mesh)
    state1_tp, metrics_tp = step_tp(state0b, sbatch, key)

    np.testing.assert_allclose(
        float(metrics_ref["train_loss"]), float(metrics_tp["train_loss"]),
        rtol=1e-4,
    )
    if branch_type == "":  # continuous path: gradients + updates match
        # Gradient parity is the primary probe — grads are what the TP
        # collectives must reproduce, and the tolerance meaningfully bounds
        # the error. (Post-Adam params are the wrong probe at step 1:
        # scale_by_adam normalizes any nonzero grad to +-1, so a
        # reduction-order sign flip on a near-zero gradient moves a param by
        # the full 2*lr_1 = 2e-4 — flaky — while a genuinely wrong gradient
        # *scale*, e.g. a missing psum, is normalized away — blind.)
        g_ref = jax.device_get(_make_grad_fn(model)(state0, batch, key))
        g_tp = jax.device_get(
            _make_grad_fn(model, mesh=mesh, state_sharding=shardings)(
                state0b, sbatch, key))
        jax.tree.map(
            lambda a, b: np.testing.assert_allclose(
                np.asarray(a, np.float32), np.asarray(b, np.float32),
                rtol=1e-3, atol=1e-6),
            g_ref, g_tp,
        )
        # Updated params still guard the optimizer path under shardings
        # (masking, clipping, Adam state layout); tolerance 5e-4 sits above
        # the 2*lr_1 = 2e-4 sign-flip bound derived above and far below any
        # real collective breakage (O(param scale)).
        d = jax.tree.map(
            lambda a, b: float(jnp.max(jnp.abs(
                a.astype(jnp.float32) - np.asarray(b, np.float32)))),
            state1_ref.params, jax.device_get(state1_tp.params),
        )
        assert max(jax.tree.leaves(d)) < 5e-4


@pytest.mark.slow
def test_trainer_tensor_parallel_knob(tmp_path):
    """`trainer.tensor_parallel: 2` drives the product Trainer onto a
    (data, model) mesh: fit runs, checkpoints, resumes, and the live state
    is physically sharded."""
    from speechclip_plus_tpu.config import ConfigNode
    from speechclip_plus_tpu.parallel.tp import MODEL_AXIS
    from speechclip_plus_tpu.tasks.trainer import Trainer

    from test_kwclip_model import make_batch
    from test_resume import _FakeLoader

    cfg = tiny_cfg("HybridBranch_plus")
    model = KWClip(cfg)
    rng = np.random.RandomState(0)
    batch = {k: np.asarray(v) for k, v in make_batch(rng).items()}
    variables = model.init(
        {"params": jax.random.PRNGKey(0)},
        {k: jnp.asarray(v) for k, v in batch.items()},
        training=False,
    )
    # host snapshot: the donating train step deletes the device buffers the
    # first Trainer's state shares with `variables`
    variables = jax.tree.map(np.array, variables)
    node = ConfigNode({
        "trainer": {"max_steps": 2, "accumulate_grad_batches": 1,
                    "gradient_clip_val": 4, "log_every_n_steps": 1,
                    "tensor_parallel": 2},
        "retrieval": {"audio_feat_src": "parallel", "recall_at": [1, 5, 10]},
        "audio_encoder": {
            "optim": {"name": "Adam", "args": {"lr": 1e-3, "weight_decay": 0}},
            "scheduler": {"name": "linear_warmup_decay", "warmup": 2,
                          "max_step": 8, "final_lr": 1e-8},
        },
    })
    t = Trainer(model, variables, node, str(tmp_path / "tp_run"), devices=8)
    assert t.mesh is not None and t.mesh.shape[MODEL_AXIS] == 2
    q = t.state.params["audio_encoder"]["layers"]["layer"]["q_proj"]["kernel"]
    assert q.sharding.spec[-1] == MODEL_AXIS
    t.fit(_FakeLoader([batch, batch]), val_loader=[batch])
    assert int(t.state.step) == 2

    # resume re-lays the restored state out over the TP mesh
    t2 = Trainer(model, variables, node, str(tmp_path / "tp_run2"), devices=8)
    t2.resume(str(tmp_path / "tp_run" / "checkpoints"))
    assert int(t2.state.step) == 2
    q2 = t2.state.params["audio_encoder"]["layers"]["layer"]["q_proj"]["kernel"]
    assert q2.sharding.spec[-1] == MODEL_AXIS


@pytest.mark.slow
def test_tp_actually_shards_the_big_kernels():
    """The annotations must materialize: q_proj lives split over the model
    axis, not replicated."""
    cfg = tiny_cfg("HybridBranch_plus")
    model = KWClip(cfg)
    rng = np.random.RandomState(0)
    batch = big_batch(rng)
    variables = model.init(
        {"params": jax.random.PRNGKey(0)}, batch, training=False
    )
    tx = build_optimizer(
        variables["params"], cfg, lr=1e-3,
        scheduler_args={"warmup": 10, "max_step": 100, "final_lr": 1e-8},
    )
    mesh = make_mesh_2d(2, jax.devices()[:8])
    state = shard_train_state(create_train_state(model, variables, tx), mesh)
    q = state.params["audio_encoder"]["layers"]["layer"]["q_proj"]["kernel"]
    spec = q.sharding.spec
    assert spec[-1] == MODEL_AXIS, spec
    # each shard holds half the columns
    shard_shapes = {s.data.shape for s in q.addressable_shards}
    assert shard_shapes == {(q.shape[0], q.shape[1], q.shape[2] // 2)}
    emb = state.params["clip"]["text"]["token_embedding"]["embedding"]
    assert emb.sharding.spec[0] == MODEL_AXIS
