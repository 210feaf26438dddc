"""Full-fidelity resume: epoch (shuffle stream, artifact numbering) and
weighted validation-loss aggregation.

Reference: Lightning `--resume` restores the complete loop state
(`avssl/task/base_task.py:206,211`) — after resume, training continues the
epoch counter, so the per-epoch shuffle order and `keywords_ep*.json`
numbering advance instead of replaying epoch 0. Validation losses are
computed on the full gathered set (`avssl/model/kwClip.py:248-285`), i.e.
every valid row counts once — our per-batch aggregation weights by valid
rows.
"""
import json
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from speechclip_plus_tpu.config import ConfigNode
from speechclip_plus_tpu.data.collate import BucketedLoader
from speechclip_plus_tpu.models import KWClip
from speechclip_plus_tpu.tasks.trainer import Trainer

from test_kwclip_model import make_batch, tiny_cfg

pytestmark = pytest.mark.slow


class _Sized:
    def __init__(self, n):
        self.n = n

    def __len__(self):
        return self.n


def test_bucketed_loader_set_epoch_positions_shuffle_stream():
    loader = BucketedLoader(_Sized(32), batch_size=8, shuffle=True, seed=3)
    ep0 = [b.tolist() for b in loader._epoch_batches()]
    loader.set_epoch(2)
    ep2 = [b.tolist() for b in loader._epoch_batches()]
    assert ep0 != ep2
    # deterministic: repositioning reproduces the same epoch-2 order
    loader.set_epoch(2)
    assert [b.tolist() for b in loader._epoch_batches()] == ep2


class _FakeLoader:
    """Epoch-seeded loader stub that records set_epoch calls."""

    def __init__(self, batches):
        self.batches = batches
        self.epoch = 0
        self.set_epoch_calls = []

    def set_epoch(self, epoch):
        self.epoch = int(epoch)
        self.set_epoch_calls.append(int(epoch))

    def __iter__(self):
        self.epoch += 1
        return iter(self.batches)

    def __len__(self):
        return len(self.batches)


def _trainer(tmp_path, max_steps, variables=None, subdir="run"):
    cfg = tiny_cfg("HybridBranch_plus")
    model = KWClip(cfg)
    rng = np.random.RandomState(0)
    batch = {k: np.asarray(v) for k, v in make_batch(rng).items()}
    if variables is None:
        variables = model.init(
            {"params": jax.random.PRNGKey(0)},
            {k: jnp.asarray(v) for k, v in batch.items()},
            training=False,
        )
    node = ConfigNode({
        "trainer": {"max_steps": max_steps, "accumulate_grad_batches": 1,
                    "gradient_clip_val": 4, "log_every_n_steps": 1},
        "retrieval": {"audio_feat_src": "parallel", "recall_at": [1, 5, 10]},
        "audio_encoder": {
            "optim": {"name": "Adam", "args": {"lr": 1e-3, "weight_decay": 0}},
            "scheduler": {"name": "linear_warmup_decay", "warmup": 2,
                          "max_step": 8, "final_lr": 1e-8},
        },
    })
    t = Trainer(model, variables, node, str(tmp_path / subdir), devices=1)
    return t, batch, variables


def test_resume_restores_epoch_and_continues_shuffle_stream(tmp_path):
    # 2 batches per epoch, max_steps=4 -> exactly 2 epochs, ckpt at each
    t1, batch, variables = _trainer(tmp_path, max_steps=4)
    loader = _FakeLoader([batch, batch])
    t1.fit(loader, val_loader=[batch])
    assert t1.epoch == 2
    fit_state = os.path.join(t1.save_path, "checkpoints", "fit_state.json")
    with open(fit_state) as f:
        assert json.load(f) == {"epoch": 2, "opt_step": 4, "batches_done": 0}

    # fresh trainer resumes: epoch and step restored, loader repositioned
    t2, _, _ = _trainer(tmp_path, max_steps=6, variables=variables,
                        subdir="run2")
    t2.resume(os.path.join(t1.save_path, "checkpoints"))
    assert t2.epoch == 2
    assert int(t2.state.step) == 4
    loader2 = _FakeLoader([batch, batch])
    t2.fit(loader2, val_loader=[batch])
    # the resumed fit positioned the shuffle stream at epoch 2, not 0
    assert loader2.set_epoch_calls == [2]
    assert t2.epoch == 3  # artifact numbering (keywords_ep*.json) continues

    # params actually advanced through the resumed steps
    assert int(t2.state.step) == 6


def test_resume_without_fit_state_warns_and_defaults_to_zero(tmp_path, caplog):
    t1, batch, variables = _trainer(tmp_path, max_steps=2)
    t1.fit(_FakeLoader([batch, batch]), val_loader=[batch])
    os.remove(os.path.join(t1.save_path, "checkpoints", "fit_state.json"))
    t2, _, _ = _trainer(tmp_path, max_steps=2, variables=variables,
                        subdir="run2")
    with caplog.at_level("WARNING"):
        t2.resume(os.path.join(t1.save_path, "checkpoints"))
    assert t2.epoch == 0
    assert any("fit_state" in r.message for r in caplog.records)


def test_mid_epoch_stop_does_not_inflate_epoch(tmp_path):
    """max_steps landing mid-epoch must not advance the epoch counter:
    a resume that extends max_steps replays the interrupted epoch from its
    start (same shuffle stream) instead of skipping its remaining batches."""
    t, batch, _ = _trainer(tmp_path, max_steps=3)
    loader = _FakeLoader([batch, batch])  # 2 batches/epoch -> stop at 3
    t.fit(loader, val_loader=[batch])
    assert int(t.state.step) == 3
    assert t.epoch == 1  # epoch 0 completed; epoch 1 was interrupted
    with open(os.path.join(t.save_path, "checkpoints", "fit_state.json")) as f:
        assert json.load(f)["epoch"] == 1
    # resume with a larger budget: the interrupted epoch replays
    t2, _, _ = _trainer(tmp_path, max_steps=4, subdir="run2")
    t2.resume(os.path.join(t.save_path, "checkpoints"))
    loader2 = _FakeLoader([batch, batch])
    t2.fit(loader2, val_loader=[batch])
    assert loader2.set_epoch_calls == [1]
    assert int(t2.state.step) == 4


def test_preemption_sigterm_checkpoints_and_resumes_exactly(tmp_path):
    """SIGTERM mid-epoch (the TPU-fleet preemption notice): fit checkpoints
    at the next optimizer-step boundary, records the batch position, exits
    cleanly, and a resumed fit re-enters the epoch's batch stream exactly
    after the trained batches — no batch trained twice, none skipped.
    (Beyond the reference: Lightning 1.5 has no SIGTERM grace handling.)"""
    import signal

    t1, batch, variables = _trainer(tmp_path, max_steps=8)

    class _SignalingLoader(_FakeLoader):
        def __iter__(self):
            self.epoch += 1

            def gen():
                for i, b in enumerate(self.batches):
                    if i == 2:  # preemption notice arrives after 2 batches
                        os.kill(os.getpid(), signal.SIGTERM)
                    yield b

            return gen()

    loader = _SignalingLoader([batch] * 4)  # 4 batches/epoch
    handler_before = signal.getsignal(signal.SIGTERM)
    t1.fit(loader, val_loader=[batch])  # returns instead of dying
    assert int(t1.state.step) == 2  # batches 0,1 trained, then the save
    assert t1.ckpt.latest_step() == 2
    with open(os.path.join(t1.save_path, "checkpoints",
                           "fit_state.json")) as f:
        assert json.load(f) == {"epoch": 0, "opt_step": 2, "batches_done": 2}
    # handlers restored after fit
    assert signal.getsignal(signal.SIGTERM) is handler_before

    # resume: skips the 2 trained batches, finishes the epoch's other 2
    t2, _, _ = _trainer(tmp_path, max_steps=4, variables=variables,
                        subdir="run2")
    t2.resume(os.path.join(t1.save_path, "checkpoints"))
    assert int(t2.state.step) == 2
    loader2 = _FakeLoader([batch] * 4)
    t2.fit(loader2, val_loader=[batch])
    assert loader2.set_epoch_calls == [0]  # re-enters the SAME epoch
    assert int(t2.state.step) == 4  # trained exactly batches 2,3 ...
    assert t2.epoch == 1  # ... which COMPLETED epoch 0 (skip worked:
    # retraining 0,1 would hit max_steps mid-epoch and leave epoch == 0)


def test_validation_loss_weighted_by_valid_rows(tmp_path):
    """A padded final batch (1 valid row) must contribute per-row, not
    per-batch, to the aggregated val_loss."""
    t, batch, _ = _trainer(tmp_path, max_steps=1)
    b_full = dict(batch)
    B = int(batch["id"].shape[0])
    b_padded = dict(batch, valid=np.zeros(B, bool))
    b_padded["valid"][0] = True

    m_full = t.validate([b_full])
    m_pad = t.validate([b_padded])
    m_mix = t.validate([b_full, b_padded])

    expected = (m_full["val_loss"] * B + m_pad["val_loss"] * 1) / (B + 1)
    assert m_mix["val_loss"] == pytest.approx(expected, rel=1e-5)
    # an unweighted mean would differ whenever the padded batch's loss does
    unweighted = (m_full["val_loss"] + m_pad["val_loss"]) / 2
    assert abs(unweighted - expected) > 1e-7 or (
        m_full["val_loss"] == pytest.approx(m_pad["val_loss"])
    )


def test_ckpt_restore_structure_with_grad_accumulation(tmp_path):
    """api.load_from_checkpoint-style restore of a checkpoint trained with
    accumulate_grad_batches > 1: the rebuilt optimizer tree must match the
    on-disk one (MultiSteps state lives INSIDE multi_transform's 'train'
    slot) or orbax raises a structure mismatch. Regression: the api used to
    rebuild with default kwargs (accum=1) and could not restore such runs."""
    from speechclip_plus_tpu.checkpoint import CheckpointManager
    from speechclip_plus_tpu.optim import build_optimizer
    from speechclip_plus_tpu.parallel import create_train_state

    cfg = tiny_cfg("HybridBranch_plus")
    model = KWClip(cfg)
    rng = np.random.RandomState(0)
    batch = make_batch(rng)
    variables = model.init(
        {"params": jax.random.PRNGKey(0)},
        {k: jnp.asarray(v) for k, v in batch.items()},
        training=False,
    )
    tx = build_optimizer(variables["params"], cfg, accumulate_grad_batches=2)
    state = create_train_state(model, variables, tx)
    mgr = CheckpointManager(str(tmp_path / "ckpts"))
    mgr.save(0, state)
    mgr.wait()

    # restore into the SAME structure (what build_optimizer_from_config
    # reproduces from the embedded config) — must succeed
    tx2 = build_optimizer(variables["params"], cfg, accumulate_grad_batches=2)
    target = create_train_state(model, variables, tx2)
    restored = CheckpointManager(str(tmp_path / "ckpts")).restore(target)
    assert int(restored.step) == 0

    # restoring into the accum=1 structure is a structural mismatch — the
    # exact failure api.load_from_checkpoint hit before reading the config
    tx1 = build_optimizer(variables["params"], cfg, accumulate_grad_batches=1)
    bad = create_train_state(model, variables, tx1)
    with pytest.raises(ValueError):
        CheckpointManager(str(tmp_path / "ckpts")).restore(bad)
