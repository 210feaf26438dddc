import numpy as np

from speechclip_plus_tpu.ops import get_schedule


def test_linear_warmup_decay_reference_shape():
    base_lr, warmup, max_step, final_lr = 1e-4, 5000, 50000, 1e-8
    sched = get_schedule(
        "linear_warmup_decay", base_lr, warmup=warmup, max_step=max_step, final_lr=final_lr
    )
    # reference LambdaLR multiplier semantics (scheduler.py:22-38)
    np.testing.assert_allclose(float(sched(0)), base_lr * 1 / warmup, rtol=1e-6)
    np.testing.assert_allclose(float(sched(warmup - 1)), base_lr, rtol=1e-6)
    np.testing.assert_allclose(float(sched(max_step - 1)), final_lr, rtol=1e-3)
    # halfway through decay
    mid = warmup + (max_step - warmup) // 2
    expected = base_lr * (1.0 - (1.0 - final_lr / base_lr) * (mid + 1 - warmup) / (max_step - warmup))
    np.testing.assert_allclose(float(sched(mid)), expected, rtol=1e-5)


def test_noam():
    sched = get_schedule("noam", 1e-3, warmup=4000)
    np.testing.assert_allclose(float(sched(3999)), 1e-3, rtol=1e-6)
    np.testing.assert_allclose(float(sched(15999)), 1e-3 * 0.5, rtol=1e-6)


def test_linear_decay_floors_at_final_lr_past_max_step():
    """Past max_step the reference's LambdaLR extrapolates NEGATIVE
    (`avssl/optim/scheduler.py:33-36`) — harmless when training stops at
    max_step, divergence when a resumed run extends trainer.max_steps
    (observed on hardware, round 5). Intent over quirk: floor at final_lr.
    """
    import jax.numpy as jnp

    from speechclip_plus_tpu.ops.schedulers import (
        linear_warmup_decay_schedule,
    )

    sch = linear_warmup_decay_schedule(1e-4, warmup=25, max_step=250,
                                       final_lr=1e-8)
    assert float(sch(249)) >= 1e-8
    for step in (250, 260, 1000):
        lr = float(sch(step))
        assert abs(lr - 1e-8) <= 1e-11, (step, lr)
