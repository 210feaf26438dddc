"""Optimizer wiring (reference ``avssl/model/kwClip.py:627-674`` +
``avssl/optim/scheduler.py``)."""
from .optimizer import build_optimizer, trainable_mask  # noqa: F401
