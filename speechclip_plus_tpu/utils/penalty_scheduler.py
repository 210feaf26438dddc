"""Piecewise-linear penalty-weight schedule.

Reference: ``avssl/util/penalty_scheduler.py:4-28`` — interpolate a weight
over global step between (keypoint, value) pairs; exported but unused by the
current KWClip path, kept for API compatibility.
"""
from __future__ import annotations

from typing import Sequence

import numpy as np

__all__ = ["PenaltyScheduler"]


class PenaltyScheduler:
    def __init__(self, weights: Sequence[float], keypoints: Sequence[int]):
        assert len(weights) == len(keypoints), (weights, keypoints)
        assert list(keypoints) == sorted(keypoints)
        self.weights = np.asarray(weights, np.float64)
        self.keypoints = np.asarray(keypoints, np.int64)
        self.value = float(self.weights[0])

    def update(self, global_step: int) -> None:
        self.value = float(
            np.interp(global_step, self.keypoints, self.weights)
        )

    def get_value(self) -> float:
        return self.value
