"""Orbax checkpointing with metric-monitored retention.

Reference checkpointing (`avssl/task/base_task.py:174-195`): two Lightning
ModelCheckpoint callbacks — top-1 on `val_loss` (+ save_last) and top-3 on
`val_recall_mean_10` — filenames embedding the metric values; the model
config rides inside the checkpoint so `load_from_checkpoint` needs no args
(`base_model.py:10-27`). Full fit resume restores optimizer/scheduler/step
(`base_task.py:206,211`).

Here: two orbax CheckpointManagers (one per monitored metric) with
best-k retention plus a `last` manager; the TrainState (params, batch_stats,
opt_state, step) and the config dict are saved together, so `restore`
rebuilds the model without external args.
"""
from __future__ import annotations

import json
import os
from typing import Any, Dict, Optional

import jax
import numpy as np
import orbax.checkpoint as ocp

__all__ = ["CheckpointManager"]


class CheckpointManager:
    """Save/restore TrainState + config with best-k metric retention."""

    def __init__(
        self,
        root: str,
        config: Optional[dict] = None,
        monitors: Dict[str, str] = None,
        top_k: Dict[str, int] = None,
    ):
        """monitors: {"val_loss": "min", "val_recall_mean_10": "max"}
        (the reference's two callbacks); top_k per monitor (1 and 3)."""
        self.root = os.path.abspath(root)
        os.makedirs(self.root, exist_ok=True)
        self.config = config
        self.monitors = monitors or {"val_loss": "min", "val_recall_mean_10": "max"}
        self.top_k = top_k or {"val_loss": 1, "val_recall_mean_10": 3}
        self._managers: Dict[str, ocp.CheckpointManager] = {}
        for name, mode in self.monitors.items():
            self._managers[name] = ocp.CheckpointManager(
                os.path.join(self.root, name.replace("/", "_")),
                options=ocp.CheckpointManagerOptions(
                    max_to_keep=self.top_k.get(name, 1),
                    best_fn=(lambda m, _k=name: m[_k]),
                    best_mode=mode,
                ),
            )
        self._last = ocp.CheckpointManager(
            os.path.join(self.root, "last"),
            options=ocp.CheckpointManagerOptions(max_to_keep=1),
        )
        if config is not None:
            with open(os.path.join(self.root, "config.json"), "w") as f:
                json.dump(config, f, indent=2, default=str)

    @staticmethod
    def _state_args(state) -> ocp.args.Composite:
        return ocp.args.Composite(
            state=ocp.args.StandardSave(state),
        )

    def save(self, step: int, state, metrics: Optional[Dict[str, float]] = None) -> None:
        metrics = {
            k: float(v) for k, v in (metrics or {}).items()
            if isinstance(v, (int, float, np.floating, np.integer))
            or (hasattr(v, "shape") and getattr(v, "shape", None) == ())
        }
        self._last.save(step, args=self._state_args(state))
        for name, mgr in self._managers.items():
            if name in metrics:
                mgr.save(step, args=self._state_args(state), metrics=metrics)
        self.wait()

    def wait(self) -> None:
        self._last.wait_until_finished()
        for mgr in self._managers.values():
            mgr.wait_until_finished()

    def best_step(self, monitor: str) -> Optional[int]:
        return self._managers[monitor].best_step()

    def latest_step(self) -> Optional[int]:
        return self._last.latest_step()

    def restore(self, abstract_state: Any, step: Optional[int] = None,
                monitor: Optional[str] = None):
        """Restore a TrainState. `monitor` picks the best step under that
        metric; default = latest."""
        if monitor is not None:
            mgr = self._managers[monitor]
            step = mgr.best_step() if step is None else step
        else:
            mgr = self._last
            step = mgr.latest_step() if step is None else step
        if step is None:
            raise FileNotFoundError(f"No checkpoint found under {self.root}")
        restored = mgr.restore(
            step,
            args=ocp.args.Composite(
                state=ocp.args.StandardRestore(abstract_state)
            ),
        )
        return restored["state"]

    @staticmethod
    def load_config(root: str) -> dict:
        with open(os.path.join(os.path.abspath(root), "config.json")) as f:
            return json.load(f)

    def close(self) -> None:
        self.wait()
        self._last.close()
        for mgr in self._managers.values():
            mgr.close()
