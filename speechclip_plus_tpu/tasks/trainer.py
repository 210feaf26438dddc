"""Training/validation driver.

The TPU-native counterpart of the reference's PL Trainer usage
(`avssl/task/base_task.py:137-215` + the Lightning hooks in
`avssl/model/kwClip.py:145-482`): step-based fit loop with grad
accumulation, per-epoch validation with cross-modal retrieval
(image dedup by id, score matmul, recall@{1,5,10} both directions,
`kwClip.py:447-482`), metric-monitored orbax checkpoints (top-1 val_loss +
save_last, top-3 val_recall_mean_10, `base_task.py:174-195`), keyword
detokenization JSON + PCA artifacts every N epochs (`kwClip.py:295-445`),
and full-state resume.
"""
from __future__ import annotations

import json
import logging
import os
import time
from typing import Dict, Iterable, Optional

import jax
import numpy as np

from ..checkpoint import CheckpointManager
from ..models import KWClip
from ..ops.retrieval import mutual_retrieval
from ..parallel import create_train_state, make_eval_step, make_train_step
from ..parallel.mesh import make_mesh, shard_batch
from ..utils.keyword_extraction import KeywordDecoder, extract_keyword_neighbors
from ..utils.log import MetricsLogger
from ..utils.visualization import draw_embedding_space_pca

logger = logging.getLogger(__name__)

__all__ = ["Trainer"]


def _scalar(x) -> float:
    return float(np.asarray(x))


class Trainer:
    def __init__(
        self,
        model: KWClip,
        variables: Dict,
        cfg_node,
        save_path: str,
        *,
        devices: int = -1,
        seed: int = 7122,
        metrics_logger: Optional[MetricsLogger] = None,
        tokenizer_decoder: Optional[KeywordDecoder] = None,
        text_processor=None,  # data.tokenizer.ClipTextProcessor for gold text
    ):
        self.model = model
        self.cfg = cfg_node
        self.model_cfg = model.cfg
        self.save_path = save_path
        self.seed = seed
        os.makedirs(save_path, exist_ok=True)

        devs = jax.devices()
        if devices and devices > 0:
            devs = devs[:devices]
        # trainer.tensor_parallel: N > 1 builds a 2-D ("data","model") mesh
        # and shards the towers Megatron-style (parallel/tp.py) — capability
        # beyond the reference's DP-only scaling; default 1 = pure DP
        tp = max(int(getattr(cfg_node.trainer, "tensor_parallel", 1) or 1), 1)
        self._state_sharding = None
        if tp > 1:
            if len(devs) % tp:
                raise ValueError(
                    f"trainer.tensor_parallel={tp} must divide the "
                    f"device count {len(devs)}"
                )
            from ..parallel import make_mesh_2d

            self.mesh = make_mesh_2d(tp, devs)
        else:
            self.mesh = make_mesh(devs) if len(devs) > 1 else None

        from ..optim.optimizer import build_optimizer_from_config

        self.tx = build_optimizer_from_config(
            variables["params"], self.model_cfg, cfg_node
        )
        self.accum = max(
            int(getattr(cfg_node.trainer, "accumulate_grad_batches", 1) or 1), 1
        )
        self.state = create_train_state(model, variables, self.tx)
        if tp > 1:
            from ..parallel import train_state_shardings

            self._state_sharding = train_state_shardings(self.state, self.mesh)
            self.state = jax.device_put(self.state, self._state_sharding)
        self.train_step = make_train_step(
            model, self.tx, mesh=self.mesh, accumulate_grad_batches=self.accum,
            state_sharding=self._state_sharding,
        )
        self.eval_step = make_eval_step(
            model, mesh=self.mesh, state_sharding=self._state_sharding
        )

        trainer_cfg = cfg_node.trainer
        # max_steps counts *optimizer* steps (Lightning semantics): with
        # accumulate_grad_batches=k the fit loop runs k micro-steps per
        # optimizer step (reference large recipe: 50k optimizer steps at
        # batch 128 x accum 2)
        self.max_steps = int(getattr(trainer_cfg, "max_steps", 50000))
        self.log_every = int(getattr(trainer_cfg, "log_every_n_steps", 8))
        self.val_every_epoch = int(getattr(trainer_cfg, "check_val_every_n_epoch", 1))
        log_setting = getattr(cfg_node, "log_setting", None)
        self.log_detok = bool(getattr(log_setting, "log_detokenize_results", False))
        self.detok_every = int(
            getattr(log_setting, "log_detokenize_results_every_n_epoch", 10) or 10
        )
        self.pca_every = int(
            getattr(log_setting, "log_draw_pca_every_n_epoch", 0) or 0
        )
        self.recall_at = tuple(getattr(cfg_node.retrieval, "recall_at", [1, 5, 10]))
        self.metrics_logger = metrics_logger or MetricsLogger(save_path)
        self.tokenizer_decoder = tokenizer_decoder
        self.text_processor = text_processor

        self.ckpt = CheckpointManager(
            os.path.join(save_path, "checkpoints"),
            config=cfg_node.to_dict() if hasattr(cfg_node, "to_dict") else None,
        )
        self.epoch = 0
        # preemption support (beyond the reference: Lightning 1.5 has no
        # SIGTERM grace handling; TPU fleets preempt with a SIGTERM notice):
        # fit() installs handlers that set this flag, and the loop
        # checkpoints + returns at the next optimizer-step boundary
        self._preempt_signum: Optional[int] = None
        self._skip_batches = 0

    # ------------------------------------------------------------- fit ----

    def _device_batch(self, batch: Dict) -> Dict:
        import jax.numpy as jnp
        import numpy as np

        arr = {k: np.asarray(v) for k, v in batch.items()}
        if self.mesh is not None:
            # the leading axis shards over the mesh's data axis: pad short
            # batches (e.g. a small dev set) up to a multiple, zero rows
            # masked out of losses/metrics via `valid` (collate convention)
            dp = int(self.mesh.shape["data"])
            n = next(iter(arr.values())).shape[0]
            pad = (-n) % dp
            if pad:
                if "valid" not in arr:
                    arr["valid"] = np.ones((n,), bool)
                arr = {
                    k: np.concatenate(
                        [v, np.zeros((pad,) + v.shape[1:], v.dtype)], axis=0
                    )
                    for k, v in arr.items()
                }
                arr["valid"][n:] = False
        arr = {k: jnp.asarray(v) for k, v in arr.items()}
        if self.mesh is not None:
            arr = shard_batch(arr, self.mesh)
        return arr

    @property
    def _fit_state_path(self) -> str:
        return os.path.join(self.save_path, "checkpoints", "fit_state.json")

    def _save_fit_state(self, batches_done: int = 0) -> None:
        """Persist the loop state the TrainState doesn't carry (epoch, and —
        for a mid-epoch preemption save — the number of batches already
        consumed this epoch), so resume continues the shuffle order,
        validation cadence and artifact numbering instead of replaying
        epoch 0 (reference: Lightning restores the full loop state,
        `base_task.py:206,211`)."""
        with open(self._fit_state_path, "w") as f:
            json.dump({"epoch": self.epoch, "opt_step": self.opt_step,
                       "batches_done": batches_done}, f)

    def resume(self, ckpt_dir: str) -> None:
        """Restore full fit state (params, opt state, step, epoch) from an
        orbax dir (reference `--resume`, `base_task.py:60-61,206,211`).

        Accepts the checkpoint MANAGER root (the dir holding
        fit_state.json + the last/val_loss/val_recall_mean_10 monitors) or,
        for convenience, a monitor subdir / step dir inside it — users
        naturally point --resume at `checkpoints/last`."""
        ckpt_dir = os.path.abspath(ckpt_dir)
        probe = ckpt_dir
        for _ in range(3):
            if os.path.exists(os.path.join(probe, "fit_state.json")):
                ckpt_dir = probe
                break
            probe = os.path.dirname(probe)
        mgr = CheckpointManager(ckpt_dir)
        self.state = mgr.restore(self.state)
        if self._state_sharding is not None:
            # re-lay the restored state out over the (data, model) mesh
            self.state = jax.device_put(self.state, self._state_sharding)
        fit_state = os.path.join(ckpt_dir, "fit_state.json")
        if os.path.exists(fit_state):
            with open(fit_state) as f:
                fs = json.load(f)
            self.epoch = int(fs["epoch"])
            # mid-epoch preemption save: re-enter the epoch's shuffle stream
            # past the batches already trained (exact-resume, no replay)
            self._skip_batches = int(fs.get("batches_done", 0))
        else:
            logger.warning(
                "%s has no fit_state.json; epoch restarts at 0 (shuffle "
                "order and artifact numbering will replay)", ckpt_dir,
            )
        logger.info(
            "Resumed from %s at step %d epoch %d",
            ckpt_dir, int(self.state.step), self.epoch,
        )

    @property
    def opt_step(self) -> int:
        """Optimizer steps completed (Lightning `global_step`):
        micro-steps // accumulate_grad_batches."""
        return int(self.state.step) // self.accum

    def _install_preempt_handlers(self):
        """SIGTERM/SIGINT set a flag; the fit loop checkpoints and returns at
        the next optimizer-step boundary. TPU fleets announce preemption with
        SIGTERM + a grace period; the reference's Lightning 1.5 just dies.
        Returns the previous handlers (restored by fit's finally)."""
        import signal

        def _on_signal(signum, frame):
            self._preempt_signum = signum

        prev = {}
        for sig in (signal.SIGTERM, signal.SIGINT):
            try:
                prev[sig] = signal.signal(sig, _on_signal)
            except ValueError:
                pass  # not the main thread (e.g. under a test runner)
        return prev

    def _preempt_save(self, batches_done: int) -> None:
        if self.ckpt.latest_step() != self.opt_step:
            self.ckpt.save(self.opt_step, self.state)
        self._save_fit_state(batches_done=batches_done)
        logger.warning(
            "preempted (signal %s): checkpointed at opt_step %d, epoch %d, "
            "%d batches into the epoch; --resume continues exactly here",
            self._preempt_signum, self.opt_step, self.epoch, batches_done,
        )

    def fit(
        self,
        train_loader: Iterable,
        val_loader: Optional[Iterable] = None,
    ) -> None:
        from ..parallel.train_step import training_key

        rng = training_key(
            self.seed,
            getattr(getattr(self.cfg, "trainer", None), "rng_impl", None),
        )
        last_log_step = int(self.state.step)
        last_log_time = time.time()
        # after resume, continue the per-epoch shuffle stream where it left
        # off (the loader seeds each epoch's order on seed+epoch)
        if hasattr(train_loader, "set_epoch"):
            train_loader.set_epoch(self.epoch)
        import signal

        prev_handlers = self._install_preempt_handlers()
        try:
            while self.opt_step < self.max_steps:
                epoch_complete = True
                skip = self._skip_batches
                self._skip_batches = 0
                for i, batch in enumerate(train_loader):
                    if i < skip:
                        continue
                    if (self._preempt_signum is not None
                            and int(self.state.step) % self.accum == 0):
                        # optimizer-step boundary: the grad accumulator is
                        # empty, so the saved state is exact and resume can
                        # re-enter the shuffle stream at batch i
                        self._preempt_save(batches_done=i)
                        return
                    if self.opt_step >= self.max_steps:
                        # stopped mid-epoch: don't advance the epoch counter —
                        # a resume that extends max_steps replays this epoch
                        # from its start (same shuffle stream) instead of
                        # silently skipping its remaining batches
                        epoch_complete = False
                        break
                    micro_step = int(self.state.step)
                    self.state, metrics = self.train_step(
                        self.state, self._device_batch(batch), rng
                    )
                    if micro_step % self.log_every == 0:
                        row = {k: _scalar(v) for k, v in metrics.items()
                               if np.asarray(v).ndim == 0}
                        now = time.time()
                        done = int(self.state.step) - last_log_step
                        row["steps_per_sec"] = (
                            done / max(now - last_log_time, 1e-9) if done else 0.0
                        )
                        row["micro_step"] = float(int(self.state.step))
                        last_log_step = int(self.state.step)
                        last_log_time = now
                        self.metrics_logger.log(row, self.opt_step)
                if not epoch_complete:
                    break
                self.epoch += 1
                if val_loader is not None and self.epoch % self.val_every_epoch == 0:
                    val_metrics = self.validate(val_loader)
                    self.ckpt.save(self.opt_step, self.state, val_metrics)
                    self._save_fit_state()
                    last_log_time = time.time()  # don't bill val time to steps/sec
                    last_log_step = int(self.state.step)
                if self._preempt_signum is not None:
                    # arrived during validation/checkpointing: the epoch-end
                    # save above already persisted a clean boundary
                    self._preempt_save(batches_done=0)
                    return
            if val_loader is not None:
                val_metrics = self.validate(val_loader)
                self.ckpt.save(self.opt_step, self.state, val_metrics)
                self._save_fit_state()
        finally:
            for sig, handler in prev_handlers.items():
                signal.signal(sig, handler)

    # ------------------------------------------------------- validation ----

    def validate(self, val_loader: Iterable) -> Dict[str, float]:
        all_out = []
        agg: Dict[str, list] = {}
        for batch in val_loader:
            metrics, out = self.eval_step(self.state, self._device_batch(batch))
            out = {k: np.asarray(v) for k, v in out.items()}
            valid = out.get("valid")
            # scalar metrics are per-batch means over *valid* rows; weight
            # the cross-batch aggregate by valid count so a final padded
            # batch (e.g. 3 valid rows of 128) doesn't count like a full one
            # (reference computes losses on the full gathered val set,
            # kwClip.py:248-285)
            n_valid = (
                int(valid.sum()) if valid is not None
                else int(out["id"].shape[0])
            )
            if valid is not None:
                out = {
                    k: v[valid] if v.ndim >= 1 and v.shape[0] == valid.shape[0] else v
                    for k, v in out.items()
                }
            all_out.append(out)
            for k, v in metrics.items():
                if np.asarray(v).ndim == 0:
                    agg.setdefault(k, []).append((_scalar(v), n_valid))

        val_metrics = {
            k: float(sum(v * w for v, w in pairs)
                     / max(sum(w for _, w in pairs), 1))
            for k, pairs in agg.items()
        }

        # ---- retrieval (reference kwClip.py:447-482) ----
        ids = np.concatenate([o["id"] for o in all_out])
        audio_feats = np.concatenate([o["audio_feat"] for o in all_out])
        image_feats = np.concatenate([o["image_feat"] for o in all_out])
        # dedup images by id (5 captions per image)
        uniq_ids, first_idx = np.unique(ids, return_index=True)
        gallery = image_feats[first_idx]
        scores = audio_feats.astype(np.float32) @ gallery.astype(np.float32).T
        r_ai, r_ia, r_mean = mutual_retrieval(
            scores, scores.T, ids, uniq_ids, self.recall_at
        )
        for k, v in r_ai.items():
            val_metrics[f"val_recall_AI_{k}"] = v
        for k, v in r_ia.items():
            val_metrics[f"val_recall_IA_{k}"] = v
        for k, v in r_mean.items():
            val_metrics[f"val_recall_mean_{k}"] = v
        # the checkpoint monitor metric (reference kwClip.py:595-598). When
        # retrieval.recall_at excludes 10 we fall back to the largest
        # configured k — explicitly, with a warning, not silently.
        if "recall@10" in r_mean:
            val_metrics["val_recall_mean_10"] = r_mean["recall@10"]
        else:
            k = f"recall@{max(self.recall_at)}"
            logger.warning(
                "retrieval.recall_at=%s has no 10; using %s as the "
                "val_recall_mean_10 checkpoint monitor", self.recall_at, k,
            )
            val_metrics["val_recall_mean_10"] = r_mean[k]
        logger.info(
            "val: loss=%.4f recall@1/5/10 A->I %s I->A %s mean %s",
            val_metrics.get("val_loss", float("nan")), r_ai, r_ia, r_mean,
        )

        # ---- keyword artifacts (reference kwClip.py:295-445) ----
        has_keywords = any("keywords" in o for o in all_out)
        if has_keywords and self.log_detok and self.epoch % self.detok_every == 0:
            self._dump_keyword_artifacts(all_out)

        self.metrics_logger.log(val_metrics, self.opt_step)
        return val_metrics

    def _dump_keyword_artifacts(self, all_out) -> None:
        os.makedirs(os.path.join(self.save_path, "retokenizeText"), exist_ok=True)
        os.makedirs(os.path.join(self.save_path, "visualization"), exist_ok=True)
        kws = np.concatenate([o["keywords"] for o in all_out if "keywords" in o])
        lens = None
        if all("keywords_len" in o for o in all_out):
            lens = np.concatenate([o["keywords_len"] for o in all_out])
        token_emb = np.asarray(
            self.state.params["clip"]["text"]["token_embedding"]["embedding"]
        )
        if self.pca_every > 0 and self.epoch % self.pca_every == 0:
            draw_embedding_space_pca(
                kws, token_emb,
                os.path.join(self.save_path, "visualization",
                             f"pca_ep{self.epoch}.pdf"),
            )
        if self.tokenizer_decoder is not None:
            gold_texts = [""] * len(kws)
            if self.text_processor is not None and all(
                "text" in o for o in all_out
            ):
                # gold captions: decode the original-id token rows
                # (reference kwClip.py:379-387; text is in original-id space)
                texts = np.concatenate([o["text"] for o in all_out])
                gold_texts = [
                    self.text_processor.tokenizer.decode(row)
                    for row in texts
                ]
            neighbors = extract_keyword_neighbors(
                kws, token_emb,
                gold_texts=gold_texts,
                decoder=self.tokenizer_decoder,
                K=5,
                keyword_lengths=lens,
            )
            with open(
                os.path.join(self.save_path, "retokenizeText",
                             f"keywords_ep{self.epoch}.json"), "w",
            ) as f:
                json.dump(neighbors, f, indent=4)
