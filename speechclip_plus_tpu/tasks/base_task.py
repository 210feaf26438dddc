"""Task runner: arg parsing -> datasets -> trainer -> fit/validate.

Reference: ``avssl/task/base_task.py:17-215`` — seed everything, build the
model from a checkpoint or YAML config (+ CLI overrides, incl.
`--dataset_root`), construct split datasets + loaders, two metric-monitored
checkpoints, logger, then fit and/or validate.
"""
from __future__ import annotations

import argparse
import logging
import os
import random
from typing import Optional

import numpy as np

from ..config import ConfigNode, load_config
from ..data import BucketedLoader, CoCoDataset, FlickrDataset
from ..utils.log import set_logging, set_metrics_logger
from .args import add_general_arguments
from .builder import build_model_from_config
from .trainer import Trainer

logger = logging.getLogger(__name__)

__all__ = ["BaseTask", "TrainSpeechClipBaseTask"]


def seed_everything(seed: int) -> None:
    random.seed(seed)
    np.random.seed(seed)


class BaseTask:
    def __init__(self):
        self.args = None
        self.config = None

    def add_args(self, parser: argparse.ArgumentParser) -> argparse.ArgumentParser:
        return add_general_arguments(parser)

    def parse_args(self, parser: argparse.ArgumentParser) -> argparse.Namespace:
        self.args = parser.parse_args()
        return self.args

    def run(self):
        raise NotImplementedError


def _build_dataset(cfg: ConfigNode, split: str, tokenizer=None, image_size: int = 224):
    d = cfg.data.dataset
    common = dict(
        dataset_root=d.dataset_root,
        split=split,
        load_audio=bool(getattr(d, "load_audio", True)),
        load_image=bool(getattr(d, "load_image", True)),
        tokenize_text=bool(getattr(d, "tokenizeText", False)),
        normalize_waveform=bool(getattr(d, "normalize_waveform", False)),
        tokenizer=tokenizer,
        image_size=image_size,
    )
    if d.name == "flickr":
        return FlickrDataset(
            text_file=getattr(d, "text_file", "Flickr8k.token.txt"),
            wav_rm_silence=bool(getattr(d, "wav_rm_silence", False)),
            **common,
        )
    if d.name == "coco":
        return CoCoDataset(
            split_prefix=getattr(d, "split_prefix", "SpokenCOCO"), **common
        )
    raise NotImplementedError(d.name)


class TrainSpeechClipBaseTask(BaseTask):
    """Reference `TrainSpeechClipBaseTask.run` (`base_task.py:55-215`)."""

    def run(self):
        args = self.args
        set_logging(args.log_level)
        seed_everything(args.seed)
        from ..utils.compile_cache import enable_persistent_cache

        enable_persistent_cache()

        if args.ckpt and args.ckpt.endswith(".ckpt"):
            # Lightning checkpoint: config rides inside
            from ..checkpoint import load_lightning_checkpoint

            _, cfg, _ = load_lightning_checkpoint(args.ckpt)
            if args.config:
                cfg.deep_update(load_config(args.config))
        else:
            assert args.config, "--config required without a Lightning --ckpt"
            cfg = load_config(args.config)
        if args.dataset_root:
            cfg.data.dataset.dataset_root = args.dataset_root
        self.config = cfg

        tokenizer = None
        bpe_path = getattr(cfg.data.dataset, "bpe_path", None)
        if bpe_path and os.path.exists(bpe_path):
            from ..data.tokenizer import SimpleTokenizer

            tokenizer = SimpleTokenizer(bpe_path)

        model, variables, model_cfg, vocab = build_model_from_config(
            cfg, seed=args.seed
        )

        if args.ckpt and args.ckpt.endswith(".ckpt"):
            from ..checkpoint import lightning_to_kwclip, load_lightning_checkpoint

            sd, _, _ = load_lightning_checkpoint(args.ckpt)
            params, batch_stats = lightning_to_kwclip(sd, model_cfg)
            variables = {"params": params, "batch_stats": batch_stats}
            logger.info("Loaded Lightning checkpoint %s", args.ckpt)

        decoder = None
        text_processor = None
        if tokenizer is not None:
            from ..data.tokenizer import ClipTextProcessor
            from ..utils.keyword_extraction import KeywordDecoder

            decoder = KeywordDecoder(
                tokenizer.decoder,
                vocab.reduced2original if vocab is not None else None,
            )
            text_processor = ClipTextProcessor(tokenizer, vocab)
        elif vocab is not None:
            # no BPE vocabulary on disk (data.dataset.bpe_path: null — this
            # zero-egress environment cannot fetch
            # bpe_simple_vocab_16e6.txt.gz): still produce the keyword
            # neighbor artifacts with symbolic token names `tok_<original
            # CLIP id>` so the epoch dumps exist and the id-level content
            # is real; with the BPE file present the names become subword
            # strings (reference kwClip.py:404-445)
            from ..utils.keyword_extraction import KeywordDecoder

            r2o = vocab.reduced2original  # dict: reduced id -> original id
            decoder = KeywordDecoder(
                {int(i): f"tok_{int(i)}" for i in r2o.values()},
                r2o,
            )

        save_path = args.save_path
        metrics_logger = set_metrics_logger(
            save_path, getattr(cfg, "logger", None),
            config=cfg.to_dict(),
        )
        trainer = Trainer(
            model, variables, cfg, save_path,
            devices=args.devices, seed=args.seed,
            metrics_logger=metrics_logger, tokenizer_decoder=decoder,
            text_processor=text_processor,
        )
        if args.resume:
            trainer.resume(args.resume)

        batch_size = int(cfg.data.batch_size)
        dev_batch_size = int(getattr(cfg.data, "dev_batch_size", batch_size))
        max_audio_len = int(getattr(cfg.audio_encoder, "max_audio_len", -1))

        # frozen image tower -> its outputs are training-invariant, so the
        # cache (precompute once, drop the ViT + JPEG decode from every step)
        # defaults ON; set data.cache_image_embeddings: false to opt out
        cache_images = bool(
            getattr(cfg.data, "cache_image_embeddings", True)
        ) and not model_cfg.image_encoder_trainable

        def _maybe_cache(ds):
            if not cache_images:
                return ds
            from ..data.image_cache import (
                CachedImageDataset,
                precompute_image_embeddings,
            )

            feats = precompute_image_embeddings(
                trainer.model, {"params": trainer.state.params,
                                "batch_stats": trainer.state.batch_stats}, ds,
            )
            return CachedImageDataset(ds, feats)

        if args.train:
            train_set = _maybe_cache(
                _build_dataset(cfg, "train", tokenizer, model_cfg.clip.image_resolution)
            )
            dev_set = _maybe_cache(
                _build_dataset(cfg, "dev" if cfg.data.dataset.name == "flickr"
                               else "val", tokenizer,
                               model_cfg.clip.image_resolution)
            )
            # njobs = decode worker processes, as in the reference DataLoader
            # (`base_task.py:137-169`); 0 keeps a single prefetch thread
            train_loader = BucketedLoader(
                train_set, batch_size, shuffle=True, drop_last=True,
                max_audio_len=max_audio_len, train=True, seed=args.seed,
                num_workers=args.njobs, prefetch=max(2 * args.njobs, 2),
            )
            dev_loader = BucketedLoader(
                dev_set, dev_batch_size, shuffle=False, drop_last=False,
                num_workers=args.njobs, prefetch=max(2 * args.njobs, 2),
            )
            trainer.fit(train_loader, dev_loader)
        elif args.eval or args.test:
            split = "test" if args.test else (
                "dev" if cfg.data.dataset.name == "flickr" else "val"
            )
            eval_set = _maybe_cache(
                _build_dataset(cfg, split, tokenizer, model_cfg.clip.image_resolution)
            )
            eval_loader = BucketedLoader(
                eval_set, dev_batch_size, shuffle=False, drop_last=False,
                num_workers=args.njobs, prefetch=max(2 * args.njobs, 2),
            )
            metrics = trainer.validate(eval_loader)
            print({k: round(v, 4) for k, v in metrics.items()})
        return trainer
