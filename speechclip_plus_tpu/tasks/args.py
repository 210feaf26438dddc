"""General CLI flags (reference ``avssl/util/args.py:4-38``)."""
from __future__ import annotations

import argparse

__all__ = ["add_general_arguments"]


def add_general_arguments(parser: argparse.ArgumentParser) -> argparse.ArgumentParser:
    parser.add_argument("--config", type=str, default=None, help="YAML config path")
    parser.add_argument("--save_path", type=str, default="exp/run", help="output dir")
    parser.add_argument("--train", action="store_true", help="train the model")
    parser.add_argument("--eval", action="store_true", help="evaluate on dev split")
    parser.add_argument("--test", action="store_true", help="evaluate on test split")
    parser.add_argument("--ckpt", type=str, default=None,
                        help="checkpoint to load (orbax dir or Lightning .ckpt)")
    parser.add_argument("--resume", type=str, default=None,
                        help="resume full training state from an orbax dir")
    parser.add_argument(
        "--njobs", type=int, default=2,
        help="data-decode worker processes (reference DataLoader njobs); "
             "0 = single prefetch thread",
    )
    parser.add_argument("--devices", type=int, default=-1,
                        help="number of devices for the data mesh (-1 = all); "
                        "replaces the reference --gpus")
    parser.add_argument("--gpus", type=int, default=None, help=argparse.SUPPRESS)
    parser.add_argument("--seed", type=int, default=7122, help="random seed")
    parser.add_argument("--dataset_root", type=str, default=None,
                        help="override config.data.dataset.dataset_root")
    parser.add_argument("--log_level", type=str, default="INFO")
    return parser
