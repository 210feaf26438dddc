#!/usr/bin/env python3
"""Library-style usage (reference ``example.py:10-33``): load a model, run
the s3prl-style feature extractor and `encode_speech` on a waveform.

    python example.py --ckpt <orbax dir or Lightning .ckpt> [--config yaml]
"""
import argparse

import numpy as np

import jax.numpy as jnp


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", type=str, default=None,
                    help="Lightning .ckpt or orbax checkpoint dir")
    ap.add_argument("--config", type=str, default=None)
    ap.add_argument("--wav", type=str, default=None, help="a wav file (16 kHz)")
    args = ap.parse_args()

    from speechclip_plus_tpu.config import load_config
    from speechclip_plus_tpu.models import KWClip
    from speechclip_plus_tpu.tasks import build_model_from_config

    if args.ckpt and args.ckpt.endswith(".ckpt"):
        from speechclip_plus_tpu.checkpoint import (
            lightning_to_kwclip,
            load_lightning_checkpoint,
        )

        sd, cfg, _ = load_lightning_checkpoint(args.ckpt)
        model, variables, model_cfg, _ = build_model_from_config(cfg)
        params, batch_stats = lightning_to_kwclip(sd, model_cfg)
        variables = {"params": params, "batch_stats": batch_stats}
    else:
        assert args.config, "--config required without a Lightning ckpt"
        cfg = load_config(args.config)
        model, variables, model_cfg, _ = build_model_from_config(cfg)

    if args.wav:
        from speechclip_plus_tpu.data import load_wav

        wav_np = load_wav(args.wav)
    else:
        wav_np = np.random.RandomState(0).randn(16000).astype(np.float32)

    wav = jnp.asarray(wav_np)[None, :]
    wav_len = jnp.asarray([wav.shape[1]])

    last_hidden, hidden_states = model.apply(
        variables, wav, wav_len, method=KWClip.feature_extractor
    )
    print("last_hidden:", last_hidden.shape, "#hidden_states:", len(hidden_states))

    out = model.apply(variables, wav, wav_len, method=KWClip.encode_speech)
    for k, v in out.items():
        if v is not None and hasattr(v, "shape"):
            print(f"{k}: {v.shape}")


if __name__ == "__main__":
    main()
