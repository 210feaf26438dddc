"""Analytic FLOP accounting (utils/flops.py) — the mfu_analytic basis.

The counter must match hand-computed values for a known tiny case and
behave correctly across the config matrix (cached-image drops the image
tower; trainable towers triple their count)."""
import os

from speechclip_plus_tpu.config import load_config
from speechclip_plus_tpu.models.kwclip import KWClipConfig
from speechclip_plus_tpu.utils.flops import conv_out_len, train_step_flops

REPO = os.path.join(os.path.dirname(__file__), "..")


def _base_cfg():
    return KWClipConfig.from_config(
        load_config(
            os.path.join(REPO, "config", "speechclip_plus", "base",
                         "hybrid_plus.yaml")
        )
    )


def test_conv_out_len_matches_reference_downsampling():
    # fairseq HuBERT stack: 102400 samples -> 319 frames (stride product
    # 320 with edge trim; reference computes round(wav/320) and clamps,
    # speech_encoder_plus.py:604-611)
    cfg = _base_cfg()
    assert conv_out_len(102400, cfg.audio.conv_layers) == 319
    assert conv_out_len(320 * 100 + 80, cfg.audio.conv_layers) == 100


def test_transformer_flops_hand_value():
    from speechclip_plus_tpu.utils.flops import _transformer_flops

    # 1 layer, B*T=10 tokens, d=4, ffn=8, seq=10:
    # qkv 2*10*4*12=960, out 2*10*4*4=320, attn 2*2*10*10*4=1600,
    # ffn 2*2*10*4*8=1280 -> 4160
    assert _transformer_flops(10, 4, 8, 1, 10) == 4160
    # MultiheadAttentionAndNorm has no FFN
    assert _transformer_flops(10, 4, 8, 1, 10, has_ffn=False) == 2880


def test_cached_image_drops_only_image_tower():
    cfg = _base_cfg()
    live = train_step_flops(cfg, 64, 102400)
    cached = train_step_flops(cfg, 64, 102400, cached_image=True)
    assert "clip_image_tower" in live and "clip_image_tower" not in cached
    assert abs(
        (live["total"] - cached["total"]) - live["clip_image_tower"]
    ) < 1e-6 * live["total"]


def test_frozen_tower_counts_forward_only():
    import dataclasses

    cfg = _base_cfg()
    frozen = train_step_flops(cfg, 64, 102400)
    trainable = train_step_flops(
        dataclasses.replace(cfg, audio_trainable=True), 64, 102400
    )
    assert abs(
        trainable["hubert_stack"] - 3 * frozen["hubert_stack"]
    ) < 1e-9 * trainable["hubert_stack"]


def test_scales_linearly_in_batch():
    cfg = _base_cfg()
    f1 = train_step_flops(cfg, 64, 102400)
    f2 = train_step_flops(cfg, 128, 102400)
    # loss similarity is O(B^2) but negligible; tower terms dominate
    assert abs(f2["total"] - 2 * f1["total"]) < 0.01 * f2["total"]


def test_every_yaml_counts():
    import glob

    for path in glob.glob(os.path.join(REPO, "config", "**", "*.yaml"),
                          recursive=True):
        cfg = KWClipConfig.from_config(load_config(path))
        f = train_step_flops(cfg, 8, 32000)
        assert f["total"] > 0, path
