import pickle

from speechclip_plus_tpu.config import ConfigNode, load_config, merge_configs


def test_nested_attribute_access():
    cfg = ConfigNode({"a": 1, "b": {"c": 2, "d": {"e": 3}}})
    assert cfg.a == 1
    assert cfg.b.c == 2
    assert cfg.b.d.e == 3
    assert cfg["b"]["d"]["e"] == 3


def test_merge_sequential():
    cfg = merge_configs({"a": 1, "b": 2}, {"b": 3, "c": 4})
    assert cfg.a == 1 and cfg.b == 3 and cfg.c == 4


def test_roundtrip_dict():
    d = {"x": {"y": [1, 2, {"z": 3}]}, "w": "s"}
    cfg = ConfigNode(d)
    assert cfg.to_dict() == d


def test_pickle_roundtrip():
    cfg = ConfigNode({"a": {"b": 1}})
    cfg2 = pickle.loads(pickle.dumps(cfg))
    assert cfg2.a.b == 1
    assert cfg == cfg2


def test_get_and_setdefault():
    cfg = ConfigNode({"a": 1})
    assert cfg.get("missing") is None
    assert cfg.get("missing", 7) == 7
    cfg.setdefault("n", {"m": 2})
    assert cfg.n.m == 2


def test_deep_update():
    cfg = ConfigNode({"a": {"b": 1, "c": 2}})
    cfg.deep_update({"a": {"b": 10}, "d": 4})
    assert cfg.a.b == 10 and cfg.a.c == 2 and cfg.d == 4


def test_load_reference_yaml(tmp_path):
    p = tmp_path / "c.yaml"
    p.write_text(
        "model_settings:\n  cascaded_objective_weight: 1.0\n"
        "  cascaded_branch:\n    transformer_args:\n      d_model: 768\n"
    )
    cfg = load_config(str(p))
    assert cfg.model_settings.cascaded_branch.transformer_args.d_model == 768


def test_trainer_precision_drives_tower_dtypes(tmp_path):
    """trainer.precision: bf16/16 must reach the towers through the product
    (YAML -> KWClipConfig) path, not just hand-built bench configs
    (reference trains fp16: config/speechCLIP+/model_base/spchclip_h+.yaml:141)."""
    import jax.numpy as jnp

    from speechclip_plus_tpu.models.kwclip import KWClipConfig

    repo = __import__("os").path.join(__import__("os").path.dirname(__file__), "..")
    shipped = load_config(
        __import__("os").path.join(
            repo, "config", "speechclip_plus", "base", "hybrid_plus.yaml"
        )
    )
    mc = KWClipConfig.from_config(shipped)
    assert mc.audio.dtype == jnp.bfloat16
    assert mc.clip.dtype == jnp.bfloat16
    # the branches train under the same autocast as the towers
    assert mc.cascaded_ta.dtype == jnp.bfloat16
    assert mc.parallel_ta.dtype == jnp.bfloat16
    assert mc.head.dtype == jnp.bfloat16

    # precision 16 (the reference's literal value) also maps to bf16 on TPU
    shipped.trainer.precision = 16
    mc16 = KWClipConfig.from_config(shipped)
    assert mc16.audio.dtype == jnp.bfloat16

    # explicit fp32 and absent precision stay fp32
    shipped.trainer.precision = 32
    mc32 = KWClipConfig.from_config(shipped)
    assert mc32.audio.dtype == jnp.float32
    assert mc32.cascaded_ta.dtype == jnp.float32
    assert mc32.head.dtype == jnp.float32
    tiny = load_config(
        __import__("os").path.join(repo, "config", "dev", "tiny.yaml")
    )
    assert KWClipConfig.from_config(tiny).audio.dtype == jnp.float32


def test_frozen_dropout_knob():
    """`audio_encoder.frozen_dropout: false` zeroes tower dropout when the
    encoder is frozen (reference-effective behavior keeps it: the frozen
    encoder's eval() is undone by Lightning's train() — see kwclip.py)."""
    import yaml

    from speechclip_plus_tpu.config import ConfigNode
    from speechclip_plus_tpu.models import KWClipConfig

    base = yaml.safe_load(open("config/speechclip_plus/base/hybrid_plus.yaml"))
    cfg = ConfigNode(base)
    mc = KWClipConfig.from_config(cfg)
    assert mc.audio.dropout > 0  # parity default: dropout active

    base["audio_encoder"]["frozen_dropout"] = False
    mc2 = KWClipConfig.from_config(ConfigNode(base))
    assert mc2.audio.dropout == 0.0
    assert mc2.audio.attention_dropout == 0.0

    # trainable encoder ignores the knob (dropout is real regularization)
    base["audio_encoder"]["trainable"] = True
    mc3 = KWClipConfig.from_config(ConfigNode(base))
    assert mc3.audio.dropout > 0


def test_frontend_chunks_auto_from_batch_size():
    """Unset frontend_chunks auto-chunks in units of <=256 samples
    (unchunked B=256 fits v5e HBM since the fused-ST VQ landed and
    measures faster — kwclip.py from_config); explicit values win."""
    import yaml

    from speechclip_plus_tpu.config import ConfigNode
    from speechclip_plus_tpu.models import KWClipConfig

    base = yaml.safe_load(open("config/speechclip_plus/base/hybrid_plus.yaml"))
    assert int(base["data"]["batch_size"]) == 256  # reference recipe
    mc = KWClipConfig.from_config(ConfigNode(base))
    assert mc.audio.frontend_chunks == 1

    base["data"]["batch_size"] = 512
    assert KWClipConfig.from_config(
        ConfigNode(base)).audio.frontend_chunks == 2

    base["data"]["batch_size"] = 64
    assert KWClipConfig.from_config(
        ConfigNode(base)).audio.frontend_chunks == 1

    base["audio_encoder"]["frontend_chunks"] = 4
    assert KWClipConfig.from_config(
        ConfigNode(base)).audio.frontend_chunks == 4


def test_remat_knob_through_config():
    """`audio_encoder.remat` (additive key) reaches HubertConfig; default is
    auto — off for frozen towers (stop_gradient keeps no residuals), on for
    a trainable large tower where per-layer residuals exceed v5e HBM."""
    import os

    from speechclip_plus_tpu.models.kwclip import KWClipConfig

    repo = os.path.join(os.path.dirname(__file__), "..")
    shipped = load_config(
        os.path.join(repo, "config", "speechclip_plus", "large", "flickr",
                     "hybrid_plus.yaml")
    )
    # frozen large tower: no remat by default
    assert KWClipConfig.from_config(shipped).audio.remat is False
    # explicit opt-in
    shipped.audio_encoder.remat = True
    assert KWClipConfig.from_config(shipped).audio.remat is True
    # trainable large tower: auto-on
    del shipped.audio_encoder["remat"]
    shipped.audio_encoder.trainable = True
    assert KWClipConfig.from_config(shipped).audio.remat is True
    # trainable base tower: auto-off (fits comfortably)
    base = load_config(
        os.path.join(repo, "config", "speechclip_plus", "base",
                     "hybrid_plus.yaml")
    )
    base.audio_encoder.trainable = True
    assert KWClipConfig.from_config(base).audio.remat is False
