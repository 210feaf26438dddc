"""Every shipped YAML builds: config -> KWClipConfig -> KWClip.init.

The reference ships 12 configs over two families (config/speechCLIP/**,
config/speechCLIP+/**); this repo mirrors the full matrix. Towers and branch
widths are downscaled before `init` (full HuBERT-large/ViT-L inits are not
CI-viable on one CPU) — the *wiring* (branch type, projections, CIF, reduced
vocab, objective weights) is exactly what the YAML says.
"""
import dataclasses
import glob
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from speechclip_plus_tpu.config import load_config
from speechclip_plus_tpu.models import KWClip, KWClipConfig
from speechclip_plus_tpu.models.clip import ClipConfig
from speechclip_plus_tpu.models.hubert import HubertConfig
from speechclip_plus_tpu.tasks.builder import resolve_reduced_vocab

# slow tier: model inits, minutes on 1 CPU
pytestmark = pytest.mark.slow

REPO = os.path.join(os.path.dirname(__file__), "..")
ALL_YAMLS = sorted(
    glob.glob(os.path.join(REPO, "config", "speechclip", "**", "*.yaml"),
              recursive=True)
    + glob.glob(os.path.join(REPO, "config", "speechclip_plus", "**", "*.yaml"),
                recursive=True)
)


def _downscale(mc: KWClipConfig, d: int = 32) -> KWClipConfig:
    """Tiny-tower override: shrink widths, keep all wiring."""
    clip = ClipConfig.tiny(
        text_width=d, embed_dim=d,
        vocab_size=mc.clip.vocab_size, sot_id=mc.clip.sot_id,
        eot_id=mc.clip.eot_id,
    )

    def ta(t):
        return dataclasses.replace(t, d_model=d, nhead=4, dim_feedforward=64)

    def dims(t):
        return None if t is None else tuple(d for _ in t)

    head = dataclasses.replace(
        mc.head, d_model=d, text_dim=d, kw_proj_dims=dims(mc.head.kw_proj_dims)
    )
    cif = mc.cif
    if cif is not None:
        cif = dataclasses.replace(
            cif, cif_output_dim=d, encoder_embed_dim=d,
            max_feat_len=min(cif.max_feat_len, clip.context_length - 2),
        )
    return dataclasses.replace(
        mc,
        audio=HubertConfig.tiny(d_model=d),
        clip=clip,
        parallel_ta=ta(mc.parallel_ta),
        cascaded_ta=ta(mc.cascaded_ta),
        head=head,
        cif=cif,
        img_proj_dims=dims(mc.img_proj_dims),
        p_proj_dims=dims(mc.p_proj_dims),
        pbranch_proj_dims=dims(mc.pbranch_proj_dims),
        c_proj_dims=dims(mc.c_proj_dims),
    )


@pytest.mark.parametrize("path", ALL_YAMLS, ids=lambda p: os.path.relpath(p, REPO))
def test_yaml_builds_and_inits(path):
    cfg = load_config(path)
    vocab = resolve_reduced_vocab(cfg)
    assert vocab is not None, "all shipped configs use a reduced vocab"
    mc = KWClipConfig.from_config(
        cfg, vocab_size=len(vocab), sot_id=int(vocab.sot_reduced),
        eot_id=int(vocab.eot_reduced),
    )

    # every shipped recipe trains bf16 towers through the product path
    assert mc.audio.dtype == jnp.bfloat16
    # the YAML's branch wiring reached the typed config
    ms = cfg.model_settings
    c_w = float(getattr(ms, "cascaded_objective_weight", 0.0))
    p_w = float(getattr(ms, "parallel_objective_weight", 0.0))
    assert mc.cascaded_objective_weight == c_w
    assert mc.parallel_objective_weight == p_w
    if c_w > 0:
        expect = ms.cascaded_branch.type.replace("KW_", "").replace(
            "dynamic", "plus"
        )
        assert mc.branch_type == expect
        if expect.endswith("_plus"):
            assert mc.cif is not None
    if "large" in cfg.audio_encoder.name:
        assert mc.audio.n_layers == 24
        active_ta = mc.cascaded_ta if c_w > 0 else mc.parallel_ta
        assert active_ta.d_model == 1024

    small = _downscale(mc)
    model = KWClip(small)
    rng = np.random.RandomState(0)
    b, t = 2, 800
    batch = {
        "wav": jnp.asarray(rng.randn(b, t).astype(np.float32)),
        "wav_len": jnp.asarray([t, t - 320]),
        "image": jnp.asarray(rng.randn(b, 32, 32, 3).astype(np.float32)),
        "id": jnp.asarray([0, 1]),
        "text": jnp.zeros((b, small.clip.context_length), jnp.int32),
    }
    variables = model.init({"params": jax.random.PRNGKey(0)}, batch, training=False)
    loss_feats, log_metrics, _ = model.apply(variables, batch, training=False)
    losses = model.apply(variables, loss_feats, method=KWClip.compute_loss)
    assert np.isfinite(float(losses["loss"]))
    if p_w > 0:
        assert "parallel_audio_feat" in loss_feats
    if c_w > 0:
        assert "cascaded_audio_feat" in loss_feats


def test_transformer_type_sibling_key(tmp_path):
    """The original-SpeechCLIP family puts the block type in a sibling
    `transformer_type` key (`config/speechCLIP/model_base/spchclp_p.yaml:21`);
    it must reach TransformerArgs.type."""
    p = tmp_path / "c.yaml"
    p.write_text(
        """
model_settings:
  cascaded_objective_weight: 0.0
  parallel_objective_weight: 1.0
  parallel_branch:
    transformer_type: TransformerEncoder
    transformer_args:
      n_layers: 1
      d_model: 768
      nhead: 8
      dim_feedforward: 3072
cl_loss:
  type: MaskedContrastiveLoss
  args: {temperature: 0.07}
retrieval: {audio_feat_src: parallel}
clip: {name: ViT-B/32}
audio_encoder: {type: FairseqHubert, name: hubert}
trainer: {precision: 16}
"""
    )
    mc = KWClipConfig.from_config(load_config(str(p)))
    assert mc.parallel_ta.type == "TransformerEncoder"
    assert mc.parallel_ta.d_model == 768
    assert mc.audio.dtype == jnp.bfloat16  # precision: 16 -> bf16 on TPU
