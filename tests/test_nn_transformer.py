import jax
import jax.numpy as jnp
import numpy as np
import torch

from speechclip_plus_tpu.checkpoint.torch_import import (
    t2j_mha,
    t2j_mha_and_norm,
    t2j_mlp_layers,
    t2j_transformer_encoder,
)
from speechclip_plus_tpu.nn import (
    MLPLayers,
    MultiheadAttention,
    MultiheadAttentionAndNorm,
    TransformerEncoder,
)

D, H = 16, 4


def _mask(B, T, lens):
    m = np.zeros((B, T), dtype=bool)
    for i, l in enumerate(lens):
        m[i, l:] = True
    return m


def test_mha_matches_torch():
    torch.manual_seed(0)
    tm = torch.nn.MultiheadAttention(D, H, dropout=0.0, batch_first=True)
    tm.eval()
    B, T = 2, 6
    x = np.random.default_rng(0).normal(size=(B, T, D)).astype(np.float32)
    lens = [4, 6]
    kpm = _mask(B, T, lens)
    with torch.no_grad():
        t_out, t_w = tm(
            torch.from_numpy(x), torch.from_numpy(x), torch.from_numpy(x),
            key_padding_mask=torch.from_numpy(kpm), average_attn_weights=False,
        )

    jm = MultiheadAttention(D, H, dropout=0.0)
    params = {"params": jax.tree.map(jnp.asarray, t2j_mha(tm.state_dict(), ""))}
    j_out, j_w = jm.apply(
        params, jnp.asarray(x), jnp.asarray(x), jnp.asarray(x),
        key_padding_mask=jnp.asarray(kpm), return_weights=True,
    )
    np.testing.assert_allclose(np.asarray(j_out), t_out.numpy(), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(j_w), t_w.numpy(), rtol=1e-4, atol=1e-5)


def test_transformer_encoder_matches_torch():
    torch.manual_seed(1)
    n_layers = 2
    t_layer = torch.nn.TransformerEncoderLayer(
        d_model=D, nhead=H, dim_feedforward=32, dropout=0.0, activation="gelu",
        layer_norm_eps=1e-5, batch_first=True, norm_first=False,
    )
    t_enc = torch.nn.TransformerEncoder(
        t_layer, n_layers, torch.nn.LayerNorm(D, eps=1e-5), enable_nested_tensor=False
    )
    t_enc.eval()

    B, T = 3, 5
    x = np.random.default_rng(1).normal(size=(B, T, D)).astype(np.float32)
    kpm = _mask(B, T, [3, 5, 2])
    with torch.no_grad():
        t_out = t_enc(torch.from_numpy(x), src_key_padding_mask=torch.from_numpy(kpm))

    sd = {f"model.{k}": v for k, v in t_enc.state_dict().items()}
    j_enc = TransformerEncoder(
        n_layers=n_layers, d_model=D, nhead=H, dim_feedforward=32, dropout=0.0,
        activation="gelu", norm_first=False,
    )
    params = {"params": jax.tree.map(jnp.asarray, t2j_transformer_encoder(sd, "", n_layers))}
    j_out = j_enc.apply(params, jnp.asarray(x), key_padding_mask=jnp.asarray(kpm))
    np.testing.assert_allclose(np.asarray(j_out), t_out.numpy(), rtol=1e-4, atol=1e-5)

    # hidden states: input + per-layer outputs, pre-final-norm
    hs = j_enc.apply(
        params, jnp.asarray(x), key_padding_mask=jnp.asarray(kpm),
        method=j_enc.extract_hidden_states,
    )
    assert len(hs) == n_layers + 1
    np.testing.assert_allclose(np.asarray(hs[0]), x, rtol=1e-6)


def test_norm_first_variant_matches_torch():
    torch.manual_seed(2)
    t_layer = torch.nn.TransformerEncoderLayer(
        d_model=D, nhead=H, dim_feedforward=32, dropout=0.0, activation="gelu",
        batch_first=True, norm_first=True,
    )
    t_enc = torch.nn.TransformerEncoder(t_layer, 1, torch.nn.LayerNorm(D))
    t_enc.eval()
    x = np.random.default_rng(2).normal(size=(2, 4, D)).astype(np.float32)
    with torch.no_grad():
        t_out = t_enc(torch.from_numpy(x))
    sd = {f"model.{k}": v for k, v in t_enc.state_dict().items()}
    j_enc = TransformerEncoder(
        n_layers=1, d_model=D, nhead=H, dim_feedforward=32, dropout=0.0, norm_first=True
    )
    params = {"params": jax.tree.map(jnp.asarray, t2j_transformer_encoder(sd, "", 1))}
    j_out = j_enc.apply(params, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(j_out), t_out.numpy(), rtol=1e-4, atol=1e-5)


class _TorchMHAAndNorm(torch.nn.Module):
    """torch oracle of the reference MultiheadAttentionAndNorm block."""

    def __init__(self):
        super().__init__()
        self.multihead_attn_layer = torch.nn.MultiheadAttention(D, H, dropout=0.0, batch_first=True)
        self.attentionBlock_Norm = torch.nn.LayerNorm(D, eps=1e-5)

    def forward(self, x, kpm):
        return self.attentionBlock_Norm(
            self.multihead_attn_layer(x, x, x, key_padding_mask=kpm)[0] + x
        )


def test_mha_and_norm_matches_torch():
    torch.manual_seed(3)
    tm = _TorchMHAAndNorm()
    tm.eval()
    B, T = 2, 7
    x = np.random.default_rng(3).normal(size=(B, T, D)).astype(np.float32)
    kpm = _mask(B, T, [7, 4])
    with torch.no_grad():
        t_out = tm(torch.from_numpy(x), torch.from_numpy(kpm))

    jm = MultiheadAttentionAndNorm(d_model=D, nhead=H, dropout=0.0)
    params = {"params": jax.tree.map(jnp.asarray, t2j_mha_and_norm(tm.state_dict(), ""))}
    j_out = jm.apply(params, jnp.asarray(x), key_padding_mask=jnp.asarray(kpm))
    np.testing.assert_allclose(np.asarray(j_out), t_out.numpy(), rtol=1e-4, atol=1e-5)


def test_mlp_layers_matches_torch():
    torch.manual_seed(4)
    units = [D, 32, 8]
    seq = []
    for u0, u1 in zip(units[:-1], units[1:]):
        seq += [torch.nn.Linear(u0, u1), torch.nn.ReLU(), torch.nn.Dropout(0.1)]
    seq = seq[:-2]
    tm = torch.nn.Sequential(*seq)
    tm.eval()
    x = np.random.default_rng(4).normal(size=(5, D)).astype(np.float32)
    with torch.no_grad():
        t_out = tm(torch.from_numpy(x))

    sd = {f"sequential.{k}": v for k, v in tm.state_dict().items()}
    jm = MLPLayers(units=units, dropout=0.1)
    params = {"params": jax.tree.map(jnp.asarray, t2j_mlp_layers(sd, "", len(units) - 1))}
    j_out = jm.apply(params, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(j_out), t_out.numpy(), rtol=1e-4, atol=1e-5)
