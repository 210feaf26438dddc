"""Unidirectional multi-layer LSTM with torch parameter semantics.

Built for the APC-family s3prl upstreams (the reference delegates to
`s3prl.hub.apc()` etc., `avssl/module/speech_encoder_plus.py:145`, whose
encoder is a stack of unidirectional `torch.nn.LSTM` layers). Parameters
mirror torch exactly — `w_ih` (4H, in), `w_hh` (4H, H), `b_ih`/`b_hh`
(4H,), gate order [i, f, g, o] — so a torch state dict imports 1:1 and the
numerics are oracle-testable against `torch.nn.LSTM`.

TPU-first: the time recurrence is one `lax.scan` per layer; the
input-to-hidden projection for ALL timesteps is hoisted out of the scan as
a single (B*T, in) x (in, 4H) MXU matmul, leaving only the (B, H) x (H, 4H)
recurrent matmul inside the scan body. Recurrent state stays fp32 (LSTM
cell state accumulates; bf16 drifts), inputs may be any dtype.
"""
from __future__ import annotations

from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

__all__ = ["LSTMLayer", "LSTMStack"]


class LSTMLayer(nn.Module):
    """One unidirectional LSTM layer over (B, T, in) -> (B, T, H)."""

    features: int

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        h = self.features
        in_dim = x.shape[-1]

        def torch_uniform(key, shape, dtype=jnp.float32):
            # torch.nn.LSTM init: U(-1/sqrt(H), 1/sqrt(H))
            k = 1.0 / jnp.sqrt(jnp.float32(h))
            return jax.random.uniform(key, shape, dtype, -k, k)

        w_ih = self.param("w_ih", torch_uniform, (4 * h, in_dim))
        w_hh = self.param("w_hh", torch_uniform, (4 * h, h))
        b_ih = self.param("b_ih", torch_uniform, (4 * h,))
        b_hh = self.param("b_hh", torch_uniform, (4 * h,))

        # hoist the input projection: one big MXU matmul for every timestep
        gates_x = (
            x.astype(jnp.float32) @ w_ih.T.astype(jnp.float32)
            + b_ih + b_hh
        )  # (B, T, 4H)

        w_hh_t = w_hh.T.astype(jnp.float32)  # (H, 4H)

        def step(carry, gx):
            h_prev, c_prev = carry
            g = gx + h_prev @ w_hh_t
            i = jax.nn.sigmoid(g[:, 0 * h:1 * h])
            f = jax.nn.sigmoid(g[:, 1 * h:2 * h])
            gg = jnp.tanh(g[:, 2 * h:3 * h])
            o = jax.nn.sigmoid(g[:, 3 * h:4 * h])
            c = f * c_prev + i * gg
            out = o * jnp.tanh(c)
            return (out, c), out

        b = x.shape[0]
        init = (
            jnp.zeros((b, h), jnp.float32),
            jnp.zeros((b, h), jnp.float32),
        )
        _, outs = jax.lax.scan(step, init, jnp.swapaxes(gates_x, 0, 1))
        return jnp.swapaxes(outs, 0, 1)  # (B, T, H)


class LSTMStack(nn.Module):
    """N stacked LSTM layers; returns every layer's output sequence."""

    features: int
    n_layers: int
    dropout: float = 0.0

    @nn.compact
    def __call__(
        self, x: jnp.ndarray, deterministic: bool = True
    ) -> Tuple[jnp.ndarray, ...]:
        outs = []
        for i in range(self.n_layers):
            x = LSTMLayer(self.features, name=f"layer_{i}")(x)
            outs.append(x)
            if self.dropout > 0.0 and i < self.n_layers - 1:
                x = nn.Dropout(self.dropout)(x, deterministic=deterministic)
        return tuple(outs)
