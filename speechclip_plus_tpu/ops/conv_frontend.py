"""Pallas kernel for the HuBERT waveform conv (frontend layer 0).

Reference hot loop #1 (`avssl/module/speech_encoder_plus.py:558-570`) starts
with fairseq's `ConvFeatureExtractionModel` layer 0: Conv1d(1, 512, k=10,
s=5) over the raw waveform. On TPU every XLA-side lowering of this op is
pathological at the reference shape (B=128, T=102400, measured on v5e):

  - `lax.conv_general_dilated`: 48.6 ms at 0.6 TFLOP/s — with C_in=1 the
    conv unit's contraction is 10 taps wide and the systolic array idles;
  - explicit im2col matmul: the (B, T', 10) patch tensor has a sub-lane
    minor dimension and gets layout-padded 128/10x (~100 ms);
  - batch-transposed matmul ((T,B) layout): 55.8 ms — strided lane slices
    dominate. In-kernel patch building also dies: Mosaic cannot shape-cast
    (8, FBLK*s) -> (8, FBLK, s) (lane-splitting relayout).

The formulation here removes the awkward stride entirely *before* the
kernel: the host graph deinterleaves the waveform by tap residue,
`wav_d[b, r, m] = wav[b, s*m + r]` (one XLA transpose at memory bandwidth).
In that layout every conv tap is a *contiguous column slice*, and the conv
becomes two stride-free MXU matmuls per block with the contraction over the
(tiny) residue axis:

    out[f, c] = sum_r wav_d[r, f]   * K[r, c]        (taps 0..s-1)
              + sum_r wav_d[r, f+1] * K[s+r, c]      (taps s..k-1)

which is `dot_general` contracting sublanes — no reshape, no strided
access, one output write. Requires k <= 2*s (true for HuBERT: k=10, s=5).
HBM traffic is the theoretical minimum (read waveform once + write the
(B, T0, C) output once) and the 26.8 GFLOP of real work rides the MXU.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["conv0_pallas"]

_FBLK = 2048  # output frames per grid cell (lane-tile multiple)


def _conv0_kernel(wmain_ref, whalo_ref, k0_ref, k1_ref, out_ref):
    """(1, s, FBLK)+(1, s, 128) deinterleaved strips -> (1, FBLK, C)."""
    w = jnp.concatenate([wmain_ref[0], whalo_ref[0]], axis=1)  # (s, FBLK+128)
    a0 = w[:, :_FBLK]
    a1 = w[:, 1:_FBLK + 1]
    out = jax.lax.dot_general(
        a0, k0_ref[:, :], (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    out = out + jax.lax.dot_general(
        a1, k1_ref[:, :], (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    out_ref[0] = out.astype(out_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("stride", "out_dtype", "interpret")
)
def conv0_pallas(
    wav: jnp.ndarray, kernel: jnp.ndarray, *, stride: int = 5,
    out_dtype=jnp.float32, interpret: bool = False,
) -> jnp.ndarray:
    """Waveform conv layer 0: (B, T) x (K, 1, C) -> (B, T0, C), VALID.

    Equivalent to `lax.conv_general_dilated(wav[:, :, None], kernel,
    (stride,), "VALID")` for K <= 2*stride.
    """
    b, t = wav.shape
    k, cin, c = kernel.shape
    s = stride
    assert cin == 1, "conv0_pallas is the C_in=1 waveform layer"
    assert s < k <= 2 * s, "two-tap-group construction assumes s < k <= 2s"
    t0 = (t - k) // s + 1

    nblk = -(-t0 // _FBLK)  # ceil
    halo = 128
    ncols = nblk * _FBLK + halo  # deinterleaved columns incl. halo
    t_need = s * ncols
    if t_need > t:
        wav = jnp.pad(wav, ((0, 0), (0, t_need - t)))
    # deinterleave by residue: wav_d[b, r, m] = wav[b, s*m + r]
    wav_d = wav[:, :t_need].reshape(b, ncols, s).transpose(0, 2, 1)

    kf = kernel[:, 0, :].astype(jnp.float32)
    k0 = kf[:s].astype(wav.dtype)                       # (s, C)
    k1 = jnp.zeros((s, c), jnp.float32).at[: k - s].set(
        kf[s:]
    ).astype(wav.dtype)                                  # (s, C)

    out = pl.pallas_call(
        _conv0_kernel,
        grid=(b, nblk),
        in_specs=[
            pl.BlockSpec((1, s, _FBLK), lambda i, j: (i, 0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, s, halo),
                         lambda i, j: (i, 0, (j + 1) * (_FBLK // halo)),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((s, c), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((s, c), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, _FBLK, c), lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, nblk * _FBLK, c), out_dtype),
        interpret=interpret,
    )(wav_d, wav_d, k0, k1)
    return out[:, :t0, :]
