"""1-D convolution primitives for the WaveNet stack.

The reference implements dilated conv1d through the ``time_to_batch``
reshape trick + ``tf.nn.conv2d`` (reference nsynth/wavenet/masked.py:57-160)
because TF1's GPU kernels lacked native 1-D dilation.  XLA:TPU has native
dilated convolution, so here each op is a single
``lax.conv_general_dilated`` that the compiler tiles straight onto the MXU
— no reshape dance, no padding games.

Padding equivalence with the reference (verified in tests/test_conv.py):
  * non-causal, filter F, dilation d  ->  SAME inside each dilation phase
    == symmetric pad of ((F-1)//2 * d) in real time;
  * causal                            ->  (F-1) zeros at the head of each
    phase == left pad of (F-1)*d in real time.
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax

_DIMENSION_NUMBERS = ("NWC", "WIO", "NWC")


def conv1d(
    x,
    w,
    b=None,
    *,
    dilation: int = 1,
    causal: bool = True,
    accum_dtype=jnp.float32,
):
    """Dilated 1-D convolution (reference masked.py:110-160 semantics).

    Args:
      x: [batch, time, in_channels].
      w: [filter_length, in_channels, out_channels] — the reference stores
         TF kernels as [1, filter, in, out] (masked.py:136); the converter
         squeezes that leading 1.
      b: optional [out_channels] bias.
      dilation: dilation rate in samples.
      causal: left-pad only (decoder) vs symmetric (encoder).
      accum_dtype: MXU accumulation dtype (keep float32 even for bf16 inputs).

    Returns:
      [batch, time, out_channels], same time length as the input.
    """
    filter_length = w.shape[0]
    # preferred_element_type=f32 on bf16 operands breaks the conv transpose
    # rule (the cotangent arrives in f32); the TPU MXU already accumulates
    # bf16 products in f32 internally, so only force it for f32 inputs.
    preferred = accum_dtype if x.dtype == accum_dtype else None
    if w.shape[1] == 1 and filter_length > 1 and x.shape[0] == 1:
        # Single-input-channel front convs (ae_startconv / startconv) on
        # batch-1 operands: the conv op on a [1, T, 1] operand makes XLA
        # pick a pathological {2,0,1:T(2,128)} layout feeding the Pallas
        # custom-calls (~150 us per transfer eval in the round-2 xplane
        # trace). Express it as shifted broadcast multiplies in the
        # natural [B, T, C] layout. Numerics are identical: bf16xbf16
        # products are exact in f32 (16 mantissa bits), and the taps
        # accumulate in f32 in filter order, exactly like the MXU conv
        # path. Batch-1 only: at training shapes (batch 32 x 6144, decoder
        # width 512) the f32 [B, T, C] intermediates this expansion
        # materializes around the remat boundary overflowed HBM by ~5 GB,
        # while the conv op's layouts are unproblematic there.
        return _conv1d_one_in_channel(x, w, b, dilation, causal, accum_dtype)
    if filter_length == 1:
        # 1x1 convolutions are plain feature matmuls; skip the conv op so XLA
        # fuses them with neighbouring elementwise work more readily.
        y = jnp.dot(x, w[0], preferred_element_type=preferred)
    else:
        span = (filter_length - 1) * dilation
        pad = (span, 0) if causal else (span // 2, span - span // 2)
        y = lax.conv_general_dilated(
            x,
            w,
            window_strides=(1,),
            padding=[pad],
            rhs_dilation=(dilation,),
            dimension_numbers=_DIMENSION_NUMBERS,
            preferred_element_type=preferred,
        )
    if b is not None:
        y = y + b
    return y.astype(x.dtype)


def _conv1d_one_in_channel(x, w, b, dilation: int, causal: bool, accum_dtype):
    """conv1d fast path for in_channels == 1 (see conv1d).

    out[n, t, c] = sum_k x[n, t + o_k, 0] * w[k, 0, c]   (zeros off-edge)
    with o_k = -pad_left + k*dilation matching the conv padding exactly.
    """
    filter_length = w.shape[0]
    span = (filter_length - 1) * dilation
    pad_left = span if causal else span // 2
    xt = x[..., 0].astype(accum_dtype)  # [B, T]
    t = xt.shape[1]
    zeros = jnp.zeros_like(xt)

    def shift(o: int):
        # rows t read x[t + o]
        if o == 0:
            return xt
        if o > 0:
            return jnp.concatenate([xt[:, o:], zeros[:, :o]], axis=1)
        return jnp.concatenate([zeros[:, :-o], xt[:, :o]], axis=1)

    y = None
    for k in range(filter_length):
        term = shift(-pad_left + k * dilation)[..., None] * w[k, 0].astype(
            accum_dtype
        )
        y = term if y is None else y + term
    if b is not None:
        y = y + b.astype(accum_dtype)
    return y.astype(x.dtype)


def pool1d(x, window_length: int, mode: str = "avg", stride: int | None = None):
    """1-D pooling over time (reference masked.py:163-190).

    With stride == window_length and time % window == 0 (the only way the
    reference uses it: hop-512 average pooling at model.py:128) this is an
    exact reshape + reduce, which XLA lowers to one fused reduction.
    """
    stride = stride or window_length
    b, t, c = x.shape
    assert t % window_length == 0 and stride == window_length, (
        "only non-overlapping pooling is used by the model"
    )
    xr = x.reshape(b, t // window_length, window_length, c)
    if mode == "avg":
        return xr.mean(axis=2)
    if mode == "max":
        return xr.max(axis=2)
    raise ValueError(f"unknown pooling mode {mode!r}")


def shift_right(x):
    """Shift time right by one, zero-filling t=0 (reference masked.py:24-37)."""
    return jnp.pad(x, ((0, 0), (1, 0), (0, 0)))[:, : x.shape[1], :]


def condition(x, encoding):
    """Broadcast-add a hop-rate encoding onto a sample-rate signal.

    Reference model.py:34-55 (`_condition`): x is [mb, length, channels],
    encoding is [mb, enc_length, channels] with length % enc_length == 0.
    """
    mb, length, channels = x.shape
    enc_mb, enc_length, enc_channels = encoding.shape
    assert enc_mb == mb and enc_channels == channels
    x = x.reshape(mb, enc_length, length // enc_length, channels)
    x = x + encoding[:, :, None, :]
    return x.reshape(mb, length, channels)
