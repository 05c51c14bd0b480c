"""Pallas-fused WaveNet encoder residual block.

One encoder layer of the reference model (model.py:96-116) is

    out = x + W_res @ relu( DilatedConv3( relu(x) ) )

XLA executes this as conv + several elementwise kernels, writing ~3
intermediate [T, 128] arrays to HBM per layer.  This kernel fuses the whole
block into a single pass per time tile:

  * the three conv taps become three [TILE, C] x [C, C] MXU matmuls over a
    halo-extended tile (the input is pre-padded by the halo so every DMA
    slice is static — padded rows are zeros, and relu(0) @ W = 0 reproduces
    SAME-padding semantics exactly);
  * relu / bias / residual-add run on the VPU in the same kernel;
  * HBM traffic drops from ~5 arrays/layer to read-x + write-out.

Alignment: TPU sublane tiles are 8 rows (f32), so the halo H is the
dilation rounded up to a multiple of 8 and all row slices start at
multiples of 8; for dilations < 8 the ±d taps are produced with
``pltpu.roll`` instead of unaligned slices (which fault Mosaic).

A custom VJP provides a fused backward kernel for the *waveform* gradient
(the style-transfer hot path optimizes x with frozen weights, reference
methods.py:133-137; weight cotangents are returned as zeros and the
training path keeps using the XLA conv composition).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

DEFAULT_TILE = 2048
_ALIGN = 8


def _pick_tile(t: int, h: int = 0) -> int:
    """Largest power-of-two tile dividing t that fits VMEM with halo h.

    The backward kernel's scoped VMEM scales with (tile + 4h); tile 4096 at
    h=512 overflows the 16 MB budget, while small-dilation layers (24 of 30)
    comfortably fit a 4096 tile — fewer grid programs, less per-program
    overhead.
    """
    budget = 4096 if h <= 128 else DEFAULT_TILE
    tile = min(t, budget)
    while t % tile:
        tile //= 2
    return max(tile, _ALIGN)


def _halo(d: int) -> int:
    return -(-d // _ALIGN) * _ALIGN  # round up to sublane multiple


def _relu(v):
    """ReLU that avoids bf16 vector compares (unsupported by Mosaic)."""
    if v.dtype == jnp.float32:
        return jnp.maximum(v, 0.0)
    return jnp.where(v.astype(jnp.float32) > 0.0, v, jnp.zeros_like(v))


def _pos_mask(v):
    """(v > 0) computed in f32 for narrow dtypes."""
    return v.astype(jnp.float32) > 0.0


def _taps(r_ext, h: int, d: int, n: int):
    """(x[t-d], x[t], x[t+d]) rows for n center rows; slices 8-aligned.

    ``r_ext`` covers rows [start - h, start + n + h) of the signal.
    """
    center = r_ext[h : h + n]
    if d % _ALIGN == 0:
        left = r_ext[h - d : h - d + n]
        right = r_ext[h + d : h + d + n]
    else:
        # roll(+d) moves row j to j+d, so [h : h+n] reads rows [h-d, ...).
        # (pltpu.roll requires non-negative shifts: -d == rows - d mod rows.
        # Mosaic's rotate only handles 32-bit data, so roll narrow dtypes
        # through f32 — this costs a cast on 3 of 30 layers only.)
        rows = r_ext.shape[0]
        dtype = r_ext.dtype
        r32 = r_ext if dtype == jnp.float32 else r_ext.astype(jnp.float32)
        left = pltpu.roll(r32, d, 0)[h : h + n].astype(dtype)
        right = pltpu.roll(r32, rows - d, 0)[h : h + n].astype(dtype)
    return left, center, right


# ---------------------------------------------------------------------- #
# Forward kernel
# ---------------------------------------------------------------------- #


def _fwd_kernel(d: int, h: int, tile: int, x_pad_ref, x_ref, w0_ref, w1_ref,
                w2_ref, b1_ref, wr_ref, b2_ref, out_ref, scratch, sem):
    i = pl.program_id(0)
    # halo-extended input tile: rows [i*tile, i*tile + tile + 2h) of x_pad
    dma = pltpu.make_async_copy(
        x_pad_ref.at[pl.ds(i * tile, tile + 2 * h)], scratch, sem
    )
    dma.start()
    dma.wait()

    r = _relu(scratch[:])
    left, center, right = _taps(r, h, d, tile)
    y = jnp.dot(left, w0_ref[:], preferred_element_type=jnp.float32)
    y += jnp.dot(center, w1_ref[:], preferred_element_type=jnp.float32)
    y += jnp.dot(right, w2_ref[:], preferred_element_type=jnp.float32)
    y = y + b1_ref[:]          # f32 accumulator
    v = jnp.maximum(y, 0.0).astype(x_ref.dtype)
    z = jnp.dot(v, wr_ref[:], preferred_element_type=jnp.float32) + b2_ref[:]
    out_ref[:] = x_ref[:] + z.astype(x_ref.dtype)


def _fwd(x, w_dil, b_dil, w_res, b_res, dilation: int):
    t, c = x.shape
    h = _halo(dilation)
    tile = _pick_tile(t, h)
    x_pad = jnp.pad(x, ((h, h), (0, 0)))

    kernel = functools.partial(_fwd_kernel, dilation, h, tile)
    return pl.pallas_call(
        kernel,
        grid=(t // tile,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),  # x_pad: manual halo DMA
            pl.BlockSpec((tile, c), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),  # w0
            pl.BlockSpec(memory_space=pltpu.VMEM),  # w1
            pl.BlockSpec(memory_space=pltpu.VMEM),  # w2
            pl.BlockSpec(memory_space=pltpu.VMEM),  # b1
            pl.BlockSpec(memory_space=pltpu.VMEM),  # wr
            pl.BlockSpec(memory_space=pltpu.VMEM),  # b2
        ],
        out_specs=pl.BlockSpec((tile, c), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((t, c), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((tile + 2 * h, c), x.dtype),
            pltpu.SemaphoreType.DMA(()),
        ],
    )(x_pad, x, w_dil[0], w_dil[1], w_dil[2], b_dil[None, :], w_res[0],
      b_res[None, :])


# ---------------------------------------------------------------------- #
# Backward kernel (waveform gradient only; weights are frozen in transfer)
# ---------------------------------------------------------------------- #


def _bwd_kernel(d: int, h: int, tile: int, x_pad2_ref, g_pad_ref, x_ref,
                g_ref, w0_ref, w1_ref, w2_ref, b1_ref, wr_ref, out_ref,
                x_scratch, g_scratch, sems):
    i = pl.program_id(0)
    ext = tile + 2 * h
    # x halo of 2h: rows [i*tile, i*tile + tile + 4h) of x_pad2
    dma_x = pltpu.make_async_copy(
        x_pad2_ref.at[pl.ds(i * tile, tile + 4 * h)], x_scratch, sems.at[0]
    )
    # g halo of h: rows [i*tile, i*tile + tile + 2h) of g_pad
    dma_g = pltpu.make_async_copy(
        g_pad_ref.at[pl.ds(i * tile, tile + 2 * h)], g_scratch, sems.at[1]
    )
    dma_x.start()
    dma_g.start()
    dma_x.wait()
    dma_g.wait()

    r = _relu(x_scratch[:])  # [tile + 4h, C]
    # recompute y on the extended window [i*tile - h, i*tile + tile + h):
    # r covers an h-halo around that window.
    left, center, right = _taps(r, h, d, ext)
    y = jnp.dot(left, w0_ref[:], preferred_element_type=jnp.float32)
    y += jnp.dot(center, w1_ref[:], preferred_element_type=jnp.float32)
    y += jnp.dot(right, w2_ref[:], preferred_element_type=jnp.float32)
    y = y + b1_ref[:]

    g_ext = g_scratch[:]  # zeros outside the sequence -> dy zero there
    dv = jnp.dot(g_ext, wr_ref[:].T, preferred_element_type=jnp.float32)
    dy = jnp.where(y > 0.0, dv, 0.0).astype(x_ref.dtype)  # [ext, C] (y is f32)

    # The k-th tap reads x[t + o_k] (o in {-d, 0, +d}), so its contribution
    # to dx[t] comes from dy at t - o_k.
    dy_left, dy_center, dy_right = _taps(dy, h, d, tile)
    dr = jnp.dot(dy_right, w0_ref[:].T, preferred_element_type=jnp.float32)
    dr += jnp.dot(dy_center, w1_ref[:].T, preferred_element_type=jnp.float32)
    dr += jnp.dot(dy_left, w2_ref[:].T, preferred_element_type=jnp.float32)

    x_center = x_scratch[2 * h : tile + 2 * h]
    dx = g_ref[:] + jnp.where(
        _pos_mask(x_center), dr.astype(x_ref.dtype), jnp.zeros((), x_ref.dtype)
    )
    out_ref[:] = dx


def _bwd(x, g, w_dil, b_dil, w_res, dilation: int):
    t, c = x.shape
    h = _halo(dilation)
    tile = _pick_tile(t, h)
    x_pad2 = jnp.pad(x, ((2 * h, 2 * h), (0, 0)))
    g_pad = jnp.pad(g, ((h, h), (0, 0)))

    kernel = functools.partial(_bwd_kernel, dilation, h, tile)
    return pl.pallas_call(
        kernel,
        grid=(t // tile,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),  # x_pad2
            pl.BlockSpec(memory_space=pl.ANY),  # g_pad
            pl.BlockSpec((tile, c), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, c), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),  # w0
            pl.BlockSpec(memory_space=pltpu.VMEM),  # w1
            pl.BlockSpec(memory_space=pltpu.VMEM),  # w2
            pl.BlockSpec(memory_space=pltpu.VMEM),  # b1
            pl.BlockSpec(memory_space=pltpu.VMEM),  # wr
        ],
        out_specs=pl.BlockSpec((tile, c), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((t, c), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((tile + 4 * h, c), x.dtype),
            pltpu.VMEM((tile + 2 * h, c), x.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )(x_pad2, g_pad, x, g, w_dil[0], w_dil[1], w_dil[2], b_dil[None, :],
      w_res[0])


# ---------------------------------------------------------------------- #
# custom_vjp wiring
# ---------------------------------------------------------------------- #


@functools.partial(jax.custom_vjp, nondiff_argnums=(5,))
def fused_encoder_block(x, w_dil, b_dil, w_res, b_res, dilation: int):
    """Fused residual encoder block on [T, C] activations.

    Equivalent to (reference model.py:99-114):
        x + conv1x1(relu(dilated_conv3(relu(x), dilation)), w_res)
    with non-causal SAME padding.

    Gradients: the waveform cotangent (dx) runs through the fused Pallas
    backward kernel (the transfer hot path). Weight/bias cotangents are
    computed by an XLA recompute of the block — when the weights are frozen
    (transfer), those cotangents are unused and XLA dead-code-eliminates the
    recompute, so the hot path pays nothing; when a training loss
    differentiates through the fused path, the weight gradients are correct
    instead of silently zero.
    """
    return _fwd(x, w_dil, b_dil, w_res, b_res, dilation)


def _vjp_fwd(x, w_dil, b_dil, w_res, b_res, dilation: int):
    out = _fwd(x, w_dil, b_dil, w_res, b_res, dilation)
    return out, (x, w_dil, b_dil, w_res, b_res)


def _vjp_bwd(dilation: int, res, g):
    x, w_dil, b_dil, w_res, b_res = res
    dx = _bwd(x, g, w_dil, b_dil, w_res, dilation)
    # Weight-side VJP through the unfused XLA composition (recompute; pruned
    # by DCE whenever the caller does not consume weight cotangents).
    _, pull = jax.vjp(
        lambda wd, bd, wr, br: reference_encoder_block(x, wd, bd, wr, br, dilation),
        w_dil, b_dil, w_res, b_res,
    )
    dw_dil, db_dil, dw_res, db_res = pull(g)
    return dx, dw_dil, db_dil, dw_res, db_res


fused_encoder_block.defvjp(_vjp_fwd, _vjp_bwd)


def reference_encoder_block(x, w_dil, b_dil, w_res, b_res, dilation: int):
    """Unfused XLA composition of the same block (correctness oracle)."""
    from audio_style_transfer_tpu.ops.conv import conv1d

    xb = x[None]
    r = jax.nn.relu(xb)
    y = conv1d(r, w_dil, b_dil, dilation=dilation, causal=False)
    v = jax.nn.relu(y)
    z = conv1d(v, w_res, b_res)
    return (xb + z)[0]
