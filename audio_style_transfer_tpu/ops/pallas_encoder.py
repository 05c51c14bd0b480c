"""Pallas-fused WaveNet encoder residual block.

One encoder layer of the reference model (model.py:96-116) is

    out = x + W_res @ relu( DilatedConv3( relu(x) ) )

XLA executes this as conv + several elementwise kernels, writing ~3
intermediate [T, 128] arrays to HBM per layer.  This kernel fuses the whole
block into a single pass per time tile:

  * the three conv taps become three [TILE, C] x [C, C] MXU matmuls over a
    halo-extended tile, DMA'd straight from the UNPADDED input (three
    static-size copies per tile: center + two halos; out-of-clip halo rows
    are zero-filled in VMEM, and relu(0) @ W = 0 reproduces SAME-padding
    semantics exactly — no padded copy is ever materialized in HBM);
  * relu / bias / residual-add run on the VPU in the same kernel;
  * HBM traffic drops from ~5 arrays/layer to read-x + write-out.

Alignment: HBM memref slices must start at sublane-tile multiples (16 rows
for bf16, 8 for f32), so the halo H is the dilation rounded up to a
multiple of 16; for dilations < 8 the ±d taps are produced with
``pltpu.roll`` instead of unaligned slices (which fault Mosaic).

Batching: vmap over the activations flattens [B, T, C] to [B*T, C] and
runs ONE kernel launch whose per-clip halo zeroing keeps clips independent
(custom_vmap rules on the fwd/bwd wrappers).

A custom VJP provides a fused backward kernel for the *waveform* gradient
(the style-transfer hot path optimizes x with frozen weights, reference
methods.py:133-137). Weight cotangents are computed by an XLA recompute of
the block — dead-code-eliminated when unused, correct when a training loss
differentiates through the fused path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

DEFAULT_TILE = 2048
_ALIGN = 8


# Mosaic's scoped-VMEM stack limit is 16 MB; leave headroom for the
# register allocator's own spills and the double-buffered out pipeline.
_SCOPED_VMEM_BUDGET = 13 * 1024 * 1024


def _pick_tile(t: int, h: int, c: int, itemsize: int, kind: str) -> int:
    """Largest power-of-two tile dividing t whose kernel fits scoped VMEM.

    Estimates the kernel's VMEM stack: the ping-pong scratch slot pair
    (cross-grid DMA prefetch), the double-buffered out block, and the f32
    intermediates the compute body materializes ([ext, C] tensors for
    y/dy/dr in the backward, y/z in the forward). Conservative on purpose:
    a too-small tile costs a few extra grid programs, a too-large one is a
    compile-time scoped-vmem OOM.
    """
    s = itemsize
    tile = min(t, 4096)
    while t % tile:
        tile //= 2

    def est(tile: int) -> int:
        if kind == "bwd":
            ext = tile + 2 * h
            slots = 2 * (tile + 4 * h) * s + 2 * ext * s
            temps = (tile + 4 * h) * 4 + ext * 4 * 3
        else:
            ext = tile + 2 * h
            slots = 2 * ext * s
            temps = ext * 4 + tile * 4 * 2
        out = 2 * tile * s
        return c * (slots + temps + out)

    while tile > _ALIGN and est(tile) > _SCOPED_VMEM_BUDGET:
        tile //= 2
    return max(tile, _ALIGN)


def _halo(d: int) -> int:
    # Round up to 16 rows: HBM memref slices (the manual halo DMAs) must be
    # aligned to the sublane tiling, which is 16 for bf16 (8 for f32).
    return -(-d // 16) * 16


def _relu(v):
    """ReLU as a max (Mosaic handles bf16 max natively; bf16 vector
    *compares* are what it rejects — see _pos_mask)."""
    return jnp.maximum(v, jnp.zeros((), v.dtype))


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


def _halo_copy_in(x_ref, scratch, sems, i, tile: int, h: int, cp: int):
    """Fill ``scratch`` [tile + 2h, C] with rows [i*tile - h, i*tile + tile + h)
    of the UNPADDED [rows, C] array ``x_ref`` — zeros outside the clip.

    Three static-size DMAs (center + two halos, edge ones zero-filled
    instead) rather than one copy from a pre-padded array: XLA's jnp.pad
    materialized a full padded copy in HBM per layer (~0.4 ms/eval across
    the 30-layer fwd+bwd stack, measured in the round-2 profile).

    ``cp`` is the number of grid programs per clip: rows may hold several
    independent clips back to back (the batched path flattens [B, T, C] to
    [B*T, C]); programs at clip boundaries zero their out-of-clip halo so
    clips never leak into each other — identical numerics to per-clip SAME
    padding.
    """
    pos = jax.lax.rem(i, cp)
    pltpu.make_async_copy(
        x_ref.at[pl.ds(i * tile, tile)],
        scratch.at[pl.ds(h, tile)],
        sems.at[0],
    ).start()

    @pl.when(pos == 0)
    def _zero_left():
        scratch[0:h] = jnp.zeros((h, scratch.shape[1]), scratch.dtype)

    @pl.when(pos > 0)
    def _left():
        pltpu.make_async_copy(
            x_ref.at[pl.ds(pl.multiple_of(i * tile - h, 16), h)],
            scratch.at[pl.ds(0, h)],
            sems.at[1],
        ).start()

    @pl.when(pos == cp - 1)
    def _zero_right():
        scratch[h + tile : 2 * h + tile] = jnp.zeros(
            (h, scratch.shape[1]), scratch.dtype
        )

    @pl.when(pos < cp - 1)
    def _right():
        pltpu.make_async_copy(
            x_ref.at[pl.ds(pl.multiple_of((i + 1) * tile, 16), h)],
            scratch.at[pl.ds(h + tile, h)],
            sems.at[2],
        ).start()


def _halo_wait(sems, i, cp: int, x_ref, scratch, tile: int, h: int):
    """Wait for the DMAs started by :func:`_halo_copy_in`."""
    pos = jax.lax.rem(i, cp)
    pltpu.make_async_copy(
        x_ref.at[pl.ds(i * tile, tile)], scratch.at[pl.ds(h, tile)],
        sems.at[0],
    ).wait()

    @pl.when(pos > 0)
    def _left():
        pltpu.make_async_copy(
            x_ref.at[pl.ds(pl.multiple_of(i * tile - h, 16), h)],
            scratch.at[pl.ds(0, h)],
            sems.at[1],
        ).wait()

    @pl.when(pos < cp - 1)
    def _right():
        pltpu.make_async_copy(
            x_ref.at[pl.ds(pl.multiple_of((i + 1) * tile, 16), h)],
            scratch.at[pl.ds(h + tile, h)],
            sems.at[2],
        ).wait()


def _fwd_kernel(d: int, h: int, tile: int, cp: int, nprog: int, x_ref,
                w0_ref, w1_ref, w2_ref, b1_ref, wr_ref, b2_ref, out_ref,
                scratch, sems):
    """The residual-add input is the scratch's center rows (x itself) — x is
    read from HBM exactly once, with no padded copy materialized.

    Cross-grid ping-pong prefetch: program i starts block i+1's halo DMAs
    into the alternate scratch slot BEFORE waiting on its own, so the next
    tile streams from HBM while this tile's matmuls run (grid programs
    execute sequentially; their DMAs don't). Numerically identical to the
    single-buffered scheme — only the copy scheduling changes.
    """
    i = pl.program_id(0)
    even = jax.lax.rem(i, 2) == 0

    @pl.when(i == 0)
    def _own_first():
        _halo_copy_in(x_ref, scratch.at[0], sems.at[0], i, tile, h, cp)

    @pl.when((i + 1 < nprog) & even)
    def _prefetch_odd():
        _halo_copy_in(x_ref, scratch.at[1], sems.at[1], i + 1, tile, h, cp)

    @pl.when((i + 1 < nprog) & ~even)
    def _prefetch_even():
        _halo_copy_in(x_ref, scratch.at[0], sems.at[0], i + 1, tile, h, cp)

    @pl.when(even)
    def _wait_even():
        _halo_wait(sems.at[0], i, cp, x_ref, scratch.at[0], tile, h)

    @pl.when(~even)
    def _wait_odd():
        _halo_wait(sems.at[1], i, cp, x_ref, scratch.at[1], tile, h)

    buf = scratch[jax.lax.rem(i, 2)]
    r = _relu(buf)
    left, center, right = _taps(r, h, d, tile)
    y = jnp.dot(left, w0_ref[:], preferred_element_type=jnp.float32)
    y += jnp.dot(center, w1_ref[:], preferred_element_type=jnp.float32)
    y += jnp.dot(right, w2_ref[:], preferred_element_type=jnp.float32)
    y = y + b1_ref[:]          # f32 accumulator
    v = jnp.maximum(y, 0.0).astype(out_ref.dtype)
    z = jnp.dot(v, wr_ref[:], preferred_element_type=jnp.float32) + b2_ref[:]
    out_ref[:] = buf[h : h + tile] + z.astype(out_ref.dtype)


def _fwd(x, w_dil, b_dil, w_res, b_res, dilation: int, clip_rows: int | None = None):
    t, c = x.shape
    clip_rows = clip_rows or t
    assert t % clip_rows == 0
    h = _halo(dilation)
    tile = _pick_tile(clip_rows, h, c, x.dtype.itemsize, "fwd")
    nprog = t // tile

    kernel = functools.partial(_fwd_kernel, dilation, h, tile,
                               clip_rows // tile, nprog)
    return pl.pallas_call(
        kernel,
        grid=(nprog,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),  # x: manual halo DMA
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
            pltpu.VMEM((2, tile + 2 * h, c), x.dtype),  # ping-pong slots
            pltpu.SemaphoreType.DMA((2, 3)),
        ],
    )(x, w_dil[0], w_dil[1], w_dil[2], b_dil[None, :], w_res[0],
      b_res[None, :])


# ---------------------------------------------------------------------- #
# Backward kernel (waveform gradient only; weights are frozen in transfer)
# ---------------------------------------------------------------------- #


def _bwd_kernel(d: int, h: int, tile: int, cp: int, nprog: int, x_ref,
                g_ref, w0_ref, w1_ref, w2_ref, b1_ref, wr_ref, out_ref,
                x_scratch, g_scratch, sems):
    """Cross-grid ping-pong prefetch of both operands (see _fwd_kernel):
    program i streams block i+1's x/g halo tiles into the alternate slots
    while its own matmuls run. (An earlier WITHIN-program double-buffer
    variant halved the tile to fit scoped VMEM and measured slower; the
    cross-grid scheme keeps the full tile — the slot pair still fits.)"""
    i = pl.program_id(0)
    ext = tile + 2 * h
    even = jax.lax.rem(i, 2) == 0

    def start(slot, blk):
        # x with a 2h halo, g with an h halo — both from unpadded arrays.
        _halo_copy_in(x_ref, x_scratch.at[slot], sems.at[slot, 0], blk,
                      tile, 2 * h, cp)
        _halo_copy_in(g_ref, g_scratch.at[slot], sems.at[slot, 1], blk,
                      tile, h, cp)

    def wait(slot, blk):
        _halo_wait(sems.at[slot, 0], blk, cp, x_ref, x_scratch.at[slot],
                   tile, 2 * h)
        _halo_wait(sems.at[slot, 1], blk, cp, g_ref, g_scratch.at[slot],
                   tile, h)

    @pl.when(i == 0)
    def _own_first():
        start(0, i)

    @pl.when((i + 1 < nprog) & even)
    def _prefetch_odd():
        start(1, i + 1)

    @pl.when((i + 1 < nprog) & ~even)
    def _prefetch_even():
        start(0, i + 1)

    @pl.when(even)
    def _wait_even():
        wait(0, i)

    @pl.when(~even)
    def _wait_odd():
        wait(1, i)

    slot = jax.lax.rem(i, 2)
    x_buf = x_scratch[slot]
    g_buf = g_scratch[slot]

    r = _relu(x_buf)  # [tile + 4h, C]
    # recompute y on the extended window [i*tile - h, i*tile + tile + h):
    # r covers an h-halo around that window.
    left, center, right = _taps(r, h, d, ext)
    y = jnp.dot(left, w0_ref[:], preferred_element_type=jnp.float32)
    y += jnp.dot(center, w1_ref[:], preferred_element_type=jnp.float32)
    y += jnp.dot(right, w2_ref[:], preferred_element_type=jnp.float32)
    y = y + b1_ref[:]

    g_ext = g_buf  # zeros outside the sequence -> dy zero there
    dtype = out_ref.dtype
    dv = jnp.dot(g_ext, wr_ref[:].T, preferred_element_type=jnp.float32)
    dy = jnp.where(y > 0.0, dv, 0.0).astype(dtype)  # [ext, C] (y is f32)

    # The k-th tap reads x[t + o_k] (o in {-d, 0, +d}), so its contribution
    # to dx[t] comes from dy at t - o_k.
    dy_left, dy_center, dy_right = _taps(dy, h, d, tile)
    dr = jnp.dot(dy_right, w0_ref[:].T, preferred_element_type=jnp.float32)
    dr += jnp.dot(dy_center, w1_ref[:].T, preferred_element_type=jnp.float32)
    dr += jnp.dot(dy_left, w2_ref[:].T, preferred_element_type=jnp.float32)

    # g center rows are g itself — read from HBM once via the halo DMA.
    x_center = x_buf[2 * h : tile + 2 * h]
    dx = g_buf[h : h + tile] + jnp.where(
        _pos_mask(x_center), dr.astype(dtype), jnp.zeros((), dtype)
    )
    out_ref[:] = dx


def _bwd(x, g, w_dil, b_dil, w_res, dilation: int, clip_rows: int | None = None):
    t, c = x.shape
    clip_rows = clip_rows or t
    assert t % clip_rows == 0
    h = _halo(dilation)
    tile = _pick_tile(clip_rows, h, c, x.dtype.itemsize, "bwd")

    nprog = t // tile
    kernel = functools.partial(_bwd_kernel, dilation, h, tile,
                               clip_rows // tile, nprog)
    return pl.pallas_call(
        kernel,
        grid=(nprog,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),  # x (unpadded)
            pl.BlockSpec(memory_space=pl.ANY),  # g (unpadded)
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
            pltpu.VMEM((2, tile + 4 * h, c), x.dtype),  # x ping-pong slots
            pltpu.VMEM((2, tile + 2 * h, c), x.dtype),  # g ping-pong slots
            pltpu.SemaphoreType.DMA((2, 2, 3)),
        ],
    )(x, g, w_dil[0], w_dil[1], w_dil[2], b_dil[None, :],
      w_res[0])


# ---------------------------------------------------------------------- #
# custom_vjp wiring
# ---------------------------------------------------------------------- #


def _only_x_batched(in_batched, what: str):
    if not in_batched[0] or any(in_batched[1:]):
        raise NotImplementedError(
            f"fused encoder {what}: only the activation argument may be "
            f"vmapped (got in_batched={in_batched}); weights are shared "
            "across clips in the batched transfer path"
        )


@functools.lru_cache(maxsize=None)
def _batchable_fwd(dilation: int):
    """_fwd with a custom vmap rule: a batch of clips is flattened to
    [B*T, C] and run through ONE clip-aware kernel launch (the per-clip
    halo zeroing keeps clips independent), instead of rejecting vmap's
    batched ANY-space blocks."""

    @jax.custom_batching.custom_vmap
    def fwd(x, w_dil, b_dil, w_res, b_res):
        return _fwd(x, w_dil, b_dil, w_res, b_res, dilation)

    @fwd.def_vmap
    def _rule(axis_size, in_batched, x, w_dil, b_dil, w_res, b_res):
        _only_x_batched(in_batched, "forward")
        b, t, c = x.shape
        out = _fwd(x.reshape(b * t, c), w_dil, b_dil, w_res, b_res,
                   dilation, clip_rows=t)
        return out.reshape(b, t, c), True

    return fwd


@functools.lru_cache(maxsize=None)
def _batchable_bwd(dilation: int):
    @jax.custom_batching.custom_vmap
    def bwd(x, g, w_dil, b_dil, w_res):
        return _bwd(x, g, w_dil, b_dil, w_res, dilation)

    @bwd.def_vmap
    def _rule(axis_size, in_batched, x, g, w_dil, b_dil, w_res):
        if not (in_batched[0] and in_batched[1]) or any(in_batched[2:]):
            raise NotImplementedError(
                f"fused encoder backward: x and g must both be vmapped and "
                f"weights unbatched (got in_batched={in_batched})"
            )
        b, t, c = x.shape
        out = _bwd(x.reshape(b * t, c), g.reshape(b * t, c),
                   w_dil, b_dil, w_res, dilation, clip_rows=t)
        return out.reshape(b, t, c), True

    return bwd


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

    vmap over the activations (weights shared) flattens the batch into one
    clip-aware kernel launch — the batched transfer path (bench config 4)
    runs fully fused.
    """
    return _batchable_fwd(dilation)(x, w_dil, b_dil, w_res, b_res)


def _vjp_fwd(x, w_dil, b_dil, w_res, b_res, dilation: int):
    out = _batchable_fwd(dilation)(x, w_dil, b_dil, w_res, b_res)
    return out, (x, w_dil, b_dil, w_res, b_res)


def _vjp_bwd(dilation: int, res, g):
    x, w_dil, b_dil, w_res, b_res = res
    dx = _batchable_bwd(dilation)(x, g, w_dil, b_dil, w_res)
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
