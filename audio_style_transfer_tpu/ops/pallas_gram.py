"""Pallas all-pairs channel-wise gram kernel.

The "ours" style statistic (reference methods.py:62-76) needs
``G[c, a, b] = sum_t E_a[t, c] * E_b[t, c]`` over every pair of the L
selected encoder taps.  As an XLA composition (transfer/grams.py) each of
the L*(L+1)/2 pair products re-reads its two taps from HBM, so the full-
stack config (L=30, 465 pairs, [16384, 128] taps) moves gigabytes per
evaluation and the gram dominates the transfer hot loop (~2.8 ms of a
5.2 ms eval, round-2 profile on v5e).

This kernel tiles the time axis and keeps all L tap tiles in VMEM at once,
so every tap is read from HBM exactly once per evaluation:

  * forward: 465 pairwise multiply+column-sum ops on the VPU per tile,
    f32 accumulation into a VMEM-resident [L, L, C] output (symmetric
    pairs computed once, written twice);
  * backward (the L-BFGS hot path differentiates the gram w.r.t. the
    waveform): dE_a = sum_b (g + g^T)[a, b, :] * E_b — L^2 broadcast-FMA
    ops per tile, again with single-read HBM traffic.

Inputs are the taps in their native [B, T, C] layout (no transposes — the
[C, L, T] form forced ~40 MB of XLA layout copies around the fused-encoder
custom-calls, see BENCH_NOTES.md).  bf16 taps are multiplied in f32,
matching the XLA path's accumulation semantics exactly.

Batching: vmap flattens the leading axes into one kernel launch (grams are
independent per clip), so the 8-clip batched transfer (bench config 4)
runs the same kernel.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Scoped-VMEM budget for the resident tap tiles (double-buffered by the
# pipeline), their one-time f32 conversions (each tap tile is reused by
# ~L/2 pairs, so the converted set is materialized once per grid step and
# must be budgeted — omitting it blew the 16 MB scoped limit at
# L=10/T=16384/tile=2048: 20.8 MB requested), plus the [L, L, C]
# accumulator / cotangent blocks.
_VMEM_BUDGET = 12 * 1024 * 1024


def _pick_tile(
    t: int, nl: int, c: int, itemsize: int, n_streams: int, batched: bool
) -> int:
    """Largest power-of-two tile dividing t whose pipeline footprint fits.

    ``n_streams`` counts the [tile, C] arrays in flight per tap (inputs
    plus outputs for the backward kernel), each double-buffered. Every
    tap additionally holds one f32-converted [tile, C] copy live across
    the pair loop. With a batch grid dimension Mosaic keeps extra buffers
    in flight around the revisited output block (measured: B=8/L=10/
    tile=1024 blew the 16 MB scoped limit at a nominal 5.2 MB footprint),
    so the batched launch budgets half.
    """
    budget = _VMEM_BUDGET // 2 if batched else _VMEM_BUDGET
    tile = min(t, 4096)
    while t % tile:
        tile //= 2
    per_row = nl * c * (itemsize * 2 * n_streams + 4)
    while tile > 8 and tile * per_row > budget:
        tile //= 2
    return max(tile, 8)


def _fwd_kernel(nl: int, *refs):
    taps = refs[:nl]
    out_ref = refs[nl]
    i = pl.program_id(1)

    @pl.when(i == 0)
    def _init():
        out_ref[...] = jnp.zeros_like(out_ref)

    fl = [t[0].astype(jnp.float32) for t in taps]  # each [tile, C]
    sums = {}
    for a in range(nl):
        for b in range(a, nl):
            sums[(a, b)] = jnp.sum(fl[a] * fl[b], axis=0)  # [C]
    for a in range(nl):
        row = jnp.stack(
            [sums[(min(a, b), max(a, b))] for b in range(nl)], axis=0
        )  # [L, C]
        out_ref[0, a] += row


def _fwd(taps):
    nl = len(taps)
    b, t, c = taps[0].shape
    tile = _pick_tile(t, nl, c, taps[0].dtype.itemsize, n_streams=1,
                      batched=b > 1)
    grid = (b, t // tile)
    tap_spec = pl.BlockSpec((1, tile, c), lambda bi, i: (bi, i, 0))
    return pl.pallas_call(
        functools.partial(_fwd_kernel, nl),
        grid=grid,
        in_specs=[tap_spec] * nl,
        out_specs=pl.BlockSpec((1, nl, nl, c), lambda bi, i: (bi, 0, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b, nl, nl, c), jnp.float32),
    )(*taps)


def _bwd_kernel(nl: int, h_ref, *refs):
    taps = refs[:nl]
    douts = refs[nl:]
    fl = [t[0].astype(jnp.float32) for t in taps]
    for a in range(nl):
        acc = h_ref[0, a, 0][None, :] * fl[0]
        for bb in range(1, nl):
            acc += h_ref[0, a, bb][None, :] * fl[bb]
        douts[a][0] = acc.astype(douts[a].dtype)


def _bwd(taps, h):
    """dtaps given the symmetrized cotangent h = g + g^T ([B, L, L, C] f32)."""
    nl = len(taps)
    b, t, c = taps[0].shape
    dtype = taps[0].dtype
    tile = _pick_tile(t, nl, c, dtype.itemsize, n_streams=2, batched=b > 1)
    # Measured tile optimum for the L^2 broadcast-FMA sweep (L=30,
    # T=16384, v5e round-3): 64 -> 812 us, 128 -> 733, 256 -> 853.
    # The backward wants SMALLER tiles than the VMEM bound allows (the
    # L^2 accumulation chains schedule better on short windows), while
    # the forward's pair-reduction prefers the larger budget-driven tile
    # (256 -> 422 us vs 128 -> 480).  Only apply the cap when it keeps
    # the tile-divides-T invariant _pick_tile guaranteed (e.g. T=320
    # capped to 128 would leave the trailing T mod 128 cotangent rows
    # unwritten).
    if t % 128 == 0:
        tile = min(tile, 128)
    assert t % tile == 0, (t, tile)
    grid = (b, t // tile)
    tap_spec = pl.BlockSpec((1, tile, c), lambda bi, i: (bi, i, 0))
    return pl.pallas_call(
        functools.partial(_bwd_kernel, nl),
        grid=grid,
        in_specs=[pl.BlockSpec((1, nl, nl, c), lambda bi, i: (bi, 0, 0, 0))]
        + [tap_spec] * nl,
        out_specs=[tap_spec] * nl,
        out_shape=[jax.ShapeDtypeStruct((b, t, c), dtype)] * nl,
    )(h, *taps)


def _flatten_leading(x, keep: int):
    return x.reshape((-1,) + x.shape[-keep:])


@jax.custom_batching.custom_vmap
def _batchable_fwd(*taps):
    return _fwd(taps)


@_batchable_fwd.def_vmap
def _fwd_vmap_rule(axis_size, in_batched, *taps):
    if not all(in_batched):
        raise NotImplementedError(
            "pair_gram: all taps must be vmapped together (they derive from "
            f"the same waveform); got in_batched={in_batched}"
        )
    shp = taps[0].shape  # [V, B, T, C]
    flat = [_flatten_leading(t, 2) for t in taps]  # [V*B, T, C]
    out = _fwd(flat)
    return out.reshape(shp[:-2] + out.shape[-3:]), True


@jax.custom_batching.custom_vmap
def _batchable_bwd(h, *taps):
    return _bwd(taps, h)


@_batchable_bwd.def_vmap
def _bwd_vmap_rule(axis_size, in_batched, h, *taps):
    if not all(in_batched):
        raise NotImplementedError(
            "pair_gram backward: cotangent and taps must all be vmapped; "
            f"got in_batched={in_batched}"
        )
    shp = taps[0].shape
    flat = [_flatten_leading(t, 2) for t in taps]  # [V*B, T, C]
    outs = _bwd(flat, _flatten_leading(h, 3))  # h: [V*B, L, L, C]
    return tuple(o.reshape(shp) for o in outs), tuple(True for _ in outs)


@jax.custom_vjp
def pair_gram(*taps):
    """All-pairs channel-wise gram of L taps, each [B, T, C].

    Returns [B, L, L, C] float32 with
    ``out[n, a, b, c] = sum_t taps[a][n, t, c] * taps[b][n, t, c]``
    (f32 products/accumulation regardless of the tap dtype — the same
    semantics as the XLA pairwise path in transfer/grams.py).
    """
    return _batchable_fwd(*taps)


def _vjp_fwd(*taps):
    return _batchable_fwd(*taps), taps


# Below this many taps the backward runs as an XLA composition instead of
# the Pallas kernel: at L=10/T=16384 (stack mode) the kernel's backward
# measured 171 us vs XLA's ~110 (the L^2 broadcast-FMA sweep fuses well
# in XLA until the tap re-read traffic dominates), while the FORWARD
# kernel already wins there (56 vs 82 us).  At L=30 the kernel wins both
# directions (round-2/3 profiles).
_XLA_BWD_MAX_L = 15
# ... but only at engine-window lengths: at T=229376 (exact long-form
# mode) XLA emits TEN separate cotangent fusions that each re-read every
# tap — 806 us apiece, 5.6 GB/eval of tap traffic (round-4 device
# trace) — where the kernel reads each tap once.  The tap re-read
# traffic grows linearly with T while the fusion's small-T advantage
# does not, so the composition is gated on T as well.
_XLA_BWD_MAX_T = 32768


def _vjp_bwd(taps, g):
    h = (g + jnp.swapaxes(g, 1, 2)).astype(jnp.float32)
    nl = len(taps)
    if nl <= _XLA_BWD_MAX_L and taps[0].shape[1] <= _XLA_BWD_MAX_T:
        fl = [t.astype(jnp.float32) for t in taps]
        outs = []
        for a in range(nl):
            acc = h[:, a, 0, :][:, None, :] * fl[0]
            for b in range(1, nl):
                acc = acc + h[:, a, b, :][:, None, :] * fl[b]
            outs.append(acc.astype(taps[a].dtype))
        return tuple(outs)
    return _batchable_bwd(h, *taps)


pair_gram.defvjp(_vjp_fwd, _vjp_bwd)


def pair_gram_reference(*taps):
    """XLA oracle with identical semantics (tests).

    precision=HIGHEST: the oracle must accumulate in true f32 like the
    kernel (and like the production elementwise-product path in
    transfer/grams.py) — at some shapes XLA's CPU backend otherwise picks
    a reduced-precision dot (measured 0.26 abs error vs f64 at T=320
    while the kernel sat at 3e-5).
    """
    stacked = jnp.stack([t.astype(jnp.float32) for t in taps], axis=1)
    return jnp.einsum("nats,nbts->nabs", stacked, stacked,
                      precision=jax.lax.Precision.HIGHEST)
