"""Chained Pallas kernels for the WaveNet encoder trunk.

The per-layer fused block (ops/pallas_encoder.py) pays one HBM read +
write of a [T, C] activation per layer per direction — at the round-2
operating point the 30-layer transfer eval ran at ~64% of the MXU
roofline with most of the gap in exactly that traffic (BENCH_NOTES.md;
cost driver reference model.py:96-116).  This module chains GROUPS of
consecutive residual blocks into single kernel launches:

  * forward: one launch per group; the group input arrives as THREE
    BlockSpec-pipelined views of the same HBM array (center tile + a
    clamped left/right halo block) assembled into one VMEM window, every
    intermediate activation lives only in VMEM (shrinking valid windows
    per layer), and only the taps a caller asks for are written back to
    HBM.  Letting the Pallas pipeline drive all HBM traffic (instead of
    the round-3 manual DMA ping-pong) overlaps every load/store with the
    previous tile's compute and removed ~35% of the forward kernel time
    (92.7 -> 59.3 us for the [1,2,4,8] group, round-3 A/B);
  * relu masks: the forward stashes ONE int8 array per GROUP packing
    every local layer's output mask ``(x_{j+1} > 0)`` at bit 2j and gate
    mask ``(y_j > 0)`` at bit 2j+1 (2k <= 8 bits) — the backward then
    needs NO activation recompute and never reads activations at all:
    4 matmuls per layer (dv + three transposed conv taps), the
    algorithmic minimum for this block's waveform gradient.  Group-level
    packing shrinks the mask traffic to TWO arrays per backward launch
    (its own + the previous group's, whose top layer holds the group
    input's mask) — 42 per-layer mask loads/eval across the stack-0
    partition became 24;
  * backward: one launch per group; the output cotangent is DMA'd once
    with the group halo, the cotangent chain stays in VMEM, and per-tap
    loss cotangents (style gram / content) are injected at the right
    layer in-kernel.

The custom VJP sits at the WHOLE-TRUNK level (:func:`fused_trunk`): its
outputs are only the taps the transfer loss consumes, so at batch > 1
the arrays crossing the XLA<->Pallas boundary are plain [B, T, C] taps —
the strided gram-cotangent layout that made the per-layer fused path
lose to XLA convs at B=8 (round-2 finding, BENCH_NOTES.md) cannot arise.

Group partitioning is a small dynamic program (:func:`plan_groups`):
a dilation late in its group costs forward halo waste, early costs
backward halo waste, and every extra group costs two kernel launches;
the DP balances the three under the scoped-VMEM budget.

Numerics match the unfused XLA composition bit-exactly in f32 (same
per-row MXU accumulation, same op order as ops/pallas_encoder.py —
asserted in tests/test_pallas_chain.py) and to bf16 rounding otherwise.
"""

from __future__ import annotations

import dataclasses
import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# HBM slices (manual halo DMAs) must start at sublane-tile multiples; the
# int8 mask arrays have (32, 128) tiling, so DMA halos are 32-aligned.
_DMA_ALIGN = 32
# In-VMEM window reads are 16-row aligned: bf16 VMEM tiling is (16, 128),
# so an 8-mod-16 row offset would force a whole-array sublane relayout on
# every slice of the chained activations (f32 only needs 8; the extra
# halo rows cost < 1% extra matmul work at tile >= 2048).
_REF_ALIGN = 16

_SCOPED_VMEM_BUDGET = int(
    os.environ.get("AST_CHAIN_VMEM_BUDGET", 13 * 1024 * 1024)
)
# Merge each layer's three tap matmuls into ONE k=3C MXU contraction
# (concat the taps on lanes, flatten the filter into the contraction
# axis).  Same FLOPs, same f32 accumulation order (the MXU runs the
# k-slabs in tap order either way), one instruction issue instead of
# three — targeting the ~0.14 us/issue overhead the round-3 ablations
# left as the remaining per-layer cost.  A/B-gated per direction; the
# round-4 TPU A/B (min-of-3, north star): fwd merge 2.124 -> 2.072 s
# with a bit-identical trajectory, so it is the default; the bwd merge
# measured SLOWER (2.072 -> 2.145 s — the dy-slice concat copies plus
# the per-launch weight re-transpose cost more than the two saved
# issues), so the backward keeps the three-dot chain.
_MERGE_FWD = os.environ.get("AST_CHAIN_MERGE_FWD", "1") == "1"
# Backward merge mode: 0 = three transposed tap dots (keeper until round
# 4's N-merge measurement); 1 = K-merge (operand concat — measured SLOWER,
# see above); 2 = N-merge (weights stacked on the output axis, dy read
# once, dr = shifted lane-slices of one [*, 3C] product).
try:
    _MERGE_BWD = int(os.environ.get("AST_CHAIN_MERGE_BWD") or 0)
except ValueError:  # tolerate legacy values like "false"
    _MERGE_BWD = 0
# Wavefront-schedule the backward's in-tile layer chain (round-4 weak #1:
# the serial VPU<->MXU alternation left the measured backward ~20% above
# its matmul floor).  Each tile splits into an A (left) / B (right) half
# at a per-layer receding point; pieces run in the skewed order
# A_0, A_1, B_0, A_2, B_1, ..., B_{k-1} so each adjacent pair is
# data-independent and Mosaic could overlap one piece's matmuls with the
# other's mask/roll/add work.  Bit-identical per row (same operand and
# accumulation order); A/B-gated like the merge modes.
# MEASURED RESULT (round 5, BENCH_NOTES "wavefront-scheduled trunk
# backward"): SLOWER than the serial kernel in an identical-plan
# interleaved A/B (+49 us min, +36 us median per eval) — Mosaic emits
# the pieces strictly in program order with no cross-piece MXU/VPU
# overlap, so the half-M matmuls and duplicated dv margin are pure
# overhead.  Kept opt-in as the tested record of the attempt; default
# stays the serial kernel.
_BWD_WAVEFRONT = os.environ.get("AST_CHAIN_BWD_WAVEFRONT", "0") == "1"
# Per-element byte estimate of Mosaic's in-kernel temporaries (the f32
# dilated-conv accumulator + relu'd operand + residual in flight), used
# by the tile picker; env-overridable for tuning experiments.
_INFLIGHT_BYTES = int(os.environ.get("AST_CHAIN_INFLIGHT", 12))


def _al(v: int, m: int) -> int:
    return -(-v // m) * m


# --------------------------------------------------------------------- #
# Group planning
# --------------------------------------------------------------------- #


@dataclasses.dataclass(frozen=True)
class GroupPlan:
    """Static geometry of one chained-kernel group.

    k0: global index of the first layer in the group.
    dils: dilations of the K layers.
    tile: time-tile per grid program (divides clip_rows).
    halo: forward input halo H (32-aligned), halo <= tile.
    suffix: A_j — half-extent of the window layer j is computed on
      (tile + 2*A_j rows; A[K-1] == 0).
    prefix: N_j, j=0..K — backward half-extents (N_0 == 0; dx_j is
      produced on tile + 2*N_j rows; incoming dx_K is loaded with N_K).
    emits: local layer indices whose output tap is written to HBM
      (K-1 is always present — the group output feeds the next group).
    """

    k0: int
    dils: tuple
    tile: int
    halo: int
    suffix: tuple
    prefix: tuple
    emits: tuple

    @property
    def k(self) -> int:
        return len(self.dils)


def _suffix_halos(dils):
    a = [0] * len(dils)
    for j in range(len(dils) - 1, 0, -1):
        a[j - 1] = _al(a[j] + dils[j], _REF_ALIGN)
    return tuple(a), _al(a[0] + dils[0], _DMA_ALIGN)


def _prefix_halos(dils):
    n = [0]
    for d in dils:
        n.append(_al(n[-1] + d, _DMA_ALIGN))
    return tuple(n)


def _fwd_vmem(tile, halo, c, s, k, n_taps):
    """Pipelined fwd kernel footprint: double-buffered input blocks
    (center + 2 pow2-halo blocks), double-buffered output blocks for the
    n_taps emitted taps plus the ONE packed group-mask array, the
    assembly window scratch, live chain values, and the stacked
    weights.  (Charging a tap buffer per LAYER here was a round-3 bug:
    at itemsize 4 it made every multi-layer group infeasible and the DP
    degenerated to 30 single-layer groups on the f32 path.)"""
    h = _pow2_halo(halo, tile)
    ext = tile + 2 * h
    return (
        2 * ext * c * s                      # input pipeline buffers
        # n_taps taps + the packed group mask + (group 0 only, charged
        # for every group as slack) the input relu mask, double-buffered.
        + 2 * (n_taps * s + 2) * tile * c
        + ext * c * s                        # window scratch
        + ext * c * (_INFLIGHT_BYTES + 2 * s)  # y f32 + chain in flight
        + k * 4 * c * c * s                  # stacked weights
    )


def _bwd_vmem(tile, nk, c, s, k, wavefront=False):
    ext = tile + 2 * nk
    # Serial: dx slot + 2-deep carry + 2-deep tap-cotangent slots (5 ext
    # buffers).  Wavefront: 3-deep carry (dx loads into slot 2, so no
    # separate dx slot) + 3-deep tap-cotangent slots (6 ext buffers).
    # ``wavefront`` is per-candidate: under AST_CHAIN_BWD_WAVEFRONT a
    # group whose split geometry is infeasible at this tile runs the
    # SERIAL kernel (see _bwd_group), so charging it 6 slots would
    # shrink its tile for a buffer it never allocates.
    slots = 6 if wavefront else 5
    return (
        slots * ext * c * s
        + ext * c + tile * c       # packed mask windows (own + prev)
        + ext * c * (_INFLIGHT_BYTES + 2 * s)
        + k * 4 * c * c * s
    )


# Per-launch fixed cost in matmul-rows (one [row, C] x [C, C] MXU pass);
# ~4 us of launch overhead at C=128.  Tuned on the round-3 measurements.
_LAUNCH_ROWS = 24000
_BOUNDARY_ROWS = 4
_FWD_MM = 4
_BWD_MM = 4
# Per-(layer, tile-program) fixed cost in matmul-rows: each grid step
# pays ~8 MXU instruction issues per layer (4 fwd + 4 bwd) whose
# pipeline-fill/weight-load overhead is independent of the row count
# (~0.14 us each, measured round-3 against a single whole-clip matmul:
# a [2048,128]x[128,128] issue ran 0.57 us vs the 0.43 us pro-rata share
# of one [16384,128] matmul).  Bigger tiles amortize it — this term is
# what makes the DP value them.
_TILE_FIXED_ROWS = int(os.environ.get("AST_CHAIN_TILE_FIXED", 5000))
_MAX_TILE = int(os.environ.get("AST_CHAIN_MAX_TILE", 8192))
# A/B hook: fixed group sizes (comma-separated, tiled cyclically over
# the stack) instead of the DP's pick, e.g. AST_CHAIN_PARTITION=4,4,2.
_PARTITION_OVERRIDE = os.environ.get("AST_CHAIN_PARTITION", "")
# Relu-mask compares on bf16 values via a sign-bit int16 bitcast instead
# of a bf16 -> f32 convert + f32 compare.  Semantically identical for
# every non-NaN bf16 (+0 -> 0 -> false, -0 -> -32768 -> false, negatives
# have the sign bit, positives are positive int16) — the bitcast is a
# free reinterpret where the convert is a real VPU pass per layer.
_MASK_BITCAST = os.environ.get("AST_CHAIN_MASK_BITCAST", "0") == "1"


def _gt_zero_i32(v):
    """(v > 0) as i32 for bf16/f32 ``v`` (see _MASK_BITCAST)."""
    if _MASK_BITCAST and v.dtype == jnp.bfloat16:
        return (
            jax.lax.bitcast_convert_type(v, jnp.int16) > 0
        ).astype(jnp.int32)
    if v.dtype != jnp.float32:
        v = v.astype(jnp.float32)
    return (v > 0.0).astype(jnp.int32)


def _group_cost(dils, clip_rows, c, itemsize, n_emit):
    """(cost, tile) for one candidate group, or None if infeasible.

    ``n_emit`` counts the taps this group writes to HBM (the emit set
    members inside the span plus the group output).  Feasibility checks
    BOTH kernels' VMEM models — forward and backward share the partition
    because the packed group-mask layout is keyed to it — and the packed
    masks cap groups at 2k <= 8 bits.
    """
    if 2 * len(dils) > 8:
        return None
    suffix, halo = _suffix_halos(dils)
    prefix = _prefix_halos(dils)
    nk = prefix[-1]
    tile = 1
    while tile * 2 <= min(clip_rows, _MAX_TILE) and clip_rows % (tile * 2) == 0:
        tile *= 2
    best = None
    while tile >= 128:
        wf = (
            _BWD_WAVEFRONT
            and _wavefront_geom(dils, tile, prefix) is not None
        )
        if (
            halo <= tile
            and nk <= tile
            and _fwd_vmem(tile, halo, c, itemsize, len(dils), n_emit)
            <= _SCOPED_VMEM_BUDGET
            and _bwd_vmem(tile, nk, c, itemsize, len(dils), wf)
            <= _SCOPED_VMEM_BUDGET
        ):
            waste = sum(
                2 * (_FWD_MM * a + _BWD_MM * n)
                for a, n in zip(suffix, prefix[:-1])
            )
            # Per-(layer, tile) fixed-issue term models the pipelined
            # forward's residual MXU-issue overhead.
            waste += len(dils) * _TILE_FIXED_ROWS
            # Per-launch boundary HBM traffic: every group reads its
            # input (+halo) and writes its output across ALL clip rows
            # (~512 B/row bf16 both ways + masks), which at HBM speed
            # costs about as much as 4 matmul-row passes.  Without this
            # term the DP drifted to singleton groups at exact-mode clip
            # lengths (clip_rows ~ 10^6): 30 launches re-walking the
            # full dx/mask arrays measured ~1.55x the per-row backward
            # cost of the engine partition (round-4 trace); with it the
            # measured-best [4,3,2,1] is stable from 16384 to 950272.
            cost = (
                (clip_rows // tile) * waste
                + 2 * _LAUNCH_ROWS
                + _BOUNDARY_ROWS * clip_rows
            )
            if best is None or cost < best[0]:
                best = (cost, tile)
        tile //= 2
    return best


@functools.lru_cache(maxsize=None)
def plan_groups(dils: tuple, clip_rows: int, c: int, itemsize: int,
                emit: tuple):
    """Exact-DP partition of the layer stack into chained groups.

    One partition serves both kernels: the backward consumes the packed
    group-mask arrays the forward lays out per group."""
    n = len(dils)

    def n_emit(i, j):
        return len({e for e in emit if i <= e < j} | {j - 1})

    best = [None] * (n + 1)
    best[n] = (0.0, 0)
    for i in range(n - 1, -1, -1):
        for j in range(i + 1, n + 1):
            if best[j] is None:
                continue
            cand = _group_cost(dils[i:j], clip_rows, c, itemsize,
                               n_emit(i, j))
            if cand is None:
                continue
            total = cand[0] + best[j][0]
            if best[i] is None or total < best[i][0]:
                best[i] = (total, j - i)
    if best[0] is None:
        raise ValueError(
            f"no feasible chain partition for dilations={dils} at "
            f"clip_rows={clip_rows}"
        )
    sizes = []
    if _PARTITION_OVERRIDE:
        # A/B hook: comma-separated group sizes, repeated cyclically over
        # the layer stack (e.g. "4,4,2" tiles a 30-layer trunk as
        # [4,4,2]x3).  Feasibility is still checked per group below.
        pat = [int(s) for s in _PARTITION_OVERRIDE.split(",")]
        while sum(sizes) < n:
            sizes.extend(pat)
        assert sum(sizes) == n, (
            f"AST_CHAIN_PARTITION {pat} does not tile {n} layers"
        )
    plans, i = [], 0
    while i < n:
        k = sizes[len(plans)] if sizes else best[i][1]
        g = dils[i : i + k]
        suffix, halo = _suffix_halos(g)
        prefix = _prefix_halos(g)
        cand = _group_cost(g, clip_rows, c, itemsize, n_emit(i, i + k))
        if cand is None:
            raise ValueError(
                f"AST_CHAIN_PARTITION group {len(plans)} (layers {i}..{i + k - 1},"
                f" dilations {g}) is infeasible at clip_rows={clip_rows}:"
                " no tile satisfies the halo/VMEM constraints"
            )
        _, tile = cand
        emits = tuple(sorted({j - i for j in emit if i <= j < i + k} | {k - 1}))
        plans.append(GroupPlan(i, g, tile, halo, suffix, prefix, emits))
        i += k
    return plans


# --------------------------------------------------------------------- #
# In-kernel helpers
# --------------------------------------------------------------------- #


def _halo_load(x_ref, scratch, sems, i, tile, h, cp, start):
    """Start/wait the 3-piece DMA filling scratch[0 : tile+2h] with rows
    [i*tile - h, (i+1)*tile + h) of the unpadded ``x_ref`` — zero-filled
    outside the clip.  (pallas_encoder's scheme, plus h == 0 support.)"""
    pos = jax.lax.rem(i, cp)
    center = pltpu.make_async_copy(
        x_ref.at[pl.ds(i * tile, tile)], scratch.at[pl.ds(h, tile)], sems.at[0]
    )
    (center.start if start else center.wait)()
    if h == 0:
        return

    def left():
        return pltpu.make_async_copy(
            x_ref.at[pl.ds(pl.multiple_of(i * tile - h, _DMA_ALIGN), h)],
            scratch.at[pl.ds(0, h)],
            sems.at[1],
        )

    def right():
        return pltpu.make_async_copy(
            x_ref.at[pl.ds(pl.multiple_of((i + 1) * tile, _DMA_ALIGN), h)],
            scratch.at[pl.ds(h + tile, h)],
            sems.at[2],
        )

    if start:
        @pl.when(pos == 0)
        def _zl():
            scratch[0:h] = jnp.zeros((h, scratch.shape[1]), scratch.dtype)

        @pl.when(pos > 0)
        def _l():
            left().start()

        @pl.when(pos == cp - 1)
        def _zr():
            scratch[h + tile : 2 * h + tile] = jnp.zeros(
                (h, scratch.shape[1]), scratch.dtype
            )

        @pl.when(pos < cp - 1)
        def _r():
            right().start()
    else:
        @pl.when(pos > 0)
        def _lw():
            left().wait()

        @pl.when(pos < cp - 1)
        def _rw():
            right().wait()


def _pow2_halo(halo: int, tile: int) -> int:
    """Smallest power of two >= halo (so halo blocks tile the array).
    halo <= tile and tile is a power of two, so the result divides tile."""
    h = 1
    while h < max(halo, 1):
        h *= 2
    assert tile % h == 0
    return h


def _halo_specs(tile: int, h: int, c: int, nblocks_fn):
    """(center, left, right) BlockSpecs reading rows [i*tile - h,
    (i+1)*tile + h) of a [rows, c] array in units of h-row blocks, with
    the out-of-range edge blocks clamped in-range (the kernel zero-fills
    clip edges itself).  ``nblocks_fn()`` -> rows // h at trace time."""
    rt = tile // h
    nb = nblocks_fn()
    return [
        pl.BlockSpec((tile, c), lambda i: (i, 0)),
        pl.BlockSpec((h, c), lambda i: (jnp.maximum(i * rt - 1, 0), 0)),
        pl.BlockSpec((h, c), lambda i: (jnp.minimum((i + 1) * rt, nb - 1), 0)),
    ]


def _assemble(win_ref, c_blk, l_blk, r_blk, tile, h, pos, cp):
    """Fill win_ref[0 : tile + 2h] with the halo window, zeroing the
    halo rows that fall outside the current clip (pos in [0, cp))."""
    win_ref[h : h + tile] = c_blk[...]
    if h == 0:
        return
    win_ref[0:h] = l_blk[...]
    win_ref[h + tile :] = r_blk[...]

    @pl.when(pos == 0)
    def _zl():
        win_ref[0:h] = jnp.zeros((h, win_ref.shape[1]), win_ref.dtype)

    @pl.when(pos == cp - 1)
    def _zr():
        win_ref[h + tile :] = jnp.zeros((h, win_ref.shape[1]), win_ref.dtype)


def _tap3(r, off: int, d: int, n: int):
    """Rows (off-d, off, off+d), n long, of the in-register value ``r``.
    d < _REF_ALIGN shifts go through pltpu.roll in f32 (Mosaic's rotate
    is 32-bit-only); larger d offsets are sublane-aligned by the plan."""
    center = jax.lax.slice_in_dim(r, off, off + n)
    if d < _REF_ALIGN:
        rows = r.shape[0]
        r32 = r if r.dtype == jnp.float32 else r.astype(jnp.float32)
        left = jax.lax.slice_in_dim(pltpu.roll(r32, d, 0), off, off + n)
        right = jax.lax.slice_in_dim(pltpu.roll(r32, rows - d, 0), off, off + n)
        left, right = left.astype(r.dtype), right.astype(r.dtype)
    else:
        left = jax.lax.slice_in_dim(r, off - d, off - d + n)
        right = jax.lax.slice_in_dim(r, off + d, off + d + n)
    return left, center, right


def _dot(a, b):
    return jax.lax.dot_general(
        a, b, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )


def _dot_t(a, b):
    """a @ b.T without materializing the transpose."""
    return jax.lax.dot_general(
        a, b, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )


def _clip_mask(w: int, lead: int, pos, tile: int, cp: int, dtype):
    """[w, 1] multiplicative mask: 1 where window row q (global in-clip
    row pos*tile - lead + q) lies inside the clip, else 0."""
    q = jax.lax.broadcasted_iota(jnp.int32, (w, 1), 0)
    g = pos * tile - lead + q
    return ((g >= 0) & (g < cp * tile)).astype(dtype)


def _window_mask(w: int, lead: int, pos, tile: int, cp: int, dtype, lo, hi):
    """Generalized :func:`_clip_mask`: 1 where the global in-clip row
    pos*tile - lead + q lies inside [max(lo, 0), min(hi, clip)).  ``lo``/
    ``hi`` are DYNAMIC scalars (SMEM) — the arbitrary valid windows of
    the halo-sharded trunk (parallel/halo.py: edge shards carry halo rows
    outside the global sequence that SAME-padding semantics require to
    stay zero through every layer)."""
    q = jax.lax.broadcasted_iota(jnp.int32, (w, 1), 0)
    g = pos * tile - lead + q
    lo = jnp.maximum(lo, 0)
    hi = jnp.minimum(hi, cp * tile)
    return ((g >= lo) & (g < hi)).astype(dtype)


# --------------------------------------------------------------------- #
# Forward group kernel
# --------------------------------------------------------------------- #


def _fwd_group_kernel(plan: GroupPlan, cp: int, h: int, input_mask: bool,
                      windowed: bool, *refs):
    k, tile = plan.k, plan.tile
    suffix = plan.suffix
    n_taps = len(plan.emits)

    if windowed:
        vw_ref, *refs = refs
    x_c, x_l, x_r, wd_ref, bd_ref, wr_ref, br_ref = refs[:7]
    tap_outs = refs[7 : 7 + n_taps]
    cm_out = refs[7 + n_taps]
    im_out = refs[8 + n_taps] if input_mask else None
    win = refs[8 + n_taps + (1 if input_mask else 0)]

    i = pl.program_id(0)
    pos = jax.lax.rem(i, cp)
    _assemble(win, x_c, x_l, x_r, tile, h, pos, cp)

    cur = win[...]
    if input_mask:
        # The trunk input's relu mask (cms[0], bit 0 only) — packed here
        # so the XLA graph never re-reads the input just to compare it
        # (f32 compare: Mosaic has no native bf16 comparison here).
        im_out[...] = _gt_zero_i32(
            jax.lax.slice_in_dim(cur, h, h + tile)
        ).astype(jnp.int8)
    a_prev = h
    bits = None
    for j in range(k):
        d = plan.dils[j]
        a_j = suffix[j]
        w_j = tile + 2 * a_j
        r = jnp.maximum(cur, jnp.zeros((), cur.dtype))
        off = a_prev - a_j
        left, cen, right = _tap3(r, off, d, w_j)
        if _MERGE_FWD:
            # One k=3C contraction ([w, 3C] @ [3C, C]); the MXU runs the
            # k-slabs in tap order, so the f32 accumulation sequence is
            # identical to the three-dot chain below.
            y = _dot(jnp.concatenate([left, cen, right], axis=1),
                     wd_ref[j].reshape(3 * left.shape[1], left.shape[1]))
        else:
            y = _dot(left, wd_ref[j, 0])
            y += _dot(cen, wd_ref[j, 1])
            y += _dot(right, wd_ref[j, 2])
        y = y + bd_ref[j][None, :]
        dtype = cur.dtype
        v = jnp.maximum(y, 0.0).astype(dtype)
        z = _dot(v, wr_ref[j]) + br_ref[j][None, :]
        out = jax.lax.slice_in_dim(cur, off, off + w_j) + z.astype(dtype)
        if windowed:
            # Valid-window semantics: every layer output is re-zeroed
            # outside [lo, hi) — exactly what the masked XLA trunk does
            # per layer (models.wavenet_ae.encoder_trunk valid_mask) —
            # including a_j == 0 layers, whose center rows may now be
            # invalid.  lo/hi are dynamic, so no tile is statically
            # interior.
            out = out * _window_mask(w_j, a_j, pos, tile, cp, dtype,
                                     vw_ref[0], vw_ref[1])
        elif a_j > 0:
            # SAME-padding fidelity: window HALO rows outside the clip
            # must stay zero (bias adds would otherwise leak into later
            # layers' halo taps).  _clip_mask is all-ones on interior
            # tiles, so the multiply is exact everywhere (x * 1.0 == x
            # in bf16) — measured noise-level next to the matmul chain.
            out = out * _clip_mask(w_j, a_j, pos, tile, cp, dtype)

        # Packed masks, ONE int8 array for the whole group: bit 2j =
        # (x_{k0+j+1} > 0) (layer j's output relu mask), bit 2j+1 =
        # (y_j > 0) (its gate relu).  2k <= 8 bits for the partitions the
        # DP emits.  Accumulated in i32 (no i8 vector ops on Mosaic) and
        # truncated once — the wrap to a negative int8 at bit 7 is fine,
        # the backward extracts single bits with shift+and.
        xm_bit = _gt_zero_i32(jax.lax.slice_in_dim(out, a_j, a_j + tile))
        ym_bit = (
            jax.lax.slice_in_dim(y, a_j, a_j + tile) > 0.0
        ).astype(jnp.int32)
        layer_bits = jnp.left_shift(xm_bit, 2 * j) + jnp.left_shift(
            ym_bit, 2 * j + 1
        )
        bits = layer_bits if bits is None else bits + layer_bits

        if j in plan.emits:
            tap_outs[plan.emits.index(j)][...] = jax.lax.slice_in_dim(
                out, a_j, a_j + tile
            )
        cur = out
        a_prev = a_j
    cm_out[...] = bits.astype(jnp.int8)


def _fwd_group(plan: GroupPlan, x, wd, bd, wr, br, clip_rows: int,
               input_mask: bool = False, valid_window=None):
    """One forward group launch.

    Args: x [rows, C] (rows a multiple of clip_rows); wd [K, 3, C, C];
      bd [K, C]; wr [K, C, C]; br [K, C]; valid_window — optional [2]
      int32 (lo, hi) clip-relative valid window (dynamic); layer outputs
      are re-zeroed outside it (halo-sharded trunks, parallel/halo.py).
    Returns: (taps, cm[, input relu mask]) — taps[j] for j in plan.emits
    ([-1] is the group output); cm is ONE packed int8 [rows, C] with
    bit 2j = (x_{k0+j+1} > 0) and bit 2j+1 = (y_{k0+j} > 0) for every
    local layer j.  With ``input_mask``, also returns (x_{k0} > 0) as
    int8 (bit 0) — the trunk input's relu mask.
    """
    rows, c = x.shape
    assert rows % clip_rows == 0 and clip_rows % plan.tile == 0
    assert 2 * plan.k <= 8, "packed group masks need 2k <= 8 bits"
    tile = plan.tile
    h = _pow2_halo(plan.halo, tile)
    nprog = rows // tile
    cp = clip_rows // tile
    n_taps = len(plan.emits)
    dtype = x.dtype
    windowed = valid_window is not None

    kernel = functools.partial(_fwd_group_kernel, plan, cp, h, input_mask,
                               windowed)
    f32 = jnp.float32
    n_masks = 1 + (1 if input_mask else 0)
    out_shape = (
        [jax.ShapeDtypeStruct((rows, c), dtype)] * n_taps
        + [jax.ShapeDtypeStruct((rows, c), jnp.int8)] * n_masks
    )
    vw_in = []
    vw_spec = []
    if windowed:
        vw_in = [jnp.asarray(valid_window, jnp.int32)]
        vw_spec = [pl.BlockSpec(memory_space=pltpu.SMEM)]
    outs = pl.pallas_call(
        kernel,
        grid=(nprog,),
        in_specs=vw_spec
        + _halo_specs(tile, h, c, lambda: rows // h)
        + [pl.BlockSpec(memory_space=pltpu.VMEM)] * 4,
        out_specs=[pl.BlockSpec((tile, c), lambda i: (i, 0))]
        * (n_taps + n_masks),
        out_shape=out_shape,
        scratch_shapes=[pltpu.VMEM((tile + 2 * h, c), dtype)],
    )(*vw_in, x, x, x, wd.astype(dtype), bd.astype(f32), wr.astype(dtype),
      br.astype(f32))
    if input_mask:
        return outs[:n_taps], outs[n_taps], outs[-1]
    return outs[:n_taps], outs[n_taps]


# --------------------------------------------------------------------- #
# Backward group kernel
# --------------------------------------------------------------------- #


def _bwd_group_kernel(plan: GroupPlan, cp: int, g_locals: tuple,
                      prev_bit: int, windowed: bool, *refs):
    """Backward over one group with PACKED masks: the whole group's relu
    masks arrive as ONE int8 array (bit 2j = layer j's output mask, bit
    2j+1 = its gate mask) loaded once per tile with the group halo, plus
    the PREVIOUS group's packed array (center rows only) for the group
    input's relu mask at bit ``prev_bit``.  Replaces the k+1 per-layer
    mask arrays and their 3-slot rotation — 42 mask loads/eval across the
    stack-0 partition become 24, and the bit extraction is two cheap
    i32 VPU ops per use."""
    k, tile = plan.k, plan.tile
    prefix = plan.prefix
    nk = prefix[-1]
    ng = len(g_locals)

    it = iter(refs)
    take = lambda n: [next(it) for _ in range(n)]
    vw_ref = next(it) if windowed else None
    dx_ref, wd_ref, wr_ref, cm_own_ref, cm_prev_ref = take(5)
    g_refs = take(ng)
    out_ref = next(it)
    (dx_slot, carry, cm_own_slot, cm_prev_slot, g_slots, dx_sems,
     cm_own_sems, cm_prev_sems, g_sems, out_sem) = take(10)

    i = pl.program_id(0)
    pos = jax.lax.rem(i, cp)

    def g_load(s, start):
        j = k - 1 - s
        if j in g_locals:
            _halo_load(g_refs[g_locals.index(j)], g_slots.at[s % 2],
                       g_sems.at[s % 2], i, tile, prefix[j + 1], cp, start)

    _halo_load(dx_ref, dx_slot, dx_sems, i, tile, nk, cp, True)
    _halo_load(cm_own_ref, cm_own_slot, cm_own_sems, i, tile, nk, cp, True)
    _halo_load(cm_prev_ref, cm_prev_slot, cm_prev_sems, i, tile, 0, cp, True)
    g_load(0, True)
    _halo_load(dx_ref, dx_slot, dx_sems, i, tile, nk, cp, False)
    _halo_load(cm_own_ref, cm_own_slot, cm_own_sems, i, tile, nk, cp, False)

    def bit(win, b):
        # Arithmetic shift + mask is sign-extension-safe for every bit.
        return jnp.bitwise_and(
            jax.lax.shift_right_arithmetic(win.astype(jnp.int32), b), 1
        ).astype(jnp.float32)

    dtype = carry.dtype
    for s in range(k):
        j = k - 1 - s
        d = plan.dils[j]
        n_j, n_j1 = prefix[j], prefix[j + 1]
        q = _al(n_j + d, _REF_ALIGN)
        w_dy = tile + 2 * q
        w_out = tile + 2 * n_j

        if s + 1 < k:
            g_load(s + 1, True)
        if s == k - 1:
            _halo_load(cm_prev_ref, cm_prev_slot, cm_prev_sems, i, tile, 0,
                       cp, False)
        g_load(s, False)

        # dx_{j+1} lives at carry rows [nk - n_{j+1}, nk + tile + n_{j+1}).
        if s == 0:
            dxe = dx_slot[pl.ds(nk - n_j1, tile + 2 * n_j1)]
        else:
            dxe = carry[(s - 1) % 2, pl.ds(nk - n_j1, tile + 2 * n_j1)]
        if j in g_locals:
            dxe = dxe + g_slots[s % 2, pl.ds(0, tile + 2 * n_j1)]
        if windowed:
            # x_{j+1} = window ⊙ (x_j + f(x_j)) in the forward — the
            # cotangent of the unmasked sum is window ⊙ dx_{j+1} (tap
            # cotangent included: the emitted tap IS the masked value).
            dxe = dxe * _window_mask(tile + 2 * n_j1, n_j1, pos, tile, cp,
                                     dxe.dtype, vw_ref[0], vw_ref[1])

        dv = _dot_t(jax.lax.slice_in_dim(dxe, n_j1 - q, n_j1 - q + w_dy),
                    wr_ref[j])
        ym = bit(cm_own_slot[pl.ds(nk - q, w_dy)], 2 * j + 1)
        dy = (dv * ym).astype(dtype)

        off = q - n_j
        if _MERGE_BWD == 2:
            # One [w_dy, C] x [C, 3C] issue (wd_ref[j] is [3C, C] rows
            # [w0; w1; w2], see _bwd_group); dr's three terms are
            # row-shifted lane-slices of e, added in the same order as
            # the three-dot chain — identical f32 accumulation (each
            # slab IS one of the old dots, elementwise).
            cdim = dy.shape[1]
            e = _dot_t(dy, wd_ref[j])  # [w_dy, 3C] f32
            e0 = jax.lax.slice_in_dim(e, 0, cdim, axis=1)
            e1 = jax.lax.slice_in_dim(e, cdim, 2 * cdim, axis=1)
            e2 = jax.lax.slice_in_dim(e, 2 * cdim, 3 * cdim, axis=1)
            if d < _REF_ALIGN:
                rows = e.shape[0]
                # Same roll-then-slice alignment trick as _tap3 (the
                # slabs are already f32, Mosaic's 32-bit-only rotate
                # needs no cast here).
                re = jax.lax.slice_in_dim(
                    pltpu.roll(e0, rows - d, 0), off, off + w_out)
                le = jax.lax.slice_in_dim(
                    pltpu.roll(e2, d, 0), off, off + w_out)
            else:
                re = jax.lax.slice_in_dim(e0, off + d, off + d + w_out)
                le = jax.lax.slice_in_dim(e2, off - d, off - d + w_out)
            dr = re + jax.lax.slice_in_dim(e1, off, off + w_out) + le
        elif _MERGE_BWD == 1:
            left, cen, right = _tap3(dy, off, d, w_out)
            # wd_ref arrives pre-transposed as [K, 3C, C] with rows
            # [w0^T; w1^T; w2^T] (see _bwd_group); one k=3C contraction
            # replaces the three transposed tap dots, same f32 order.
            dr = _dot(jnp.concatenate([right, cen, left], axis=1),
                      wd_ref[j])
        else:
            left, cen, right = _tap3(dy, off, d, w_out)
            dr = _dot_t(right, wd_ref[j, 0])
            dr += _dot_t(cen, wd_ref[j, 1])
            dr += _dot_t(left, wd_ref[j, 2])
        if j >= 1:
            xm = bit(cm_own_slot[pl.ds(nk - n_j, w_out)], 2 * (j - 1))
        else:
            # w_out == tile + 2*prefix[0] == tile: center rows only.
            xm = bit(cm_prev_slot[pl.ds(0, w_out)], prev_bit)
        dx_j = (
            jax.lax.slice_in_dim(dxe, n_j1 - n_j, n_j1 - n_j + w_out)
            + (dr * xm).astype(dtype)
        )
        carry[s % 2, pl.ds(nk - n_j, w_out)] = dx_j

    pltpu.make_async_copy(
        carry.at[(k - 1) % 2, pl.ds(nk, tile)],
        out_ref.at[pl.ds(i * tile, tile)],
        out_sem,
    ).start()
    pltpu.make_async_copy(
        carry.at[(k - 1) % 2, pl.ds(nk, tile)],
        out_ref.at[pl.ds(i * tile, tile)],
        out_sem,
    ).wait()


def _wavefront_geom(dils: tuple, tile: int, prefix: tuple):
    """Static A/B split geometry for the wavefront backward, or None when
    the group cannot be wavefronted (a half would be empty, or a split's
    dy need would fall outside the layer's valid dy window).

    split[s] is the carry-coordinate boundary for backward step s
    (j = k-1-s): A_s produces output rows [nk - n_j, split[s]), B_s the
    rest.  The split recedes by marg[s] = al(d_s, 16) per step so that
    A_{s+1}'s reads (which extend d_{s+1} <= marg[s+1] past its own
    output) land entirely in rows A_s produced — B_s is never needed by
    any A piece, making (A_{s+1}, B_s) an independent pair.

    Takes the raw (dils, tile, prefix) triple rather than a GroupPlan so
    the planner's VMEM model can ask "would this candidate wavefront?"
    before the plan exists (see _bwd_vmem)."""
    k = len(dils)
    nk = prefix[-1]
    marg = [_al(dils[k - 1 - s], _REF_ALIGN) for s in range(k)]
    split = [0] * k
    split[k - 1] = nk + tile // 2
    for s in range(k - 2, -1, -1):
        split[s] = split[s + 1] + marg[s + 1]
    for s in range(k):
        j = k - 1 - s
        d = dils[j]
        q = _al(prefix[j] + d, _REF_ALIGN)
        if not (nk - prefix[j] < split[s] < nk + tile + prefix[j]):
            return None
        if split[s] + d > nk + tile + q or split[s] - d < nk - q:
            return None
    return tuple(split), tuple(marg)


def _wavefront_splits(plan: GroupPlan):
    """See _wavefront_geom — same decision, keyed off the built plan."""
    return _wavefront_geom(plan.dils, plan.tile, plan.prefix)


def _bwd_group_kernel_wf(plan: GroupPlan, cp: int, g_locals: tuple,
                         prev_bit: int, windowed: bool, splits: tuple,
                         *refs):
    """Wavefront-scheduled backward (see _wavefront_splits and the
    AST_CHAIN_BWD_WAVEFRONT comment).  Emission order A_0, A_1, B_0, A_2,
    B_1, ..., B_{k-1}: each adjacent pair is data-independent, so one
    piece's MXU matmuls can overlap the other's VPU mask/roll/add work.
    The carry rotates over THREE slots (a 2-deep ping-pong would let
    A_{s+1} overwrite rows B_s still reads, and the WAR hazard would
    serialize exactly the pair being overlapped); the incoming dx loads
    into slot 2 == (0 - 1) % 3.  Only the dv/dy d-margin around the split
    is computed twice (~1% extra rows); per-row operands, op order and
    f32 accumulation order are identical to the serial kernel, so the
    outputs are bit-identical (tests/test_pallas_chain.py)."""
    k, tile = plan.k, plan.tile
    prefix = plan.prefix
    nk = prefix[-1]
    ng = len(g_locals)
    split, marg = splits

    it = iter(refs)
    take = lambda n: [next(it) for _ in range(n)]
    vw_ref = next(it) if windowed else None
    dx_ref, wd_ref, wr_ref, cm_own_ref, cm_prev_ref = take(5)
    g_refs = take(ng)
    out_ref = next(it)
    (carry, cm_own_slot, cm_prev_slot, g_slots, dx_sems,
     cm_own_sems, cm_prev_sems, g_sems, out_sem) = take(9)

    i = pl.program_id(0)
    pos = jax.lax.rem(i, cp)

    def g_load(s, start):
        j = k - 1 - s
        if j in g_locals:
            _halo_load(g_refs[g_locals.index(j)], g_slots.at[s % 3],
                       g_sems.at[s % 3], i, tile, prefix[j + 1], cp, start)

    _halo_load(dx_ref, carry.at[2], dx_sems, i, tile, nk, cp, True)
    _halo_load(cm_own_ref, cm_own_slot, cm_own_sems, i, tile, nk, cp, True)
    _halo_load(cm_prev_ref, cm_prev_slot, cm_prev_sems, i, tile, 0, cp, True)
    for s in range(min(k, 3)):
        g_load(s, True)
    _halo_load(dx_ref, carry.at[2], dx_sems, i, tile, nk, cp, False)
    _halo_load(cm_own_ref, cm_own_slot, cm_own_sems, i, tile, nk, cp, False)

    def bit(win, b):
        return jnp.bitwise_and(
            jax.lax.shift_right_arithmetic(win.astype(jnp.int32), b), 1
        ).astype(jnp.float32)

    dtype = carry.dtype

    def piece(s, lo, hi):
        """dx of layer j = k-1-s on output rows [lo, hi) (carry coords)."""
        j = k - 1 - s
        d = plan.dils[j]
        n_j, n_j1 = prefix[j], prefix[j + 1]
        q = _al(n_j + d, _REF_ALIGN)
        dylo = max(lo - marg[s], nk - q)
        dyhi = min(hi + marg[s], nk + tile + q)
        w_dy = dyhi - dylo
        w = hi - lo

        dxe = carry[(s - 1) % 3, pl.ds(dylo, w_dy)]
        if j in g_locals:
            dxe = dxe + g_slots[s % 3, pl.ds(dylo - (nk - n_j1), w_dy)]
        if windowed:
            dxe = dxe * _window_mask(w_dy, nk - dylo, pos, tile, cp,
                                     dxe.dtype, vw_ref[0], vw_ref[1])

        dv = _dot_t(dxe, wr_ref[j])
        ym = bit(cm_own_slot[pl.ds(dylo, w_dy)], 2 * j + 1)
        dy = (dv * ym).astype(dtype)

        off = lo - dylo
        if _MERGE_BWD == 2:
            cdim = dy.shape[1]
            e = _dot_t(dy, wd_ref[j])  # [w_dy, 3C] f32
            e0 = jax.lax.slice_in_dim(e, 0, cdim, axis=1)
            e1 = jax.lax.slice_in_dim(e, cdim, 2 * cdim, axis=1)
            e2 = jax.lax.slice_in_dim(e, 2 * cdim, 3 * cdim, axis=1)
            if d < _REF_ALIGN:
                rows = e.shape[0]
                re = jax.lax.slice_in_dim(
                    pltpu.roll(e0, rows - d, 0), off, off + w)
                le = jax.lax.slice_in_dim(
                    pltpu.roll(e2, d, 0), off, off + w)
            else:
                re = jax.lax.slice_in_dim(e0, off + d, off + d + w)
                le = jax.lax.slice_in_dim(e2, off - d, off - d + w)
            dr = re + jax.lax.slice_in_dim(e1, off, off + w) + le
        elif _MERGE_BWD == 1:
            left, cen, right = _tap3(dy, off, d, w)
            dr = _dot(jnp.concatenate([right, cen, left], axis=1),
                      wd_ref[j])
        else:
            left, cen, right = _tap3(dy, off, d, w)
            dr = _dot_t(right, wd_ref[j, 0])
            dr += _dot_t(cen, wd_ref[j, 1])
            dr += _dot_t(left, wd_ref[j, 2])
        if j >= 1:
            xm = bit(cm_own_slot[pl.ds(lo, w)], 2 * (j - 1))
        else:
            xm = bit(cm_prev_slot[pl.ds(lo - nk, w)], prev_bit)
        dx_j = (
            jax.lax.slice_in_dim(dxe, off, off + w)
            + (dr * xm).astype(dtype)
        )
        carry[s % 3, pl.ds(lo, w)] = dx_j

    def emit_a(s):
        g_load(s, False)  # waited ONCE per s (A precedes B)
        if s == k - 1:
            _halo_load(cm_prev_ref, cm_prev_slot, cm_prev_sems, i, tile,
                       0, cp, False)
        piece(s, nk - prefix[k - 1 - s], split[s])

    def emit_b(s):
        piece(s, split[s], nk + tile + prefix[k - 1 - s])
        if s + 3 < k:  # slot (s+3)%3 == s%3, now free
            g_load(s + 3, True)

    emit_a(0)
    for s in range(1, k):
        emit_a(s)
        emit_b(s - 1)
    emit_b(k - 1)

    pltpu.make_async_copy(
        carry.at[(k - 1) % 3, pl.ds(nk, tile)],
        out_ref.at[pl.ds(i * tile, tile)],
        out_sem,
    ).start()
    pltpu.make_async_copy(
        carry.at[(k - 1) % 3, pl.ds(nk, tile)],
        out_ref.at[pl.ds(i * tile, tile)],
        out_sem,
    ).wait()


def _bwd_group(plan: GroupPlan, dx, cm_own, cm_prev, prev_bit: int,
               gs: dict, wd, wr, clip_rows: int, valid_window=None):
    """One backward group launch.

    Args: dx [rows, C] — cotangent of the group output x_{k0+K};
      cm_own — this group's packed int8 mask array (see _fwd_group);
      cm_prev — the PREVIOUS group's packed array (or the trunk input's
      relu mask for the first group), whose bit ``prev_bit`` holds
      (x_{k0} > 0); gs maps local j -> loss cotangent of tap k0+j.
    Returns dx0 [rows, C] — cotangent of the group input.
    """
    rows, c = dx.shape
    assert rows % clip_rows == 0 and clip_rows % plan.tile == 0
    tile = plan.tile
    nk = plan.prefix[-1]
    ext = tile + 2 * nk
    nprog = rows // tile
    cp = clip_rows // tile
    dtype = dx.dtype
    g_locals = tuple(sorted(gs))
    windowed = valid_window is not None

    splits = _wavefront_splits(plan) if _BWD_WAVEFRONT else None
    if splits is not None:
        kernel = functools.partial(_bwd_group_kernel_wf, plan, cp, g_locals,
                                   prev_bit, windowed, splits)
        scratch = [
            pltpu.VMEM((3, ext, c), dtype),       # carry (slot 2 <- dx)
            pltpu.VMEM((ext, c), jnp.int8),       # packed-mask window
            pltpu.VMEM((tile, c), jnp.int8),      # prev-group mask (center)
            pltpu.VMEM((3, ext, c), dtype),       # tap-cotangent slots
            pltpu.SemaphoreType.DMA((3,)),
            pltpu.SemaphoreType.DMA((3,)),
            pltpu.SemaphoreType.DMA((3,)),
            pltpu.SemaphoreType.DMA((3, 3)),
            pltpu.SemaphoreType.DMA(()),
        ]
    else:
        kernel = functools.partial(_bwd_group_kernel, plan, cp, g_locals,
                                   prev_bit, windowed)
        scratch = [
            pltpu.VMEM((ext, c), dtype),          # dx slot
            pltpu.VMEM((2, ext, c), dtype),       # carry ping-pong
            pltpu.VMEM((ext, c), jnp.int8),       # packed-mask window
            pltpu.VMEM((tile, c), jnp.int8),      # prev-group mask (center)
            pltpu.VMEM((2, ext, c), dtype),       # tap-cotangent slots
            pltpu.SemaphoreType.DMA((3,)),
            pltpu.SemaphoreType.DMA((3,)),
            pltpu.SemaphoreType.DMA((3,)),
            pltpu.SemaphoreType.DMA((2, 3)),
            pltpu.SemaphoreType.DMA(()),
        ]
    if _MERGE_BWD == 1:
        # Pre-transpose the tap weights once per launch (tiny [K,3,C,C]
        # reshuffle in XLA): rows [w0^T; w1^T; w2^T] per layer.
        wd = jnp.swapaxes(wd, 2, 3).reshape(wd.shape[0], -1, c)
    elif _MERGE_BWD == 2:
        # N-merge: stack the three tap weights on the OUTPUT axis —
        # e = dy @ [w0 | w1 | w2]^T is one [*, C] x [C, 3C] issue with dy
        # read once (no operand duplication, unlike the K-merge above);
        # dr is then three row-shifted lane-slices of e added in the same
        # order as the three-dot chain (bit-identical f32 accumulation).
        # Pure reshape, no transpose: rows [w0; w1; w2] per layer.
        wd = wd.reshape(wd.shape[0], -1, c)
    vw_in, vw_spec = [], []
    if windowed:
        vw_in = [jnp.asarray(valid_window, jnp.int32)]
        vw_spec = [pl.BlockSpec(memory_space=pltpu.SMEM)]
    return pl.pallas_call(
        kernel,
        grid=(nprog,),
        in_specs=vw_spec
        + [pl.BlockSpec(memory_space=pl.ANY)]
        + [pl.BlockSpec(memory_space=pltpu.VMEM)] * 2
        + [pl.BlockSpec(memory_space=pl.ANY)] * (2 + len(g_locals)),
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        out_shape=jax.ShapeDtypeStruct((rows, c), dtype),
        scratch_shapes=scratch,
    )(*vw_in, dx, wd.astype(dtype), wr.astype(dtype), cm_own, cm_prev,
      *[gs[j] for j in g_locals])


# --------------------------------------------------------------------- #
# Whole-trunk op with custom VJP (and custom vmap)
# --------------------------------------------------------------------- #


def stack_trunk_weights(params, num_layers: int = 30):
    """[K,3,C,C]/[K,C]/[K,C,C]/[K,C] stacks of the ae_dilatedconv/ae_res
    weights (TF scope names, reference masked.py:141-145)."""
    wd = jnp.stack([params[f"ae_dilatedconv_{k}"]["w"]
                    for k in range(1, num_layers + 1)])
    bd = jnp.stack([params[f"ae_dilatedconv_{k}"]["b"]
                    for k in range(1, num_layers + 1)])
    wr = jnp.stack([params[f"ae_res_{k}"]["w"][0]
                    for k in range(1, num_layers + 1)])
    br = jnp.stack([params[f"ae_res_{k}"]["b"]
                    for k in range(1, num_layers + 1)])
    return wd, bd, wr, br


def _trunk_fwd_impl(dils, emit, x, wd, bd, wr, br, clip_rows,
                    valid_window=None):
    """Run all groups; returns (taps dict by global id, cms).

    cms[0] is the trunk input's relu mask (bit 0 only); cms[1 + g] is
    group g's packed mask array (bit 2j = local layer j's output mask,
    bit 2j+1 = its gate mask); all int8 [rows, C].
    """
    c = x.shape[-1]
    # Forward and backward share ONE partition: the packed group-mask
    # layout is keyed to it (plan_groups checks both kernels' VMEM models).
    plans = plan_groups(dils, clip_rows, c, x.dtype.itemsize, emit)
    cms, taps = [], {}
    cur = x
    for plan in plans:
        k0, k = plan.k0, plan.k
        outs = _fwd_group(
            plan, cur, wd[k0 : k0 + k], bd[k0 : k0 + k], wr[k0 : k0 + k],
            br[k0 : k0 + k], clip_rows, input_mask=(k0 == 0),
            valid_window=valid_window,
        )
        if k0 == 0:
            g_taps, g_cm, cm0 = outs
            cms.append(cm0)
        else:
            g_taps, g_cm = outs
        for j, tap in zip(plan.emits, g_taps):
            taps[k0 + j] = tap
        cur = g_taps[-1]
        cms.append(g_cm)
    return taps, tuple(cms)


def _trunk_bwd_impl(dils, emit, dtaps: dict, cms, wd, wr, clip_rows,
                    valid_window=None):
    c = cms[0].shape[-1]
    last = len(dils) - 1
    dx = dtaps[last]
    # Plan with the ACTIVATION itemsize (== the forward's x.dtype; the
    # cotangents carry it) — _fwd_group/_bwd_group cast weights to the
    # activation dtype themselves, so dx.dtype is what the kernels
    # actually run at.  The partition MUST match the forward's: the
    # packed mask arrays in ``cms`` are laid out per forward group.
    plans = plan_groups(dils, clip_rows, c, dx.dtype.itemsize, emit)
    for gi in range(len(plans) - 1, -1, -1):
        plan = plans[gi]
        k0, k = plan.k0, plan.k
        gs = {
            j - k0: dtaps[j]
            for j in emit
            if k0 <= j < k0 + k and j != last
        }
        # cms[gi] is the PREVIOUS group's packed array (the trunk input
        # mask for gi == 0); its top layer's output-mask bit holds this
        # group's input relu mask.
        prev_bit = 0 if gi == 0 else 2 * (plans[gi - 1].k - 1)
        dx = _bwd_group(
            plan, dx, cms[1 + gi], cms[gi], prev_bit, gs,
            wd[k0 : k0 + k], wr[k0 : k0 + k], clip_rows,
            valid_window=valid_window,
        )
    return dx


def reference_trunk(x, wd, bd, wr, br, dils, emit, valid_window=None):
    """Unfused XLA oracle: same trunk, same emitted-tap tuple.

    ``valid_window``: optional (lo, hi) — every layer output is re-zeroed
    outside [lo, hi), matching the masked trunk semantics of
    models.wavenet_ae.encoder_trunk(valid_mask=...)."""
    from audio_style_transfer_tpu.ops.pallas_encoder import (
        reference_encoder_block,
    )

    mask = None
    if valid_window is not None:
        vw = jnp.asarray(valid_window, jnp.int32)
        pos = jnp.arange(x.shape[0])
        mask = ((pos >= vw[0]) & (pos < vw[1])).astype(x.dtype)[:, None]

    taps = {}
    cur = x
    for j, d in enumerate(dils):
        cur = reference_encoder_block(cur, wd[j], bd[j], wr[j][None], br[j], d)
        if mask is not None:
            cur = cur * mask
        if j in emit:
            taps[j] = cur
    return tuple(taps[j] for j in sorted(taps))


@functools.lru_cache(maxsize=None)
def _make_trunk(dils: tuple, emit: tuple, windowed: bool = False):
    """Build the custom-VJP (+ custom-vmap) trunk op for one geometry.

    ``emit`` must contain len(dils) - 1 (the trunk output).  The returned
    function maps (x [T, C], wd, bd, wr, br[, vw]) -> tuple of emitted
    taps in ascending layer order.  The ``windowed`` variant takes a [2]
    int32 (lo, hi) valid window as its last argument and re-zeroes every
    layer output outside it (the halo-sharded trunk's SAME-padding
    contract, parallel/halo.py).
    """
    assert (len(dils) - 1) in emit
    emit = tuple(sorted(emit))

    @jax.custom_batching.custom_vmap
    def fwd_b(x, wd, bd, wr, br, vw):
        taps, cms = _trunk_fwd_impl(dils, emit, x, wd, bd, wr, br,
                                    x.shape[0],
                                    valid_window=vw if windowed else None)
        return tuple(taps[j] for j in emit), cms

    @fwd_b.def_vmap
    def _fwd_rule(axis_size, in_batched, x, wd, bd, wr, br, vw):
        if windowed:
            raise NotImplementedError(
                "fused_trunk: the windowed trunk cannot be vmapped (the "
                "valid window is per-clip state)"
            )
        if not in_batched[0] or any(in_batched[1:]):
            raise NotImplementedError(
                "fused_trunk: only the activations may be vmapped "
                f"(got in_batched={in_batched})"
            )
        b, t, c = x.shape
        taps, cms = _trunk_fwd_impl(
            dils, emit, x.reshape(b * t, c), wd, bd, wr, br, t
        )
        unflat = lambda a: a.reshape(b, t, c)
        out = (
            tuple(unflat(taps[j]) for j in emit),
            tuple(unflat(m) for m in cms),
        )
        return out, jax.tree.map(lambda _: True, out)

    @jax.custom_batching.custom_vmap
    def bwd_b(dtaps, cms, wd, wr, vw):
        dx = _trunk_bwd_impl(
            dils, emit, dict(zip(emit, dtaps)), cms, wd, wr,
            dtaps[0].shape[0],
            valid_window=vw if windowed else None,
        )
        return dx

    @bwd_b.def_vmap
    def _bwd_rule(axis_size, in_batched, dtaps, cms, wd, wr, vw):
        if windowed:
            raise NotImplementedError(
                "fused_trunk backward: the windowed trunk cannot be vmapped"
            )
        ok_t = all(jax.tree.leaves(in_batched[:2]))
        if not ok_t or any(jax.tree.leaves(in_batched[2:])):
            raise NotImplementedError(
                "fused_trunk backward: cotangents/masks must be vmapped "
                "and weights unbatched"
            )
        b, t, c = dtaps[0].shape
        flat = lambda a: a.reshape(b * t, c)
        dx = _trunk_bwd_impl(
            dils, emit,
            dict(zip(emit, [flat(g) for g in dtaps])),
            tuple(flat(m) for m in cms), wd, wr, t,
        )
        return dx.reshape(b, t, c), True

    @jax.custom_vjp
    def trunk(x, wd, bd, wr, br, vw):
        taps, _ = fwd_b(x, wd, bd, wr, br, vw)
        return taps

    def vjp_fwd(x, wd, bd, wr, br, vw):
        taps, cms = fwd_b(x, wd, bd, wr, br, vw)
        return taps, (x, wd, bd, wr, br, vw, cms)

    def vjp_bwd(res, dtaps):
        x, wd, bd, wr, br, vw, cms = res
        dx = bwd_b(tuple(dtaps), cms, wd, wr, vw)
        # Weight cotangents via XLA recompute — DCE-pruned whenever the
        # caller (the transfer hot path: frozen weights) does not consume
        # them, correct when a training loss differentiates through.
        _, pull = jax.vjp(
            lambda wd_, bd_, wr_, br_: reference_trunk(
                x, wd_, bd_, wr_, br_, dils, emit,
                valid_window=vw if windowed else None,
            ),
            wd, bd, wr, br,
        )
        dwd, dbd, dwr, dbr = pull(tuple(dtaps))
        # The valid window is integer state, not a differentiable input.
        dvw = np.zeros((2,), dtype=jax.dtypes.float0)
        return dx, dwd, dbd, dwr, dbr, dvw

    trunk.defvjp(vjp_fwd, vjp_bwd)
    return trunk


# Placeholder window for the unwindowed trunk (its kernels never read
# it).  A HOST constant: materializing a jnp array lazily here leaked a
# tracer into later traces (round-4 regression caught by bench --strict).
_NO_WINDOW = np.zeros((2,), np.int32)


def fused_trunk(x, wd, bd, wr, br, dils, emit, valid_window=None):
    """Chained-kernel encoder trunk on [T, C] (or vmapped [B, T, C])
    activations.

    Equivalent to running reference model.py:96-116's 30 residual blocks
    and returning the taps listed in ``emit`` (ascending; must include
    the last layer).  Waveform gradients flow through the chained Pallas
    backward kernels; weight gradients through an XLA recompute (pruned
    by DCE when unused).

    ``valid_window``: optional [2] int32 (lo, hi) — every layer output is
    re-zeroed outside [lo, hi), matching the masked XLA trunk
    (models.wavenet_ae.encoder_trunk valid_mask) so the halo-sharded
    exact long-form path (parallel/halo.py) runs these kernels instead of
    falling back to XLA convs.  Not vmappable (per-clip state).
    """
    emit = tuple(sorted(set(emit) | {len(dils) - 1}))
    windowed = valid_window is not None
    vw = jnp.asarray(valid_window if windowed else _NO_WINDOW, jnp.int32)
    return _make_trunk(tuple(dils), emit, windowed)(x, wd, bd, wr, br, vw)
