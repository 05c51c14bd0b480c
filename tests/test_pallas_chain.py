"""Chained Pallas trunk vs the XLA composition (interpret mode on CPU).

The chained kernels (ops/pallas_chain.py) must reproduce the unfused
trunk bit-for-bit in f32: forward taps, waveform gradients (through the
mask-stashed 4-matmul backward), weight gradients (XLA recompute), the
batched/vmapped flavour, and the emit-subset plumbing the transfer loss
uses (reference model.py:96-116 is the layer being chained).
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental import pallas as pl

import audio_style_transfer_tpu.ops.pallas_chain as pc
from audio_style_transfer_tpu.ops.pallas_chain import (
    fused_trunk,
    plan_groups,
    reference_trunk,
)


@pytest.fixture(autouse=True)
def interpret_mode(monkeypatch):
    monkeypatch.setattr(
        pl, "pallas_call", functools.partial(pl.pallas_call, interpret=True)
    )
    yield


def _inputs(t=512, c=8, n=4, seed=0):
    rng = np.random.RandomState(seed)
    x = jnp.asarray(rng.randn(t, c).astype(np.float32))
    wd = jnp.asarray(rng.randn(n, 3, c, c).astype(np.float32) * 0.2)
    bd = jnp.asarray(rng.randn(n, c).astype(np.float32) * 0.1)
    wr = jnp.asarray(rng.randn(n, c, c).astype(np.float32) * 0.2)
    br = jnp.asarray(rng.randn(n, c).astype(np.float32) * 0.1)
    return x, wd, bd, wr, br


def test_plan_covers_all_layers_and_respects_halos():
    dils30 = tuple(2 ** (i % 10) for i in range(30))
    plans = plan_groups(dils30, 16384, 128, 2, tuple(range(10)) + (29,))
    covered = []
    for p in plans:
        covered.extend(range(p.k0, p.k0 + p.k))
        assert p.halo <= p.tile
        assert p.prefix[-1] <= p.tile
        assert 16384 % p.tile == 0
        assert p.k - 1 in p.emits
    assert covered == list(range(30))


def test_partition_override_infeasible_raises_named_error(monkeypatch):
    """An infeasible AST_CHAIN_PARTITION override group must raise a
    ValueError naming the group (advisor r4 #3: previously _group_cost's
    None unpacked into an opaque TypeError, contradicting the
    'feasibility is still checked per group below' comment)."""
    dils30 = tuple(2 ** (i % 10) for i in range(30))
    monkeypatch.setattr(pc, "_PARTITION_OVERRIDE", "30")
    plan_groups.cache_clear()
    try:
        with pytest.raises(ValueError, match=r"AST_CHAIN_PARTITION group 0"):
            plan_groups(dils30, 16384, 128, 4, tuple(range(10)) + (29,))
    finally:
        plan_groups.cache_clear()


def test_bwd_vmem_charges_wavefront_per_candidate(monkeypatch):
    """The backward VMEM model charges the 6-buffer wavefront footprint
    only for candidates that will actually wavefront (round-5 review
    finding: a blanket 6-slot charge under AST_CHAIN_BWD_WAVEFRONT shrank
    tiles of groups that fall back to the 5-slot serial kernel)."""
    # Direct: the wavefront footprint is strictly larger.
    assert (pc._bwd_vmem(2048, 32, 128, 2, 3, wavefront=True)
            > pc._bwd_vmem(2048, 32, 128, 2, 3))
    # Plan-level: with the flag on, the engine geometry's plans must be
    # wavefrontable at their chosen tiles whenever the 6-slot footprint
    # was charged — i.e. the planner and the kernel-build agree on which
    # kernel runs (the kernel picks via _wavefront_splits on the plan).
    dils30 = tuple(2 ** (i % 10) for i in range(30))
    monkeypatch.setattr(pc, "_BWD_WAVEFRONT", True)
    plan_groups.cache_clear()
    try:
        plans_wf = plan_groups(dils30, 16384, 128, 2,
                               tuple(range(10)) + (29,))
    finally:
        plan_groups.cache_clear()
    plans_serial = plan_groups(dils30, 16384, 128, 2,
                               tuple(range(10)) + (29,))
    assert sum(p.k for p in plans_wf) == 30
    # Identical partitions/tiles in both modes at this geometry (the A/B
    # contract the round-5 BENCH_NOTES measurement relies on).
    assert [(p.k, p.tile) for p in plans_wf] == [
        (p.k, p.tile) for p in plans_serial
    ]


def test_merge_bwd_env_parse_is_defensive():
    """AST_CHAIN_MERGE_BWD must tolerate empty/legacy values at import
    (advisor r4 #5: int('') and int('false') raised at import time)."""
    import os
    import subprocess
    import sys

    for val, want in (("", "0"), ("false", "0"), ("2", "2")):
        env = dict(os.environ, AST_CHAIN_MERGE_BWD=val, JAX_PLATFORMS="cpu")
        r = subprocess.run(
            [sys.executable, "-c",
             "import audio_style_transfer_tpu.ops.pallas_chain as pc;"
             "print(pc._MERGE_BWD)"],
            env=env, capture_output=True, text=True, timeout=300,
        )
        assert r.returncode == 0, (val, r.stderr[-800:])
        assert r.stdout.strip().splitlines()[-1] == want, (val, r.stdout)


def test_plan_respects_packed_mask_capacity():
    """Groups are capped at 2k <= 8 mask bits; many small dilations must
    split instead of tracing a k>4 group into _fwd_group's assert
    (round-3 review finding)."""
    plans = plan_groups((1, 1, 1, 1, 1, 1), 512, 8, 2, (5,))
    assert all(p.k <= 4 for p in plans)
    assert [p.k0 for p in plans][0] == 0
    assert sum(p.k for p in plans) == 6


def test_plan_full_geometry_f32_is_feasible():
    """The f32 (itemsize 4) full-geometry plan must exist — the round-3
    VMEM model briefly charged a tap output per LAYER, which rejected
    every multi-layer group and (worse) would reject everything if the
    budget tightened further."""
    dils30 = tuple(2 ** (i % 10) for i in range(30))
    plans = plan_groups(dils30, 16384, 128, 4, tuple(range(10)) + (29,))
    assert sum(p.k for p in plans) == 30


def test_forward_matches_reference_multi_group():
    dils = (1, 2, 4, 8)
    x, wd, bd, wr, br = _inputs()
    emit = (0, 1, 2, 3)
    got = fused_trunk(x, wd, bd, wr, br, dils, emit)
    ref = reference_trunk(x, wd, bd, wr, br, dils, emit)
    assert len(got) == 4
    for j, (a, b) in enumerate(zip(got, ref)):
        # bit-exact on the TPU backend (asserted in the round-3 TPU
        # validation run); CPU-interpret dots accumulate differently than
        # the CPU conv oracle, so CI asserts epsilon-closeness.
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5,
            err_msg=f"tap {j}",
        )


def test_forward_emit_subset():
    dils = (1, 2, 4, 8)
    x, wd, bd, wr, br = _inputs(seed=1)
    got = fused_trunk(x, wd, bd, wr, br, dils, (1,))  # 3 is implied
    ref = reference_trunk(x, wd, bd, wr, br, dils, (1, 3))
    assert len(got) == 2
    for a, b in zip(got, ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)


def test_forward_large_dilations_force_group_split():
    # a combined backward halo of 256+512 > tile=512 makes the single-group
    # plan infeasible, so the DP MUST split regardless of cost tuning
    dils = (256, 512)
    x, wd, bd, wr, br = _inputs(t=512, n=2, seed=2)
    plans = plan_groups(dils, 512, 8, 4, (1,))
    assert len(plans) >= 2, [p.dils for p in plans]
    got = fused_trunk(x, wd, bd, wr, br, dils, (1,))
    ref = reference_trunk(x, wd, bd, wr, br, dils, (1,))
    np.testing.assert_allclose(np.asarray(got[0]), np.asarray(ref[0]),
                               rtol=1e-4, atol=1e-5)


def test_forward_multi_program_grid(monkeypatch):
    # shrink the VMEM budget so the plan picks tile < T (several grid
    # programs per clip; exercises halo DMAs + clip-edge zeroing)
    monkeypatch.setattr(pc, "_SCOPED_VMEM_BUDGET", 96 * 1024)
    pc.plan_groups.cache_clear()
    pc._make_trunk.cache_clear()
    try:
        dils = (2, 8, 16)
        x, wd, bd, wr, br = _inputs(t=1024, n=3, seed=3)
        plans = plan_groups(dils, 1024, 8, 4, (2,))
        assert any(p.tile < 1024 for p in plans), [
            (p.dils, p.tile) for p in plans
        ]
        got = fused_trunk(x, wd, bd, wr, br, dils, (2,))
        ref = reference_trunk(x, wd, bd, wr, br, dils, (2,))
        np.testing.assert_allclose(np.asarray(got[0]), np.asarray(ref[0]),
                                   rtol=1e-4, atol=1e-5)
    finally:
        pc.plan_groups.cache_clear()
        pc._make_trunk.cache_clear()


def test_gradient_matches_reference():
    # interpret-mode backward costs ~45 s per grad — keep geometry minimal
    dils = (1, 2, 4)
    emit = (1, 2)
    x, wd, bd, wr, br = _inputs(t=256, n=3, seed=5)
    tg = [
        jnp.asarray(np.random.RandomState(9 + i).randn(256, 8).astype(np.float32))
        for i in range(2)
    ]

    def loss(fn, z):
        taps = fn(z, wd, bd, wr, br, dils, emit)
        return sum(
            jnp.sum((t - g) ** 2) * (i + 1)
            for i, (t, g) in enumerate(zip(taps, tg))
        )

    g_fused = jax.grad(functools.partial(loss, fused_trunk))(x)
    g_ref = jax.grad(functools.partial(loss, reference_trunk))(x)
    np.testing.assert_allclose(
        np.asarray(g_fused), np.asarray(g_ref), rtol=1e-5, atol=1e-4
    )


def test_gradient_matches_reference_multi_group():
    """Waveform gradients across a forced GROUP SPLIT: exercises the
    cross-group packed-mask path (prev_bit indexing, cms[gi] offsets,
    and the group-boundary tap-cotangent injection) that single-group
    geometries never reach (round-3 review finding)."""
    dils = (256, 512)
    emit = (0, 1)
    x, wd, bd, wr, br = _inputs(t=512, n=2, seed=31)
    plans = plan_groups(dils, 512, 8, 4, emit)
    assert len(plans) >= 2, [p.dils for p in plans]
    tg = [
        jnp.asarray(np.random.RandomState(41 + i).randn(512, 8).astype(np.float32))
        for i in range(2)
    ]

    def loss(fn, z):
        taps = fn(z, wd, bd, wr, br, dils, emit)
        return sum(
            jnp.sum((t - g) ** 2) * (i + 1)
            for i, (t, g) in enumerate(zip(taps, tg))
        )

    g_fused = jax.grad(functools.partial(loss, fused_trunk))(x)
    g_ref = jax.grad(functools.partial(loss, reference_trunk))(x)
    np.testing.assert_allclose(
        np.asarray(g_fused), np.asarray(g_ref), rtol=1e-5, atol=1e-4
    )


def test_weight_gradients_match_reference():
    dils = (1, 4, 16)
    emit = (0, 2)
    x, wd, bd, wr, br = _inputs(t=256, n=3, seed=11)
    tg = jnp.asarray(np.random.RandomState(12).randn(256, 8).astype(np.float32))

    def loss(fn, wd_, bd_, wr_, br_):
        taps = fn(x, wd_, bd_, wr_, br_, dils, emit)
        return jnp.sum((taps[0] - tg) ** 2) + jnp.sum(taps[1] ** 3)

    gf = jax.grad(functools.partial(loss, fused_trunk), argnums=(0, 1, 2, 3))(
        wd, bd, wr, br
    )
    gr = jax.grad(
        functools.partial(loss, reference_trunk), argnums=(0, 1, 2, 3)
    )(wd, bd, wr, br)
    for a, b, name in zip(gf, gr, ["wd", "bd", "wr", "br"]):
        assert float(jnp.max(jnp.abs(b))) > 0, f"degenerate test: {name}"
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-4, err_msg=name
        )


def test_vmap_lanes_equal_single_clip():
    dils = (2, 8)
    emit = (0, 1)
    x, wd, bd, wr, br = _inputs(t=256, n=2, seed=21)
    xb = jnp.stack([x, x[::-1]])

    run = lambda z: fused_trunk(z, wd, bd, wr, br, dils, emit)
    out_b = jax.vmap(run)(xb)
    for lane in range(2):
        single = run(xb[lane])
        for a, b in zip([o[lane] for o in out_b], single):
            np.testing.assert_array_equal(
                np.asarray(a), np.asarray(b), err_msg=f"lane {lane}"
            )

    def loss(z):
        taps = run(z)
        return jnp.sum(taps[0] ** 2) + 2.0 * jnp.sum(taps[1] ** 2)

    gb = jax.vmap(jax.grad(loss))(xb)
    for lane in range(2):
        gs = jax.grad(loss)(xb[lane])
        np.testing.assert_allclose(
            np.asarray(gb[lane]), np.asarray(gs), rtol=1e-5, atol=1e-5,
            err_msg=f"lane {lane}",
        )


def test_encoder_trunk_chain_path_matches_unfused():
    """encoder_trunk(chain_encoder=True) == the plain XLA trunk, with None
    for unrequested taps and live entries for the requested ones."""
    from audio_style_transfer_tpu.models.wavenet_ae import (
        WaveNetAEConfig,
        encoder_trunk,
        init_params,
    )

    cfg = WaveNetAEConfig(
        ae_num_layers=4, ae_num_stages=4, ae_width=8, ae_bottleneck_width=4,
        num_layers=2, width=8, skip_width=8,
    )
    params = init_params(jax.random.PRNGKey(0), cfg)
    xq = jnp.asarray(
        np.random.RandomState(3).randint(-128, 128, (1, 512)).astype(np.float32)
    )
    ref = encoder_trunk(params, xq, cfg)
    chain_cfg = __import__("dataclasses").replace(cfg, chain_encoder=True)
    got = encoder_trunk(params, xq, chain_cfg, needed_taps=(1, 3))
    assert got[0] is None and got[2] is None
    for i in (1, 3):
        np.testing.assert_allclose(
            np.asarray(got[i]), np.asarray(ref[i]), rtol=1e-6, atol=1e-6,
            err_msg=f"tap {i}",
        )
    # enc_ alias + bottleneck tail
    np.testing.assert_allclose(
        np.asarray(got[4]), np.asarray(ref[4]), rtol=1e-6, atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(got[5]), np.asarray(ref[5]), rtol=1e-6, atol=1e-6
    )


def test_windowed_forward_and_gradient_match_masked_reference():
    """Valid-window chained kernels == the valid-masked XLA trunk (loss +
    gradient) — the contract the halo-sharded exact long-form path relies
    on (parallel/halo.py: edge shards re-zero halo rows outside the
    global sequence at every layer).  Covers an interior window (both
    edges strict), a left-edge window, and the full window (mask = all
    ones must be exactly a no-op)."""
    dils = (1, 2, 4)
    emit = (0, 2)
    x, wd, bd, wr, br = _inputs(t=256, n=3, seed=51)
    tg = [
        jnp.asarray(np.random.RandomState(52 + i).randn(256, 8).astype(np.float32))
        for i in range(2)
    ]

    def loss(fn, z, vw):
        taps = fn(z, wd, bd, wr, br, dils, emit, valid_window=vw)
        return sum(
            jnp.sum((t - g) ** 2) * (i + 1)
            for i, (t, g) in enumerate(zip(taps, tg))
        )

    for lo, hi in [(32, 224), (48, 256), (0, 256)]:
        vw = jnp.asarray([lo, hi], jnp.int32)
        taps_f = fused_trunk(x, wd, bd, wr, br, dils, emit, valid_window=vw)
        taps_r = reference_trunk(x, wd, bd, wr, br, dils, emit,
                                 valid_window=vw)
        for i, (a, b) in enumerate(zip(taps_f, taps_r)):
            # masked rows must be exactly zero
            assert float(jnp.max(jnp.abs(a[:lo]))) == 0.0 if lo else True
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-5,
                err_msg=f"window ({lo},{hi}) tap {i}",
            )

        fv, g_fused = jax.value_and_grad(
            functools.partial(loss, fused_trunk), argnums=0
        )(x, vw)
        rv, g_ref = jax.value_and_grad(
            functools.partial(loss, reference_trunk), argnums=0
        )(x, vw)
        np.testing.assert_allclose(float(fv), float(rv), rtol=1e-5)
        np.testing.assert_allclose(
            np.asarray(g_fused), np.asarray(g_ref), rtol=1e-5, atol=1e-4,
            err_msg=f"window ({lo},{hi})",
        )


def test_windowed_gradient_multi_group():
    """Valid-window masking across a forced group split (the packed-mask
    handoff between groups must see the masked values on both sides)."""
    dils = (256, 512)
    emit = (0, 1)
    x, wd, bd, wr, br = _inputs(t=512, n=2, seed=61)
    assert len(plan_groups(dils, 512, 8, 4, emit)) >= 2
    tg = [
        jnp.asarray(np.random.RandomState(62 + i).randn(512, 8).astype(np.float32))
        for i in range(2)
    ]
    vw = jnp.asarray([64, 448], jnp.int32)

    def loss(fn, z):
        taps = fn(z, wd, bd, wr, br, dils, emit, valid_window=vw)
        return sum(
            jnp.sum((t - g) ** 2) * (i + 1)
            for i, (t, g) in enumerate(zip(taps, tg))
        )

    g_fused = jax.grad(functools.partial(loss, fused_trunk))(x)
    g_ref = jax.grad(functools.partial(loss, reference_trunk))(x)
    np.testing.assert_allclose(
        np.asarray(g_fused), np.asarray(g_ref), rtol=1e-5, atol=1e-4
    )


@pytest.fixture
def wavefront_mode(monkeypatch):
    """Route the backward through the wavefront-scheduled kernel
    (_bwd_group_kernel_wf) regardless of AST_CHAIN_BWD_WAVEFRONT, and
    clear the plan/trace caches that captured the serial _bwd_vmem
    estimate."""
    monkeypatch.setattr(pc, "_BWD_WAVEFRONT", True)
    pc.plan_groups.cache_clear()
    pc._make_trunk.cache_clear()
    yield
    pc.plan_groups.cache_clear()
    pc._make_trunk.cache_clear()


def test_wavefront_gradient_matches_reference(wavefront_mode):
    """The wavefront-scheduled backward (A/B half-tile pieces in skewed
    emission order, 3-deep carry rotation) must reproduce the serial
    kernel's contract: waveform gradients == the XLA reference trunk.
    Geometry is chosen so _wavefront_splits is feasible (asserted — a
    None split would silently fall back to the serial kernel and test
    nothing)."""
    dils = (1, 2, 4)
    emit = (1, 2)
    plans = plan_groups(dils, 256, 8, 4, emit)
    assert any(pc._wavefront_splits(p) is not None for p in plans), [
        (p.dils, p.tile) for p in plans
    ]
    x, wd, bd, wr, br = _inputs(t=256, n=3, seed=5)
    tg = [
        jnp.asarray(np.random.RandomState(9 + i).randn(256, 8).astype(np.float32))
        for i in range(2)
    ]

    def loss(fn, z):
        taps = fn(z, wd, bd, wr, br, dils, emit)
        return sum(
            jnp.sum((t - g) ** 2) * (i + 1)
            for i, (t, g) in enumerate(zip(taps, tg))
        )

    g_fused = jax.grad(functools.partial(loss, fused_trunk))(x)
    g_ref = jax.grad(functools.partial(loss, reference_trunk))(x)
    np.testing.assert_allclose(
        np.asarray(g_fused), np.asarray(g_ref), rtol=1e-5, atol=1e-4
    )


def test_wavefront_windowed_gradient_matches_masked_reference(wavefront_mode):
    """Wavefront backward under a dynamic valid window (the exact
    long-form edge-shard path): loss + gradient == the valid-masked XLA
    trunk.  The window mask multiplies dxe over the A/B dy margin, so
    the receding-split geometry must not change which rows are masked."""
    dils = (1, 2, 4)
    emit = (0, 2)
    plans = plan_groups(dils, 256, 8, 4, emit)
    assert any(pc._wavefront_splits(p) is not None for p in plans)
    x, wd, bd, wr, br = _inputs(t=256, n=3, seed=51)
    tg = [
        jnp.asarray(np.random.RandomState(52 + i).randn(256, 8).astype(np.float32))
        for i in range(2)
    ]

    def loss(fn, z, vw):
        taps = fn(z, wd, bd, wr, br, dils, emit, valid_window=vw)
        return sum(
            jnp.sum((t - g) ** 2) * (i + 1)
            for i, (t, g) in enumerate(zip(taps, tg))
        )

    for lo, hi in [(32, 224), (0, 256)]:
        vw = jnp.asarray([lo, hi], jnp.int32)
        fv, g_fused = jax.value_and_grad(
            functools.partial(loss, fused_trunk), argnums=0
        )(x, vw)
        rv, g_ref = jax.value_and_grad(
            functools.partial(loss, reference_trunk), argnums=0
        )(x, vw)
        np.testing.assert_allclose(float(fv), float(rv), rtol=1e-5)
        np.testing.assert_allclose(
            np.asarray(g_fused), np.asarray(g_ref), rtol=1e-5, atol=1e-4,
            err_msg=f"window ({lo},{hi})",
        )


def test_wavefront_splits_feasible_at_full_geometry():
    """Every group of the north-star 30-layer plan must wavefront (a
    None split silently falls back to the serial kernel, so a planner
    change that broke feasibility would disable the mode without any
    error).  Also pins the invariants the kernel relies on: the split
    recedes by exactly marg per step and stays strictly inside each
    layer's producible row range."""
    dils30 = tuple(2 ** (i % 10) for i in range(30))
    plans = plan_groups(dils30, 16384, 128, 2, tuple(range(10)) + (29,))
    for p in plans:
        got = pc._wavefront_splits(p)
        assert got is not None, (p.dils, p.tile)
        split, marg = got
        nk = p.prefix[-1]
        for s in range(p.k):
            j = p.k - 1 - s
            assert nk - p.prefix[j] < split[s] < nk + p.tile + p.prefix[j]
            if s + 1 < p.k:
                assert split[s] == split[s + 1] + marg[s + 1]


def test_encoder_trunk_valid_window_chain_matches_masked_xla():
    """encoder_trunk(chain_encoder=True, valid_window=...) == the
    valid-mask XLA trunk — including the startconv masking outside the
    kernels and the bottleneck tail."""
    import dataclasses

    from audio_style_transfer_tpu.models.wavenet_ae import (
        WaveNetAEConfig,
        encoder_trunk,
        init_params,
    )

    cfg = WaveNetAEConfig(
        ae_num_layers=4, ae_num_stages=4, ae_width=8, ae_bottleneck_width=4,
        num_layers=2, width=8, skip_width=8,
    )
    params = init_params(jax.random.PRNGKey(0), cfg)
    xq = jnp.asarray(
        np.random.RandomState(3).randint(-128, 128, (1, 512)).astype(np.float32)
    )
    pos = np.arange(512)
    mask = jnp.asarray((pos >= 96) & (pos < 416))
    ref = encoder_trunk(params, xq, cfg, valid_mask=mask)
    chain_cfg = dataclasses.replace(cfg, chain_encoder=True)
    got = encoder_trunk(params, xq, chain_cfg,
                        valid_window=(jnp.int32(96), jnp.int32(416)))
    for i in range(6):
        np.testing.assert_allclose(
            np.asarray(got[i]), np.asarray(ref[i]), rtol=1e-6, atol=1e-6,
            err_msg=f"extract {i}",
        )
