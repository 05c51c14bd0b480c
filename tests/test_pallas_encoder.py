"""Fused Pallas encoder block vs the XLA composition (interpret mode on CPU)."""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental import pallas as pl

import audio_style_transfer_tpu.ops.pallas_encoder as pe
from audio_style_transfer_tpu.ops.pallas_encoder import (
    fused_encoder_block,
    reference_encoder_block,
)


@pytest.fixture(autouse=True)
def interpret_mode(monkeypatch):
    """Run all pallas_calls in interpreter mode (no TPU in the test env)."""
    monkeypatch.setattr(
        pl, "pallas_call", functools.partial(pl.pallas_call, interpret=True)
    )
    yield


def _inputs(t=512, c=8, d=4, seed=0):
    rng = np.random.RandomState(seed)
    x = jnp.asarray(rng.randn(t, c).astype(np.float32))
    w_dil = jnp.asarray(rng.randn(3, c, c).astype(np.float32) * 0.2)
    b_dil = jnp.asarray(rng.randn(c).astype(np.float32) * 0.1)
    w_res = jnp.asarray(rng.randn(1, c, c).astype(np.float32) * 0.2)
    b_res = jnp.asarray(rng.randn(c).astype(np.float32) * 0.1)
    return x, w_dil, b_dil, w_res, b_res, d


def test_forward_matches_reference():
    x, w_dil, b_dil, w_res, b_res, d = _inputs()
    got = fused_encoder_block(x, w_dil, b_dil, w_res, b_res, d)
    ref = reference_encoder_block(x, w_dil, b_dil, w_res, b_res, d)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)


def test_forward_multiple_dilations():
    for d in [1, 2, 16, 64]:
        x, w_dil, b_dil, w_res, b_res, _ = _inputs(t=256, c=8, seed=d)
        got = fused_encoder_block(x, w_dil, b_dil, w_res, b_res, d)
        ref = reference_encoder_block(x, w_dil, b_dil, w_res, b_res, d)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=1e-4, atol=1e-4)


def test_forward_multi_tile_grid():
    # T chosen so the grid has several programs (tile typically 2048; use a
    # smaller T and rely on _pick_tile halving)
    x, w_dil, b_dil, w_res, b_res, d = _inputs(t=4096, c=8, d=32, seed=3)
    got = fused_encoder_block(x, w_dil, b_dil, w_res, b_res, d)
    ref = reference_encoder_block(x, w_dil, b_dil, w_res, b_res, d)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)


def test_gradient_matches_reference():
    x, w_dil, b_dil, w_res, b_res, d = _inputs(t=256, c=8, d=8, seed=5)
    tgt = jnp.asarray(np.random.RandomState(9).randn(256, 8).astype(np.float32))

    def loss_fused(x):
        return jnp.sum((fused_encoder_block(x, w_dil, b_dil, w_res, b_res, d) - tgt) ** 2)

    def loss_ref(x):
        return jnp.sum((reference_encoder_block(x, w_dil, b_dil, w_res, b_res, d) - tgt) ** 2)

    g_fused = jax.grad(loss_fused)(x)
    g_ref = jax.grad(loss_ref)(x)
    np.testing.assert_allclose(np.asarray(g_fused), np.asarray(g_ref),
                               rtol=1e-3, atol=1e-3)


def test_gradient_edge_tiles():
    # dilation large relative to tile; checks halo handling at both edges
    x, w_dil, b_dil, w_res, b_res, _ = _inputs(t=128, c=8, seed=6)
    d = 32

    def loss_fused(x):
        return jnp.sum(fused_encoder_block(x, w_dil, b_dil, w_res, b_res, d) ** 3)

    def loss_ref(x):
        return jnp.sum(reference_encoder_block(x, w_dil, b_dil, w_res, b_res, d) ** 3)

    np.testing.assert_allclose(
        np.asarray(jax.grad(loss_fused)(x)),
        np.asarray(jax.grad(loss_ref)(x)),
        rtol=1e-3, atol=1e-3,
    )


def test_weight_gradients_match_reference():
    """A train-style grad wrt the WEIGHTS through the fused path must equal
    the XLA composition's (previously silently zero — VJP now recomputes the
    weight-side cotangents in XLA; they are DCE'd when unused)."""
    x, w_dil, b_dil, w_res, b_res, d = _inputs(t=256, c=8, d=8, seed=11)
    tgt = jnp.asarray(np.random.RandomState(12).randn(256, 8).astype(np.float32))

    def loss(block, wd, bd, wr, br):
        return jnp.sum((block(x, wd, bd, wr, br, d) - tgt) ** 2)

    g_fused = jax.grad(functools.partial(loss, fused_encoder_block),
                       argnums=(0, 1, 2, 3))(w_dil, b_dil, w_res, b_res)
    g_ref = jax.grad(functools.partial(loss, reference_encoder_block),
                     argnums=(0, 1, 2, 3))(w_dil, b_dil, w_res, b_res)
    for a, b, name in zip(g_fused, g_ref, ["w_dil", "b_dil", "w_res", "b_res"]):
        assert float(jnp.max(jnp.abs(b))) > 0, f"degenerate test: {name} grad ~ 0"
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-3, atol=1e-3, err_msg=name)


def test_vmap_batches_through_clip_aware_kernel():
    """vmap over clips flattens to ONE kernel launch with per-clip halo
    zeroing — each lane must equal the single-clip result exactly (no
    leakage across clip boundaries)."""
    x, w_dil, b_dil, w_res, b_res, d = _inputs(t=512, c=8, d=16, seed=21)
    xb = jnp.stack([x, x[::-1], x * 2.0])

    out_b = jax.vmap(lambda z: fused_encoder_block(z, w_dil, b_dil, w_res, b_res, d))(xb)
    for lane in range(3):
        single = fused_encoder_block(xb[lane], w_dil, b_dil, w_res, b_res, d)
        np.testing.assert_allclose(np.asarray(out_b[lane]), np.asarray(single),
                                   rtol=1e-5, atol=1e-6, err_msg=f"lane {lane}")

    # gradients through the batched bwd kernel
    gb = jax.vmap(jax.grad(lambda z: jnp.sum(
        fused_encoder_block(z, w_dil, b_dil, w_res, b_res, d) ** 2)))(xb)
    for lane in range(3):
        gs = jax.grad(lambda z: jnp.sum(
            fused_encoder_block(z, w_dil, b_dil, w_res, b_res, d) ** 2))(xb[lane])
        np.testing.assert_allclose(np.asarray(gb[lane]), np.asarray(gs),
                                   rtol=1e-4, atol=1e-5, err_msg=f"lane {lane}")
