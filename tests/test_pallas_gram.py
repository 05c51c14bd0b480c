"""Pallas all-pairs gram kernel vs the XLA pairwise path (interpret mode)."""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental import pallas as pl

from audio_style_transfer_tpu.ops.pallas_gram import (
    pair_gram,
    pair_gram_reference,
)
from audio_style_transfer_tpu.transfer.grams import style_gram


@pytest.fixture(autouse=True)
def interpret_mode(monkeypatch):
    """Run all pallas_calls in interpreter mode (no TPU in the test env)."""
    monkeypatch.setattr(
        pl, "pallas_call", functools.partial(pl.pallas_call, interpret=True)
    )
    yield


def _taps(nl=4, b=1, t=256, c=16, seed=0, dtype=np.float32):
    rng = np.random.RandomState(seed)
    return [
        jnp.asarray(rng.randn(b, t, c).astype(np.float32)).astype(dtype)
        for _ in range(nl)
    ]


def test_forward_matches_reference():
    taps = _taps()
    got = pair_gram(*taps)
    ref = pair_gram_reference(*taps)
    assert got.dtype == jnp.float32
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_forward_multi_tile_and_single_tap():
    for nl, t in [(1, 1024), (3, 2048), (7, 512)]:
        taps = _taps(nl=nl, t=t, c=8, seed=nl)
        np.testing.assert_allclose(
            np.asarray(pair_gram(*taps)),
            np.asarray(pair_gram_reference(*taps)),
            rtol=1e-5, atol=1e-5,
        )


def test_forward_bf16_products_in_f32():
    taps32 = _taps(nl=3, t=512, c=8, seed=2)
    taps16 = [t.astype(jnp.bfloat16) for t in taps32]
    got = pair_gram(*taps16)
    # identical semantics: f32 products of the bf16-rounded values
    ref = pair_gram_reference(*[t.astype(jnp.float32) for t in taps16])
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_gradient_matches_reference():
    taps = _taps(nl=4, t=256, c=8, seed=3)
    tgt = jnp.asarray(
        np.random.RandomState(9).randn(1, 4, 4, 8).astype(np.float32)
    )

    def loss(fn, taps):
        return jnp.sum((fn(*taps) - tgt) ** 2)

    g = jax.grad(functools.partial(loss, pair_gram))(taps)
    g_ref = jax.grad(functools.partial(loss, pair_gram_reference))(taps)
    for a, b in zip(g, g_ref):
        assert float(jnp.max(jnp.abs(b))) > 0
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-4)


def test_gradient_kernel_path_large_l():
    """nl > _XLA_BWD_MAX_L routes the backward through the Pallas kernel
    (and its vmap rule) — the production L=30 path.  Small t/c keeps the
    18-tap interpret-mode run cheap."""
    nl = 18
    taps = _taps(nl=nl, t=128, c=8, seed=11)
    tgt = jnp.asarray(
        np.random.RandomState(12).randn(1, nl, nl, 8).astype(np.float32)
    )

    def loss(fn, taps):
        return jnp.sum((fn(*taps) - tgt) ** 2)

    g = jax.grad(functools.partial(loss, pair_gram))(taps)
    g_ref = jax.grad(functools.partial(loss, pair_gram_reference))(taps)
    for a, b in zip(g, g_ref):
        assert float(jnp.max(jnp.abs(b))) > 0
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-4)

    # the vmapped bwd kernel at the same L
    stacked = [jnp.stack([t_, t_ * 2.0], axis=0) for t_ in taps]  # [2,1,T,C]
    gb = jax.vmap(
        jax.grad(functools.partial(loss, pair_gram), argnums=0)
    )(stacked)
    for lane, scale in [(0, 1.0), (1, 2.0)]:
        gs = jax.grad(functools.partial(loss, pair_gram))(
            [s[lane] for s in stacked]
        )
        for a, b in zip(gb, gs):
            np.testing.assert_allclose(np.asarray(a[lane]), np.asarray(b),
                                       rtol=1e-4, atol=1e-4,
                                       err_msg=f"lane {lane}")


def test_bwd_tile_cap_preserves_divisibility():
    """Regression (round-3 advisor): T not a multiple of 128 with the
    kernel backward must not leave trailing cotangent rows unwritten."""
    nl = 17
    taps = _taps(nl=nl, t=320, c=8, seed=13)

    def loss(fn, taps):
        return jnp.sum(fn(*taps) ** 2)

    g = jax.grad(functools.partial(loss, pair_gram))(taps)
    g_ref = jax.grad(functools.partial(loss, pair_gram_reference))(taps)
    # what this guards against is unwritten trailing rows (garbage or
    # zeros, errors of order the gradient magnitude ~1e3); f32
    # accumulation-order noise through the squared loss is ~1e-4
    for a, b in zip(g, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-3, atol=1e-3)


def test_gradient_asymmetric_cotangent():
    """The bwd kernel symmetrizes g + g^T; a non-symmetric pullback (e.g.
    weighting only the upper triangle) must still match autodiff of the
    oracle."""
    taps = _taps(nl=3, t=512, c=8, seed=4)
    w = jnp.asarray(
        np.triu(np.random.RandomState(5).rand(3, 3)).astype(np.float32)
    )[None, :, :, None]

    def loss(fn, taps):
        return jnp.sum(fn(*taps) * w)

    g = jax.grad(functools.partial(loss, pair_gram))(taps)
    g_ref = jax.grad(functools.partial(loss, pair_gram_reference))(taps)
    for a, b in zip(g, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-4)


def test_vmap_matches_per_lane():
    taps = _taps(nl=3, b=1, t=256, c=8, seed=6)
    stacked = [jnp.concatenate([t, t[::, ::-1] * 2.0], axis=0)[:, None]
               for t in taps]  # [2, 1, T, C]

    out_b = jax.vmap(pair_gram)(*stacked)
    for lane in range(2):
        single = pair_gram(*[s[lane] for s in stacked])
        np.testing.assert_allclose(np.asarray(out_b[lane]), np.asarray(single),
                                   rtol=1e-5, atol=1e-5, err_msg=f"lane {lane}")

    # gradient through the vmapped bwd kernel
    def loss(*taps):
        return jnp.sum(pair_gram(*taps) ** 2)

    gb = jax.vmap(jax.grad(loss, argnums=tuple(range(3))))(*stacked)
    for lane in range(2):
        gs = jax.grad(loss, argnums=tuple(range(3)))(
            *[s[lane] for s in stacked]
        )
        for a, b in zip(gb, gs):
            np.testing.assert_allclose(
                np.asarray(a[lane]), np.asarray(b),
                rtol=1e-4, atol=1e-4, err_msg=f"lane {lane}",
            )


def test_style_gram_fused_matches_xla_path():
    """End-to-end: the fused flavour of style_gram (normalization included)
    equals the XLA pairwise path."""
    rng = np.random.RandomState(7)
    extracts = [jnp.asarray(rng.randn(1, 256, 16).astype(np.float32))
                for _ in range(5)]
    ids = (0, 2, 4)
    a = style_gram(extracts, ids, nb_channels=16, fused=False)
    b = style_gram(extracts, ids, nb_channels=16, fused=True)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               rtol=1e-5, atol=1e-6)

    # and its waveform-side gradient (what L-BFGS consumes)
    def loss(extracts, fused):
        g = style_gram(extracts, ids, nb_channels=16, fused=fused)
        return jnp.sum(g ** 2)

    ga = jax.grad(lambda e: loss(e, False))(extracts)
    gb = jax.grad(lambda e: loss(e, True))(extracts)
    for x, y in zip(ga, gb):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y),
                                   rtol=1e-4, atol=1e-5)
