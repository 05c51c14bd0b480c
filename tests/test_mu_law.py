import jax
import jax.numpy as jnp
import numpy as np
import pytest

from audio_style_transfer_tpu.signal import (
    inv_mu_law,
    inv_mu_law_numpy,
    mu_law,
    mu_law_numpy,
    mu_law_quantize,
    safe_abs,
    safe_sign,
)


def _ref_mu_law_numpy(x, mu=255):
    # Independent transliteration of reference utils.py:79-82.
    out = np.sign(x) * np.log(1 + mu * np.abs(x)) / np.log(1 + mu)
    return np.floor(out * 128)


def _ref_inv_mu_law_numpy(x, mu=255.0):
    x = np.array(x).astype(np.float32)
    out = (x + 0.5) * 2.0 / (mu + 1)
    out = np.sign(out) / mu * ((1 + mu) ** np.abs(out) - 1)
    return np.where(np.equal(x, 0), x, out)


def test_mu_law_numpy_matches_reference_formula():
    rng = np.random.RandomState(0)
    x = rng.uniform(-1, 1, size=4096).astype(np.float32)
    np.testing.assert_array_equal(mu_law_numpy(x), _ref_mu_law_numpy(x))


def test_mu_law_quantize_device_matches_host():
    rng = np.random.RandomState(1)
    x = rng.uniform(-1, 1, size=2048).astype(np.float32)
    got = np.asarray(jax.jit(mu_law_quantize)(x))
    np.testing.assert_allclose(got, mu_law_numpy(x), atol=0)


def test_inv_mu_law_numpy_matches_reference_formula():
    x = np.arange(-128, 129).astype(np.float32)
    np.testing.assert_allclose(
        inv_mu_law_numpy(x), _ref_inv_mu_law_numpy(x), rtol=1e-6
    )


def test_round_trip_quantized():
    # decode(encode(x)) stays within one quantization bin of x
    x = np.linspace(-0.99, 0.99, 1001).astype(np.float32)
    q = mu_law_numpy(x)
    y = inv_mu_law_numpy(q)
    assert np.max(np.abs(x - y)) < 0.025  # mu-law bin width near |x|=1


def test_continuous_mu_law_no_floor():
    x = jnp.array([0.1, -0.2, 0.5])
    out = mu_law(x)
    # Continuous variant (nsynth/utils.py:88-102): not integer valued.
    assert not np.allclose(np.asarray(out), np.floor(np.asarray(out)))


def test_inv_mu_law_device_matches_numpy():
    x = np.arange(-128, 128).astype(np.float32)
    got = np.asarray(jax.jit(inv_mu_law)(jnp.asarray(x)))
    np.testing.assert_allclose(got, inv_mu_law_numpy(x), rtol=1e-5, atol=1e-7)


def test_inv_mu_law_zero_maps_to_zero():
    assert float(inv_mu_law(jnp.array([0.0]))[0]) == 0.0
    assert inv_mu_law_numpy(np.array([0.0]))[0] == 0.0


def test_safe_abs_and_sign_gradients_finite_at_zero():
    g_abs = jax.grad(lambda v: safe_abs(v))(0.0)
    g_sign = jax.grad(lambda v: safe_sign(v))(0.0)
    assert np.isfinite(g_abs)
    assert np.isfinite(g_sign)


def test_inv_mu_law_gradient_finite_everywhere():
    g = jax.grad(lambda v: jnp.sum(inv_mu_law(v)))(
        jnp.array([-128.0, -1.0, 0.0, 1e-6, 1.0, 127.0])
    )
    assert np.all(np.isfinite(np.asarray(g)))
