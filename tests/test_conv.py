import jax
import jax.numpy as jnp
import numpy as np

from audio_style_transfer_tpu.ops import condition, conv1d, pool1d, shift_right


def _direct_dilated_conv(x, w, b, dilation, causal):
    """O(T*F) loop reference for the time_to_batch conv semantics
    (reference masked.py:110-160), written independently in numpy."""
    bsz, t, cin = x.shape
    f, _, cout = w.shape
    y = np.zeros((bsz, t, cout), np.float32)
    if causal:
        offsets = [-(f - 1 - j) * dilation for j in range(f)]
    else:
        offsets = [(j - (f - 1) // 2) * dilation for j in range(f)]
    for j, off in enumerate(offsets):
        for ti in range(t):
            src = ti + off
            if 0 <= src < t:
                y[:, ti, :] += x[:, src, :] @ w[j]
    return y + b


def test_conv1d_noncausal_matches_direct():
    rng = np.random.RandomState(0)
    x = rng.randn(2, 64, 4).astype(np.float32)
    w = rng.randn(3, 4, 5).astype(np.float32)
    b = rng.randn(5).astype(np.float32)
    for dilation in [1, 4, 16]:
        got = np.asarray(conv1d(jnp.asarray(x), jnp.asarray(w), jnp.asarray(b),
                                dilation=dilation, causal=False))
        ref = _direct_dilated_conv(x, w, b, dilation, causal=False)
        np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-4)


def test_conv1d_causal_matches_direct():
    rng = np.random.RandomState(1)
    x = rng.randn(1, 48, 3).astype(np.float32)
    w = rng.randn(3, 3, 6).astype(np.float32)
    b = rng.randn(6).astype(np.float32)
    for dilation in [1, 2, 8]:
        got = np.asarray(conv1d(jnp.asarray(x), jnp.asarray(w), jnp.asarray(b),
                                dilation=dilation, causal=True))
        ref = _direct_dilated_conv(x, w, b, dilation, causal=True)
        np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-4)


def test_conv1d_1x1_is_matmul():
    rng = np.random.RandomState(2)
    x = rng.randn(2, 16, 8).astype(np.float32)
    w = rng.randn(1, 8, 4).astype(np.float32)
    b = rng.randn(4).astype(np.float32)
    got = np.asarray(conv1d(jnp.asarray(x), jnp.asarray(w), jnp.asarray(b)))
    ref = x @ w[0] + b
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)


def test_causal_conv_does_not_peek_ahead():
    rng = np.random.RandomState(3)
    x = rng.randn(1, 32, 2).astype(np.float32)
    w = rng.randn(3, 2, 2).astype(np.float32)
    b = np.zeros(2, np.float32)
    base = np.asarray(conv1d(jnp.asarray(x), jnp.asarray(w), jnp.asarray(b), dilation=2))
    x2 = x.copy()
    x2[:, 20:, :] += 100.0  # future perturbation
    pert = np.asarray(conv1d(jnp.asarray(x2), jnp.asarray(w), jnp.asarray(b), dilation=2))
    np.testing.assert_allclose(base[:, :20], pert[:, :20], rtol=1e-5)


def test_pool1d_avg():
    x = jnp.arange(2 * 8 * 3, dtype=jnp.float32).reshape(2, 8, 3)
    got = pool1d(x, 4, mode="avg")
    ref = np.asarray(x).reshape(2, 2, 4, 3).mean(axis=2)
    np.testing.assert_allclose(np.asarray(got), ref)


def test_shift_right():
    x = jnp.arange(6, dtype=jnp.float32).reshape(1, 6, 1)
    y = np.asarray(shift_right(x))[0, :, 0]
    np.testing.assert_array_equal(y, [0, 0, 1, 2, 3, 4])


def test_condition_broadcast():
    x = jnp.ones((1, 8, 2))
    enc = jnp.asarray(np.array([[[1.0, 2.0], [3.0, 4.0]]]))  # [1, 2, 2]
    y = np.asarray(condition(x, enc))
    assert y.shape == (1, 8, 2)
    np.testing.assert_allclose(y[0, :4, 0], 2.0)
    np.testing.assert_allclose(y[0, 4:, 0], 4.0)
    np.testing.assert_allclose(y[0, :4, 1], 3.0)
    np.testing.assert_allclose(y[0, 4:, 1], 5.0)
