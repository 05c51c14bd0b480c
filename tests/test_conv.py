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


def test_one_in_channel_fast_path_matches_general_conv():
    """in_channels==1 convs take the shifted-broadcast fast path (layout
    fix for ae_startconv/startconv); it must match lax.conv_general_dilated
    exactly in f32 across causality and dilation."""
    from jax import lax

    rng = np.random.RandomState(5)
    for causal in (True, False):
        for dilation in (1, 2, 4):
            for f in (2, 3, 5):
                # batch 1: the fast path's gate (batch>1 keeps the conv op
                # whose layouts are fine at training shapes)
                x = jnp.asarray(rng.randn(1, 64, 1), jnp.float32)
                w = jnp.asarray(rng.randn(f, 1, 8), jnp.float32)
                b = jnp.asarray(rng.randn(8), jnp.float32)
                got = conv1d(x, w, b, dilation=dilation, causal=causal)
                span = (f - 1) * dilation
                pad = (span, 0) if causal else (span // 2, span - span // 2)
                ref = lax.conv_general_dilated(
                    x, w, window_strides=(1,), padding=[pad],
                    rhs_dilation=(dilation,),
                    dimension_numbers=("NWC", "WIO", "NWC"),
                    preferred_element_type=jnp.float32,
                ) + b
                np.testing.assert_allclose(
                    np.asarray(got), np.asarray(ref), rtol=1e-6, atol=1e-5,
                    err_msg=f"causal={causal} d={dilation} f={f}",
                )


def test_one_in_channel_fast_path_bf16_accumulates_f32():
    """bf16 inputs: products and tap accumulation run in f32 with a single
    final rounding (MXU semantics), not per-term bf16 rounding."""
    rng = np.random.RandomState(6)
    x = jnp.asarray(rng.randn(1, 32, 1), jnp.bfloat16)
    w = jnp.asarray(rng.randn(3, 1, 4), jnp.bfloat16)
    b = jnp.asarray(rng.randn(4), jnp.bfloat16)
    got = conv1d(x, w, b, causal=False)
    assert got.dtype == jnp.bfloat16
    xp = np.pad(np.asarray(x, np.float32)[0, :, 0], (1, 1))
    ref = np.zeros((32, 4), np.float32)
    for k in range(3):
        ref += xp[k : k + 32, None] * np.asarray(w, np.float32)[k, 0]
    ref += np.asarray(b, np.float32)
    np.testing.assert_allclose(
        np.asarray(got, np.float32)[0],
        np.asarray(jnp.asarray(ref, jnp.bfloat16), np.float32),
    )
