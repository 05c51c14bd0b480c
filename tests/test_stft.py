import jax
import jax.numpy as jnp
import numpy as np
import scipy.signal

from audio_style_transfer_tpu.signal import stft, stft_l1, frame_signal
from audio_style_transfer_tpu.signal.stft import centered_stft, istft
from audio_style_transfer_tpu.signal.specgram import (
    griffin_lim,
    ispecgram,
    specgram,
    unwrap,
)


def _ref_tf_contrib_stft(x, frame_length=1024, frame_step=512):
    """Independent numpy model of tf.contrib.signal.stft semantics:
    periodic Hann, no centering, rfft(frame_length)."""
    win = 0.5 - 0.5 * np.cos(2 * np.pi * np.arange(frame_length) / frame_length)
    n_frames = 1 + (len(x) - frame_length) // frame_step
    frames = np.stack(
        [x[i * frame_step : i * frame_step + frame_length] for i in range(n_frames)]
    )
    return np.fft.rfft(frames * win, n=frame_length, axis=-1)


def test_stft_matches_tf_contrib_semantics():
    rng = np.random.RandomState(0)
    x = rng.randn(16384).astype(np.float32)
    ours = np.asarray(jax.jit(stft)(x))
    ref = _ref_tf_contrib_stft(x)
    assert ours.shape == ref.shape == (31, 513)
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-3)


def test_frame_signal_shapes():
    x = jnp.arange(100.0)
    frames = frame_signal(x, 16, 8)
    assert frames.shape == (11, 16)
    np.testing.assert_array_equal(np.asarray(frames[1]), np.arange(8.0, 24.0))


def test_stft_l1_grad_finite():
    x = jnp.zeros(4096)
    g = jax.grad(stft_l1)(x)
    assert np.all(np.isfinite(np.asarray(g)))


def test_centered_stft_matches_direct_numpy():
    rng = np.random.RandomState(3)
    x = rng.randn(8192).astype(np.float32)
    ours = np.asarray(centered_stft(x, n_fft=512, hop_length=256))
    # direct numpy model of librosa.stft(center=True): reflect pad n_fft//2,
    # periodic Hann, frames at hops, [freq, time] layout.
    win = scipy.signal.get_window("hann", 512, fftbins=True)
    xp = np.pad(x, (256, 256), mode="reflect")
    n_frames = 1 + (len(xp) - 512) // 256
    frames = np.stack([xp[i * 256 : i * 256 + 512] for i in range(n_frames)])
    ref = np.fft.rfft(frames * win, axis=-1).T
    assert ours.shape == ref.shape == (257, 33)
    np.testing.assert_allclose(ours, ref, rtol=1e-3, atol=1e-3)


def test_istft_inverts_centered_stft():
    rng = np.random.RandomState(4)
    x = rng.randn(4096).astype(np.float32)
    spec = centered_stft(x, n_fft=512, hop_length=256)
    y = np.asarray(istft(spec, n_fft=512, hop_length=256, length=4096))
    np.testing.assert_allclose(y, x, rtol=1e-3, atol=1e-4)


def test_unwrap_matches_numpy():
    rng = np.random.RandomState(5)
    p = np.cumsum(rng.uniform(-2.0, 4.5, size=(3, 200)), axis=-1) % (2 * np.pi)
    np.testing.assert_allclose(
        np.asarray(unwrap(jnp.asarray(p), axis=-1)), np.unwrap(p, axis=-1),
        rtol=1e-5, atol=1e-4,
    )


def test_specgram_shape_and_range():
    x = jnp.asarray(np.random.RandomState(6).randn(8192).astype(np.float32))
    s = np.asarray(specgram(x, n_fft=512, hop_length=256))
    assert s.shape == (257, 33, 2)
    assert s[..., 0].min() >= 0.0 and s[..., 0].max() <= 1.0 + 1e-6


def test_griffin_lim_reduces_spectral_error():
    # A clean sinusoid: GL from random phase should approach the true magnitude.
    sr = 16000
    t = np.arange(4096) / sr
    x = np.sin(2 * np.pi * 440 * t).astype(np.float32)
    spec = centered_stft(jnp.asarray(x), n_fft=512, hop_length=256)
    mag = jnp.abs(spec)
    rng = jax.random.PRNGKey(0)
    phase0 = np.pi * jax.random.uniform(rng, mag.shape)
    y = griffin_lim(mag, phase0, n_fft=512, hop=256, num_iters=30)
    mag_y = jnp.abs(centered_stft(y, n_fft=512, hop_length=256))
    n = min(mag.shape[-1], mag_y.shape[-1])
    err = float(jnp.linalg.norm(mag_y[:, :n] - mag[:, :n]) / jnp.linalg.norm(mag))
    assert err < 0.35


def test_ispecgram_mag_only_runs():
    x = jnp.asarray(np.random.RandomState(8).randn(4096).astype(np.float32))
    s = specgram(x, n_fft=512, hop_length=256, mag_only=True)
    audio = ispecgram(s, n_fft=512, hop_length=256, mag_only=True, num_iters=3)
    assert np.all(np.isfinite(np.asarray(audio)))
