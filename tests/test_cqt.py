import jax
import numpy as np

from audio_style_transfer_tpu.signal.cqt import C2_HZ, cqt


def test_cqt_shape():
    x = np.random.RandomState(0).randn(16384).astype(np.float32)
    out = np.asarray(jax.jit(cqt)(x))
    assert out.shape == (240, 1 + 16384 // 256)


def test_cqt_peaks_at_right_bin():
    sr = 16000
    bins_per_octave = 40
    for note_hz in [C2_HZ * 2, 440.0]:
        t = np.arange(sr) / sr
        x = np.sin(2 * np.pi * note_hz * t).astype(np.float32)
        mag = np.abs(np.asarray(cqt(x, sr=sr)))
        # average over interior frames to avoid edge effects
        prof = mag[:, 10:-10].mean(axis=1)
        k = int(np.argmax(prof))
        expected = bins_per_octave * np.log2(note_hz / C2_HZ)
        assert abs(k - expected) <= 1.0, (k, expected)


def test_cqt_linear():
    rng = np.random.RandomState(1)
    a = rng.randn(8192).astype(np.float32)
    b = rng.randn(8192).astype(np.float32)
    lhs = np.asarray(cqt(a + b))
    rhs = np.asarray(cqt(a)) + np.asarray(cqt(b))
    np.testing.assert_allclose(lhs, rhs, rtol=1e-3, atol=1e-3)
