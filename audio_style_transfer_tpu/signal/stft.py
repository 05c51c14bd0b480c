"""JAX STFT kernels.

Two consumers in the reference define the required semantics:

* the transfer regularizer (reference methods.py:122-123) uses
  ``tf.contrib.signal.stft(frame_length=1024, frame_step=512)``:
  *periodic* Hann window, NO centering, rFFT over the last frame axis;
* librosa-style centered STFT (reference nsynth/utils.py:206-272) used by
  the baseline spectral AE's specgram features.

Everything here is shape-static and jit-friendly: framing is a reshape +
gather, the FFT lowers to XLA's native rFFT.
"""

from __future__ import annotations

import functools

import jax.numpy as jnp
import numpy as np

from audio_style_transfer_tpu.signal.mu_law import safe_abs


def _hann(frame_length: int, periodic: bool = True) -> np.ndarray:
    n = frame_length if periodic else frame_length - 1
    k = np.arange(frame_length)
    return (0.5 - 0.5 * np.cos(2.0 * np.pi * k / n)).astype(np.float32)


def frame_signal(x, frame_length: int, frame_step: int):
    """Slice ``x`` [..., T] into frames [..., n_frames, frame_length].

    Matches tf.contrib.signal.frame with pad_end=False:
    ``n_frames = 1 + (T - frame_length) // frame_step``.
    """
    t = x.shape[-1]
    n_frames = 1 + (t - frame_length) // frame_step
    # Gather via advanced indexing on a static index grid; XLA turns this
    # into an efficient strided gather and fuses the window multiply.
    idx = (
        np.arange(n_frames)[:, None] * frame_step + np.arange(frame_length)[None, :]
    )
    return x[..., idx]


def stft(x, frame_length: int = 1024, frame_step: int = 512, *, window=None):
    """Non-centered STFT matching tf.contrib.signal.stft (methods.py:122).

    Args:
      x: [..., T] float signal.
      frame_length/frame_step: analysis params (reference defaults 1024/512).
      window: optional [frame_length] window; defaults to periodic Hann.

    Returns:
      Complex [..., n_frames, frame_length // 2 + 1].
    """
    if window is None:
        window = _hann(frame_length, periodic=True)
    frames = frame_signal(x, frame_length, frame_step) * jnp.asarray(window)
    return jnp.fft.rfft(frames, n=frame_length, axis=-1)


def stft_l1(x, frame_length: int = 1024, frame_step: int = 512):
    """The transfer regularizer: mean(|Re STFT| + |Im STFT|).

    Mirrors reference methods.py:122-123, including the gradient-safe abs
    (reference utils.py:92-93) so the derivative at 0 stays finite.
    """
    s = stft(x, frame_length, frame_step)
    return jnp.mean(safe_abs(jnp.real(s)) + safe_abs(jnp.imag(s)))


@functools.partial(jnp.vectorize, signature="(t)->(f,n)")
def _centered_stft_512(x):  # pragma: no cover - thin convenience wrapper
    return centered_stft(x, n_fft=512, hop_length=256)


def centered_stft(x, n_fft: int = 512, hop_length: int | None = None, *, window=None):
    """librosa-compatible centered STFT: reflect-pad n_fft//2, symmetric Hann.

    Matches librosa.stft(center=True, win_length=n_fft) as used by the
    baseline specgram path (reference nsynth/utils.py:233-236).
    Returns [..., 1 + n_fft//2, n_frames] (librosa's [freq, time] layout).
    """
    if hop_length is None:
        hop_length = n_fft // 2
    if window is None:
        # librosa uses a symmetric-ish Hann via scipy get_window('hann', n_fft,
        # fftbins=True) which is the periodic variant.
        window = _hann(n_fft, periodic=True)
    pad = n_fft // 2
    x = jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(pad, pad)], mode="reflect")
    frames = frame_signal(x, n_fft, hop_length) * jnp.asarray(window)
    spec = jnp.fft.rfft(frames, n=n_fft, axis=-1)
    return jnp.swapaxes(spec, -1, -2)


def istft(spec, n_fft: int = 512, hop_length: int | None = None, *, length=None):
    """Inverse of :func:`centered_stft` via windowed overlap-add.

    Matches librosa.istft(center=True) with Hann synthesis window and
    squared-window normalization. ``spec`` is [..., freq, time].
    """
    if hop_length is None:
        hop_length = n_fft // 2
    window_np = _hann(n_fft, periodic=True)
    frames = jnp.fft.irfft(jnp.swapaxes(spec, -1, -2), n=n_fft, axis=-1)
    frames = frames * jnp.asarray(window_np)

    n_frames = frames.shape[-2]
    total = n_fft + hop_length * (n_frames - 1)
    batch_shape = frames.shape[:-2]
    flat = frames.reshape((-1, n_frames, n_fft))

    idx = (
        np.arange(n_frames)[:, None] * hop_length + np.arange(n_fft)[None, :]
    ).reshape(-1)
    out = jnp.zeros((flat.shape[0], total), flat.dtype)
    out = out.at[:, idx].add(flat.reshape(flat.shape[0], -1))

    wsq = np.zeros(total, np.float32)
    np.add.at(wsq, idx, np.tile(window_np**2, n_frames))
    out = out / jnp.maximum(jnp.asarray(wsq), 1e-10)

    pad = n_fft // 2
    out = out[:, pad : total - pad]
    if length is not None:
        out = out[:, :length]
    return out.reshape(batch_shape + out.shape[-1:])
