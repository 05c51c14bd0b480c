"""Constant-Q transform as one MXU-friendly matmul.

Replaces the librosa.cqt call of the reference rainbowgram
(reference rainbowgram.py:49-53: hop 256, 40 bins/octave, 240 bins,
filter_scale 0.8, fmin C2).  librosa evaluates the CQT by recursive
octave down-sampling on the host; on TPU the direct definition is better:
build the complex Morlet kernel bank once as a dense [L, 2*n_bins] matrix
and evaluate all bins for all frames with a single real matmul — exactly
the shape the MXU wants.

Numerics: this is the *direct* CQT (what librosa's multirate scheme
approximates), so values agree with librosa to plotting accuracy but are
not bit-identical.
"""

from __future__ import annotations

import functools

import jax.numpy as jnp
import numpy as np

from audio_style_transfer_tpu.signal.stft import frame_signal

C2_HZ = 65.40639132514966  # librosa.note_to_hz('C2')


@functools.lru_cache(maxsize=8)
def _cqt_kernels(
    sr: int,
    n_bins: int,
    bins_per_octave: int,
    filter_scale: float,
    fmin: float,
):
    """Hann-windowed complex exponential bank, centered in a common length L.

    Returns (kernels_real, kernels_imag) each [L, n_bins] float32, plus L.
    Kernels are L1-normalized then scaled by sqrt(len_k / L)-style factors to
    match librosa's scale=True convention (response / sqrt(filter length)).
    """
    q = filter_scale / (2.0 ** (1.0 / bins_per_octave) - 1.0)
    freqs = fmin * 2.0 ** (np.arange(n_bins) / bins_per_octave)
    lengths = np.ceil(q * sr / freqs).astype(int)
    max_len = int(lengths.max())
    # Round up to an even FFT/window-friendly length.
    L = int(2 ** np.ceil(np.log2(max_len)))

    bank = np.zeros((L, n_bins), dtype=np.complex64)
    for k, (f, n) in enumerate(zip(freqs, lengths)):
        t = np.arange(n) - (n - 1) / 2.0
        win = np.hanning(n)
        kern = win * np.exp(2.0j * np.pi * f * t / sr)
        kern /= np.abs(kern).sum()  # L1 normalization (librosa util.normalize)
        start = (L - n) // 2
        # librosa scale=True divides the response by sqrt(filter length).
        bank[start : start + n, k] = kern * np.sqrt(n)
    # Cache host numpy (never jnp: under jit-trace jnp constants are tracers
    # and caching them would leak across traces).
    return (
        np.ascontiguousarray(bank.real.astype(np.float32)),
        np.ascontiguousarray(bank.imag.astype(np.float32)),
        L,
    )


def cqt(
    audio,
    sr: int = 16000,
    hop_length: int = 256,
    bins_per_octave: int = 40,
    n_bins: int = 240,
    filter_scale: float = 0.8,
    fmin: float = C2_HZ,
):
    """Direct constant-Q transform.

    Args:
      audio: [T] float signal.
    Returns:
      Complex [n_bins, n_frames] with n_frames = 1 + T // hop_length
      (matching librosa's centered framing).
    """
    kr, ki, L = _cqt_kernels(sr, n_bins, bins_per_octave, filter_scale, float(fmin))
    pad = L // 2
    n_frames = 1 + audio.shape[-1] // hop_length
    x = jnp.pad(audio, (pad, pad + hop_length), mode="constant")
    frames = frame_signal(x, L, hop_length)[..., :n_frames, :]
    re = jnp.dot(frames, kr, preferred_element_type=jnp.float32)
    im = jnp.dot(frames, ki, preferred_element_type=jnp.float32)
    return jnp.swapaxes(re + 1.0j * im, -1, -2)
