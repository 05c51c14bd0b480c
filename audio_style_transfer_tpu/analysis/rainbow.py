"""NSynth-paper rainbowgram plots (reference rainbowgram.py).

CQT magnitude rendered as an alpha mask over the phase-derivative rainbow —
same constants (n_fft 512, hop 256, 40 bins/octave, 240 bins, filter_scale
0.8, fmin C2, peak 80 dB) and the same alpha-only colormap
(reference rainbowgram.py:21-35).

The CQT backend is selectable: the DEFAULT for plotting is the float64
multirate transform (signal/cqt_multirate.py — the recursive-downsampling
algorithm librosa runs, which is exactly where the reference computes its
CQT: on the host, reference rainbowgram.py:49).  ``backend="device"``
uses the on-device matmul kernel from signal/cqt.py instead (the direct
CQT definition; deviation from the multirate algorithm measured and
bounded in tests/test_cqt_fidelity.py — use it when the audio already
lives on the TPU).
"""

from __future__ import annotations

import numpy as np

# Constants (reference rainbowgram.py:11-18)
N_FFT = 512
HOP_LENGTH = 256
SR = 16000
OVER_SAMPLE = 4
RES_FACTOR = 0.8
OCTAVES = 6
NOTES_PER_OCTAVE = 10

_CDICT = {
    "red": ((0.0, 0.0, 0.0), (1.0, 0.0, 0.0)),
    "green": ((0.0, 0.0, 0.0), (1.0, 0.0, 0.0)),
    "blue": ((0.0, 0.0, 0.0), (1.0, 0.0, 0.0)),
    "alpha": ((0.0, 1.0, 1.0), (1.0, 0.0, 0.0)),
}


def _mask_cmap():
    import matplotlib

    return matplotlib.colors.LinearSegmentedColormap("MyMask", _CDICT)


def rainbowgram(
    audio,
    sr: int = SR,
    peak: float = 80.0,
    n_fft: int = N_FFT,
    hop_length: int | None = None,
    over_sample: int = OVER_SAMPLE,
    res_factor: float = RES_FACTOR,
    octaves: int = OCTAVES,
    notes_per_octave: int = NOTES_PER_OCTAVE,
    cqt_override=None,
    backend: str = "multirate",
):
    """(mag, dphase) arrays for plotting (reference rainbowgram.py:37-62).

    ``backend``: "multirate" (default — the host float64 recursive-
    downsampling algorithm, the transform family the reference renders
    from) or "device" (the on-device matmul CQT).
    ``cqt_override``: optional precomputed complex CQT [n_bins, n_frames];
    used by the fidelity tests to render the same image from an oracle
    transform.
    """
    import jax.numpy as jnp

    from audio_style_transfer_tpu.signal.cqt import C2_HZ, cqt
    from audio_style_transfer_tpu.signal.specgram import power_to_db, unwrap

    if not hop_length:
        hop_length = n_fft // 2

    if cqt_override is not None:
        c = jnp.asarray(np.asarray(cqt_override, np.complex64))
    elif backend == "multirate":
        from audio_style_transfer_tpu.signal.cqt_multirate import multirate_cqt

        c = jnp.asarray(
            multirate_cqt(
                np.asarray(audio, np.float64),
                sr=sr,
                hop_length=hop_length,
                bins_per_octave=int(notes_per_octave * over_sample),
                n_bins=int(octaves * notes_per_octave * over_sample),
                filter_scale=res_factor,
                fmin=C2_HZ,
            ).astype(np.complex64)
        )
    elif backend == "device":
        c = cqt(
            jnp.asarray(np.asarray(audio, np.float32)),
            sr=sr,
            hop_length=hop_length,
            bins_per_octave=int(notes_per_octave * over_sample),
            n_bins=int(octaves * notes_per_octave * over_sample),
            filter_scale=res_factor,
            fmin=C2_HZ,
        )
    else:
        raise ValueError(f"unknown rainbowgram backend {backend!r}")
    mag = jnp.abs(c)
    phase_angle = jnp.angle(c)

    mag = (power_to_db(mag**2, amin=1e-13, top_db=peak) / peak) + 1
    phase_unwrapped = unwrap(phase_angle, axis=-1)
    p = phase_unwrapped[:, 1:] - phase_unwrapped[:, :-1]
    p = jnp.concatenate([phase_unwrapped[:, 0:1], p], axis=1) / np.pi
    return np.asarray(mag), np.asarray(p)


def plotcqt(filepath: str, savepath: str | None = None):
    """Render the rainbowgram of a wav file (reference rainbowgram.py:64-75)."""
    import matplotlib

    matplotlib.use("agg")
    from matplotlib import pyplot as plt

    from audio_style_transfer_tpu.utils.audio_io import read_wav

    audio, sr = read_wav(filepath)
    # scipy.io.wavfile semantics: int16 counts as float
    mag, p = rainbowgram(audio[0] * 32768.0, sr)
    fig, ax = plt.subplots()
    ax.matshow(p[::-1, :], cmap=plt.cm.rainbow)
    ax.matshow(mag[::-1, :], cmap=_mask_cmap())
    if savepath:
        plt.savefig(savepath)
    plt.close(fig)
    return mag, p
