"""CQT fidelity: the host multirate path is exact, the device kernel bounded.

The reference rainbowgram calls ``librosa.cqt`` on the host (reference
rainbowgram.py:49-53), which evaluates the constant-Q transform by
*recursive octave down-sampling*: build kernels for the top octave only,
correlate, halve the sample rate, repeat (Schörkhuber & Klapuri 2010 — the
algorithm librosa implements). librosa itself is not installed in this
image, so the oracle below implements that algorithm independently in
float64 numpy with direct per-frame dot products and a high-quality
polyphase decimator (scipy.signal.resample_poly, Kaiser window) — the same
structure as librosa's, with an anti-alias filter at least as good as its
default.

Two production paths are checked against it:

1. ``signal/cqt_multirate.py`` — the HOST plot path (rainbowgram's default
   backend), a vectorized (FFT-convolution) implementation of the same
   multirate algorithm: asserted to float tolerance against the oracle
   (the two differ only in fp summation order), and the rendered
   rainbowgram arrays to ~1e-5.  This closes SURVEY §7 hard-part #3
   ("bit-faithful plots") for the CQT.
2. ``signal/cqt.py`` — the on-DEVICE matmul kernel (the direct CQT
   definition): a measured-bounded approximation.  Interior frames agree
   to ~1% relative magnitude on tonal and noise signals, and rendered
   magnitude images (power_to_db, top_db=80, normalized to [0,1]) to
   <0.01 mean / <0.1 max absolute — "plotting accuracy", recorded in
   PARITY.md.
"""

import numpy as np
import pytest
import scipy.signal

from audio_style_transfer_tpu.analysis.rainbow import rainbowgram
from audio_style_transfer_tpu.signal.cqt import C2_HZ, cqt

SR = 16000
HOP = 256
BPO = 40
N_BINS = 240
FILTER_SCALE = 0.8


def _kernels(freqs, sr):
    """Centered L1-normalized Hann-windowed complex exponentials, one per
    frequency, scaled by sqrt(len) (librosa scale=True convention)."""
    q = FILTER_SCALE / (2.0 ** (1.0 / BPO) - 1.0)
    out = []
    for f in freqs:
        n = int(np.ceil(q * sr / f))
        t = np.arange(n) - (n - 1) / 2.0
        k = np.hanning(n) * np.exp(2.0j * np.pi * f * t / sr)
        k /= np.abs(k).sum()
        out.append(k * np.sqrt(n))
    return out


def multirate_cqt(audio, sr=SR, hop=HOP, n_bins=N_BINS, bpo=BPO, fmin=C2_HZ):
    """Recursive-downsampling CQT (the librosa algorithm) in float64.

    Top-octave kernels are reused at every octave on a signal halved in rate
    each step; each octave's response is scaled by sqrt(2**d) so magnitudes
    match the direct definition (kernel length doubles per octave down).
    Frames are centered at k*hop like signal/cqt.py (zero padding).
    """
    n_oct = n_bins // bpo
    assert n_oct * bpo == n_bins and hop % (2 ** (n_oct - 1)) == 0
    # top-octave bin frequencies
    top = fmin * 2.0 ** ((n_bins - bpo + np.arange(bpo)) / bpo)
    n_frames = 1 + len(audio) // hop

    x = np.asarray(audio, np.float64)
    hop_o = hop
    # One kernel bank for the whole transform: at d octaves of downsampling,
    # bin (top_octave - d, j) sits at the SAME normalized frequency as top
    # bin j at the original rate — the crux of the multirate algorithm.
    kernels = _kernels(top, sr)
    C = np.zeros((n_bins, n_frames), np.complex128)
    for d in range(n_oct):  # d octaves down from the top
        lo = n_bins - (d + 1) * bpo
        for j, k in enumerate(kernels):
            n = len(k)
            # center kernel at frame centers c = f*hop_o (zero-padded edges,
            # same convention as signal/cqt.py: response = frames @ kernel)
            padl = n // 2
            xp = np.pad(x, (padl, padl + n))
            for f in range(n_frames):
                c = f * hop_o  # xp[c : c+n] is x[c-padl : c-padl+n]
                C[lo + j, f] = np.dot(xp[c : c + n], k)
        C[lo : lo + bpo] *= np.sqrt(2.0**d)
        if d != n_oct - 1:
            x = scipy.signal.resample_poly(x, 1, 2, window=("kaiser", 14.0))
            hop_o //= 2
    return C


def _clips():
    t = np.arange(SR) / SR
    rng = np.random.RandomState(0)
    tone = np.sin(2 * np.pi * 440.0 * t)
    harm = sum(
        0.5 / (h + 1) * np.sin(2 * np.pi * 220.0 * (h + 1) * t) for h in range(5)
    )
    noise = rng.randn(SR) * 0.3
    return {"tone": tone, "harmonics": harm, "noise": noise}


@pytest.fixture(scope="module")
def pairs():
    out = {}
    for name, a in _clips().items():
        ours = np.asarray(cqt(a.astype(np.float32)))
        oracle = multirate_cqt(a)
        assert ours.shape == oracle.shape
        out[name] = (ours, oracle, a)
    return out


@pytest.mark.slow
def test_host_multirate_cqt_matches_oracle(pairs):
    """The package's vectorized multirate CQT (signal/cqt_multirate.py) is
    the SAME algorithm as the direct-dot oracle — same kernels, same
    sqrt(2**d) octave scaling, same resample_poly decimator — computed via
    FFT convolution, so the two must agree to float64 summation-order
    noise."""
    from audio_style_transfer_tpu.signal.cqt_multirate import multirate_cqt as mr

    for name, (_, oracle, a) in pairs.items():
        ours = mr(a)
        assert ours.shape == oracle.shape
        scale = max(np.abs(oracle).max(), 1e-12)
        dev = np.abs(ours - oracle) / scale
        assert dev.max() < 1e-9, (name, dev.max())


@pytest.mark.slow
def test_rainbowgram_default_backend_is_multirate(pairs):
    """Host rainbowgram renderings (the default backend — what plotcqt and
    every artifact dump use) must match the multirate-oracle rendering to
    float tolerance: the host plot path now runs the reference's own
    algorithm (VERDICT r4 next-round #2; reference rainbowgram.py:49)."""
    for name, (_, oracle, a) in pairs.items():
        mag_h, p_h = rainbowgram(a.astype(np.float32))  # default: multirate
        mag_r, p_r = rainbowgram(a.astype(np.float32), cqt_override=oracle)
        assert np.abs(mag_h - mag_r).max() < 1e-5, name
        # The phase derivative is angle-based: where magnitude vanishes the
        # angle is numerically free, so compare only at visible pixels.
        vis = np.asarray(mag_r) > 0.5
        assert np.abs((p_h - p_r)[vis]).max() < 1e-3, name


@pytest.mark.slow
def test_magnitude_matches_multirate_oracle(pairs):
    """Relative magnitude deviation on interior frames, energy-weighted.

    Uses a relative-to-peak-per-frame metric: |dmag| / max_bin(mag) — the
    quantity that determines plotted pixel differences."""
    for name, (ours, oracle, _) in pairs.items():
        m_ours = np.abs(ours)[:, 8:-8]
        m_orc = np.abs(oracle)[:, 8:-8]
        scale = np.maximum(m_orc.max(axis=0, keepdims=True), 1e-12)
        dev = np.abs(m_ours - m_orc) / scale
        assert dev.max() < 0.03, (name, dev.max())
        assert dev.mean() < 0.003, (name, dev.mean())


@pytest.mark.slow
def test_rainbowgram_images_match_multirate_oracle(pairs):
    """The rendered rainbowgram arrays (mag in [0,1] after power_to_db
    top_db=80; phase derivative / pi) must agree to plotting accuracy.

    dB rendering amplifies leakage-floor differences: a 0.5%-of-peak
    magnitude deviation is ~15 dB at a -60 dB pixel, so near-floor pixels
    legitimately differ between ANY two CQT implementations (librosa
    releases differ among themselves there). The visual content is the
    visible pixels; tolerances are banded by brightness (measured maxima:
    0.09 @ >0.5, 0.007 @ >0.9; means ~0.01)."""
    for name, (_, oracle, a) in pairs.items():
        mag_o, p_o = rainbowgram(a.astype(np.float32), backend="device")
        mag_r, p_r = rainbowgram(a.astype(np.float32), cqt_override=oracle)
        dmag = np.abs(np.asarray(mag_o) - np.asarray(mag_r))
        mag_r = np.asarray(mag_r)
        assert dmag.mean() < 0.02, (name, dmag.mean())
        vis = mag_r > 0.5
        assert dmag[vis].max() < 0.12, (name, dmag[vis].max())
        assert np.quantile(dmag[vis], 0.99) < 0.06, name
        strong = mag_r > 0.9
        assert dmag[strong].max() < 0.01, (name, dmag[strong].max())
        # phase derivative is only meaningful where there is energy
        dp = np.abs(np.asarray(p_o) - np.asarray(p_r))[vis]
        assert np.quantile(dp, 0.95) < 0.15, (name, np.quantile(dp, 0.95))
