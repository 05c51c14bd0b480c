import os

import numpy as np

from audio_style_transfer_tpu.analysis.rainbow import plotcqt, rainbowgram
from audio_style_transfer_tpu.analysis.spectrogram import (
    logscale_spec,
    plotstft,
    stft_np,
)
from audio_style_transfer_tpu.analysis.viz import (
    show_gram,
    vis_actis,
    vis_actis_ens,
    vis_mats,
)
from audio_style_transfer_tpu.utils import write_wav


def _ref_stft(sig, frameSize, overlapFac=0.5, window=np.hanning):
    """Direct transliteration of reference spectrogram.py:15-31 for the
    bit-faithfulness check."""
    from numpy.lib import stride_tricks

    win = window(frameSize)
    hopSize = int(frameSize - np.floor(overlapFac * frameSize))
    samples = np.append(np.zeros(int(np.floor(frameSize / 2.0))), sig)
    cols = np.ceil((len(samples) - frameSize) / float(hopSize)) + 1
    samples = np.append(samples, np.zeros(frameSize))
    frames = stride_tricks.as_strided(
        samples,
        shape=(int(cols), frameSize),
        strides=(samples.strides[0] * hopSize, samples.strides[0]),
    ).copy()
    frames *= win
    return np.fft.rfft(frames)


def test_stft_np_bit_faithful():
    rng = np.random.RandomState(0)
    sig = (rng.randn(20000) * 1000).astype(np.float64)
    ours = stft_np(sig, 1024)
    ref = _ref_stft(sig, 1024)
    assert ours.shape == ref.shape
    np.testing.assert_allclose(ours, ref, rtol=1e-10, atol=1e-8)


def test_logscale_spec_shapes():
    spec = np.random.RandomState(1).randn(40, 513) + 1j
    newspec, freqs = logscale_spec(spec, sr=16000, factor=1.0)
    assert newspec.shape[0] == 40
    assert len(freqs) == newspec.shape[1]
    # total energy preserved (bins are summed, not averaged)
    np.testing.assert_allclose(newspec.sum(), spec.sum(), rtol=1e-9)


def test_plotstft_writes_figure(tmp_path):
    sr = 16000
    t = np.arange(sr) / sr
    wav_path = str(tmp_path / "tone.wav")
    write_wav(wav_path, 0.5 * np.sin(2 * np.pi * 440 * t), sr)
    out = str(tmp_path / "spec.png")
    ims = plotstft(wav_path, plotpath=out)
    assert os.path.exists(out)
    assert np.all(np.isfinite(ims) | np.isneginf(ims))


def test_rainbowgram_shapes():
    sr = 16000
    t = np.arange(sr // 2) / sr
    audio = np.sin(2 * np.pi * 440 * t).astype(np.float32)
    mag, p = rainbowgram(audio, sr)
    assert mag.shape == p.shape == (240, 1 + len(audio) // 256)
    assert mag.min() >= 0.0 and mag.max() <= 1.0 + 1e-5


def test_plotcqt_writes_figure(tmp_path):
    sr = 16000
    t = np.arange(sr // 2) / sr
    wav_path = str(tmp_path / "tone.wav")
    write_wav(wav_path, 0.3 * np.sin(2 * np.pi * 220 * t), sr)
    out = str(tmp_path / "cqt.png")
    plotcqt(wav_path, savepath=out)
    assert os.path.exists(out)


def test_gram_and_activation_figures(tmp_path):
    figdir = str(tmp_path)
    rng = np.random.RandomState(2)
    show_gram(rng.rand(16, 10, 10), ep=3, figdir=figdir, gatys=False)
    assert os.path.exists(os.path.join(figdir, "gram-ep3.png"))
    show_gram(rng.rand(4, 16, 16), ep=4, figdir=figdir, gatys=True)
    assert os.path.exists(os.path.join(figdir, "gram-ep4.png"))

    aud = rng.randn(512)
    enc = np.abs(rng.rand(2, 512, 8))
    vis_actis(aud, enc, figdir, 1, layers=[0, 5])
    assert os.path.exists(os.path.join(figdir, "f-1.png"))
    vis_actis_ens(aud, enc, figdir, 2, layer_ids=[0, 5], dspl=128)
    assert os.path.exists(os.path.join(figdir, "fe-2.png"))

    vis_mats(rng.rand(2, 8, 8), rng.rand(2, 8, 8), [0, 1], figdir=figdir)
    assert os.path.exists(os.path.join(figdir, "mats_plt.png"))


def _ref_logscale(spec, sr=44100, factor=20.0):
    """Independent loop-based model of reference spectrogram.py:34-58."""
    timebins, freqbins = np.shape(spec)
    scale = np.linspace(0, 1, freqbins) ** factor
    scale *= (freqbins - 1) / max(scale)
    scale = np.unique(np.round(scale))
    newspec = np.complex128(np.zeros([timebins, len(scale)]))
    for i in range(len(scale)):
        lo = int(scale[i])
        hi = int(scale[i + 1]) if i + 1 < len(scale) else None
        newspec[:, i] = spec[:, lo:hi].sum(axis=1)
    allfreqs = np.abs(np.fft.fftfreq(freqbins * 2, 1.0 / sr)[: freqbins + 1])
    freqs = [
        np.mean(allfreqs[int(scale[i]) : (int(scale[i + 1]) if i + 1 < len(scale) else None)])
        for i in range(len(scale))
    ]
    return newspec, freqs


def test_logscale_spec_bit_faithful():
    rng = np.random.RandomState(7)
    spec = rng.randn(20, 513) + 1j * rng.randn(20, 513)
    for factor in [1.0, 20.0]:
        ours, freqs = logscale_spec(spec, sr=16000, factor=factor)
        ref, ref_freqs = _ref_logscale(spec, sr=16000, factor=factor)
        np.testing.assert_allclose(ours, ref, rtol=1e-12)
        np.testing.assert_allclose(freqs, ref_freqs, rtol=1e-12)
