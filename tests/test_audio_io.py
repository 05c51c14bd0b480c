import numpy as np

from audio_style_transfer_tpu.utils import load_audio, read_wav, resample, write_wav
from audio_style_transfer_tpu.utils.audio_io import load_audio_mono, trim_for_encoding
from audio_style_transfer_tpu.utils.paths import crt_t_fol, gt_s_path


def _sine(sr=16000, secs=1.0, hz=440.0):
    t = np.arange(int(sr * secs)) / sr
    return (0.5 * np.sin(2 * np.pi * hz * t)).astype(np.float32)


def test_wav_round_trip(tmp_path):
    x = _sine()
    p = tmp_path / "a.wav"
    write_wav(p, x, 16000)
    y, sr = read_wav(p)
    assert sr == 16000
    assert y.shape == (1, len(x))
    np.testing.assert_allclose(y[0], x, atol=2.0 / 32767)


def test_stereo_channel_select(tmp_path):
    left = _sine(hz=440)
    right = _sine(hz=880)
    p = tmp_path / "st.wav"
    write_wav(p, np.stack([left, right]), 16000)
    a0, _ = load_audio(p, sr=16000, audio_channel=0)
    a1, _ = load_audio(p, sr=16000, audio_channel=1)
    np.testing.assert_allclose(a0, left, atol=1e-3)
    np.testing.assert_allclose(a1, right, atol=1e-3)


def test_resample_preserves_tone(tmp_path):
    x = _sine(sr=44100, hz=440)
    y = resample(x, 44100, 16000)
    # dominant frequency preserved
    f = np.fft.rfftfreq(len(y), 1 / 16000)
    peak = f[np.argmax(np.abs(np.fft.rfft(y)))]
    assert abs(peak - 440) < 5


def test_load_audio_resamples(tmp_path):
    x = _sine(sr=44100)
    p = tmp_path / "hi.wav"
    write_wav(p, x, 44100)
    y, sr = load_audio(p, sr=16000)
    assert sr == 16000
    assert abs(len(y) - 16000) <= 1


def test_load_audio_mono_truncates(tmp_path):
    x = _sine(secs=2.0)
    p = tmp_path / "m.wav"
    write_wav(p, x, 16000)
    y = load_audio_mono(p, sample_length=4000, sr=16000)
    assert y.shape == (4000,)


def test_trim_for_encoding():
    x = np.zeros(1000, np.float32)
    y, n = trim_for_encoding(x, 800, hop_length=512)
    assert n == 512 and y.shape == (512,)
    x2 = np.zeros((2, 1100), np.float32)
    y2, n2 = trim_for_encoding(x2, 2000, hop_length=512)
    assert n2 == 1024 and y2.shape == (2, 1024)


def test_gt_s_path_naming(tmp_path):
    p = gt_s_path(
        str(tmp_path),
        cont_fn="pachelbel",
        style_fn="organ",
        gatys=False,
        epochs=100,
        batch_size=16384,
        sr=16000,
        outdir="./ignored",
    )
    base = p.split("/")[-1]
    assert base.startswith("ours_")
    assert "_cnt_pachelbel_" in base
    assert "_style_organ_" in base
    assert "_ep_100_" in base
    assert "_btch_16384_" in base
    assert "sr16" in base
    assert "ignored" not in base  # *dir keys skipped


def test_crt_t_fol(tmp_path):
    p = crt_t_fol(str(tmp_path))
    import os, time

    dte = time.localtime()
    assert os.path.isdir(p)
    assert p.endswith(f"{dte[1]}{dte[2]}")
