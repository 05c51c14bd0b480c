"""CLI smoke tests with the full model geometry on tiny workloads."""

import os

import numpy as np
import pytest

from audio_style_transfer_tpu.utils import write_wav


@pytest.fixture(scope="module")
def wav_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("src")
    sr = 16000
    t = np.arange(int(sr * 1.6)) / sr
    write_wav(str(d / "tone.wav"), 0.5 * np.sin(2 * np.pi * 220 * t), sr)
    write_wav(str(d / "square.wav"),
              0.4 * np.sign(np.sin(2 * np.pi * 330 * t)), sr)
    return d


def test_transfer_cli_parser_defaults():
    from audio_style_transfer_tpu.cli.transfer import build_parser

    args = build_parser().parse_args(["pachelbel", "organ"])
    # reference methods.py:244-269 defaults
    assert args.epochs == 100
    assert args.batch_size == 16384
    assert args.sr == 16000
    assert args.stack is None
    assert args.cont_lyrs == [29]
    assert args.lambd == 100.0
    assert args.gamma == 0.0
    assert args.channels == 128
    assert args.start == 1.0
    assert args.gatys is False
    assert args.ckpt_path.endswith("model.ckpt-200000")


def test_transfer_cli_end_to_end(wav_dir, tmp_path):
    from audio_style_transfer_tpu.cli.transfer import main

    main([
        "tone", "square",
        "--dir", str(wav_dir),
        "--outdir", str(tmp_path / "out"),
        "--logdir", str(tmp_path / "log"),
        "--epochs", "1",
        "--batch_size", "4096",
        "--stack", "0",
        "--start", "0.3",
        "--random_init",
        "--no_artifacts",
    ])


def test_output_grams_cli(wav_dir, tmp_path):
    from audio_style_transfer_tpu.cli.output_grams import main

    main([
        "tone",
        "--srcdir", str(wav_dir),
        "--figdir", str(tmp_path / "fig"),
        "--stack", "0",
        "--length", "4096",
        "--random_init",
    ])
    # one gram grid per 4096-sample window
    found = []
    for root, _, files in os.walk(tmp_path / "fig"):
        found += [f for f in files if f.startswith("gram-")]
    assert found


def test_save_embeddings_cli_latest_checkpoint(tmp_path):
    from audio_style_transfer_tpu.cli.save_embeddings import latest_checkpoint

    (tmp_path / "model.ckpt-100.npz").write_bytes(b"x")
    (tmp_path / "model.ckpt-200.index").write_bytes(b"x")
    os.utime(tmp_path / "model.ckpt-100.npz", (1, 1))
    got = latest_checkpoint(str(tmp_path))
    assert got.endswith("model.ckpt-200")


def test_generate_cli_discovery(tmp_path):
    from audio_style_transfer_tpu.cli.generate import discover_files

    write_wav(str(tmp_path / "a.wav"), np.zeros(100, np.float32), 16000)
    np.save(str(tmp_path / "b.npy"), np.zeros((2, 4)))
    files, postfix = discover_files(str(tmp_path))
    assert postfix == ".wav" and len(files) == 1
    files, postfix = discover_files(str(tmp_path), npy_only=True)
    assert postfix == ".npy" and len(files) == 1


def test_get_dir_maxiter_naming(tmp_path):
    """Non-default --maxiter changes the optimization trajectory, so it must
    land in a distinct artifact dir (advisor r4 #2); the default keeps the
    reference-identical path (methods.py hardcodes 100 at methods.py:137)."""
    from audio_style_transfer_tpu.cli.transfer import build_parser, get_dir

    base = ["tone", "square", "--outdir", str(tmp_path)]
    default = get_dir(str(tmp_path), build_parser().parse_args(base))
    again = get_dir(str(tmp_path), build_parser().parse_args(base))
    tuned = get_dir(str(tmp_path),
                    build_parser().parse_args(base + ["--maxiter", "50"]))
    assert default == again
    assert tuned != default
    assert "maxiter" not in os.path.basename(default)
    assert "_maxiter_50_" in os.path.basename(tuned)


def test_longform_cli_collapses_stereo(tmp_path, monkeypatch):
    """_run_longform must hand the chunkers 1-D audio even for stereo files
    (advisor r4 #1: a [channels, T] array made the chunkers see
    len(audio)==n_channels and crash or mis-chunk)."""
    import types

    from audio_style_transfer_tpu.cli import transfer as cli
    from audio_style_transfer_tpu.transfer import longform as lf

    sr = 16000
    t = np.arange(sr) / sr
    stereo = np.stack([np.sin(2 * np.pi * 220 * t),
                       np.sin(2 * np.pi * 440 * t)]).astype(np.float32)
    d = tmp_path / "src"
    d.mkdir()
    write_wav(str(d / "c.wav"), 0.5 * stereo, sr)
    write_wav(str(d / "s.wav"), 0.4 * stereo, sr)

    seen = {}

    def fake_transfer_longform(engine, content, style, **kw):
        seen["content"], seen["style"] = content, style
        return types.SimpleNamespace(
            audio=np.zeros(4096, np.float32),
            per_window={"evals": np.array([1])},
        )

    monkeypatch.setattr(lf, "transfer_longform", fake_transfer_longform)
    args = cli.build_parser().parse_args([
        "c", "s", "--dir", str(d), "--longform", "--no_artifacts",
    ])
    cli._run_longform(None, args, str(d / "c.wav"), str(d / "s.wav"),
                      str(tmp_path))
    assert seen["content"].ndim == 1 and seen["content"].shape[0] == sr
    assert seen["style"].ndim == 1 and seen["style"].shape[0] == sr


@pytest.mark.slow
def test_transfer_cli_longform_dispatch(wav_dir, tmp_path):
    """--longform must actually run the chunked long-form driver (round 4
    fixed a gap where the flag only renamed the artifact dir) and emit the
    stitched longform.wav."""
    from audio_style_transfer_tpu.cli.transfer import main

    out = tmp_path / "out"
    main([
        "tone", "square",
        "--dir", str(wav_dir),
        "--outdir", str(out),
        "--logdir", str(tmp_path / "log"),
        "--epochs", "1",
        "--batch_size", "4096",
        "--stack", "0",
        "--random_init",
        "--maxiter", "3",
        "--longform",
    ])
    wavs = list(out.rglob("longform.wav"))
    assert len(wavs) == 1
    from audio_style_transfer_tpu.utils import load_audio

    audio, _ = load_audio(str(wavs[0]), sr=16000)
    assert audio.shape[0] >= 4096 * 4 and np.all(np.isfinite(audio))


@pytest.mark.slow
def test_transfer_cli_exact_dispatch(wav_dir, tmp_path):
    """--exact runs the single-device window-scan exact mode end to end."""
    from audio_style_transfer_tpu.cli.transfer import main

    out = tmp_path / "out"
    main([
        "tone", "square",
        "--dir", str(wav_dir),
        "--outdir", str(out),
        "--logdir", str(tmp_path / "log"),
        "--epochs", "1",
        "--batch_size", "4096",
        "--stack", "0",
        "--random_init",
        "--maxiter", "3",
        "--exact",
        "--scan_window", "8192",
    ])
    wavs = list(out.rglob("longform.wav"))
    assert len(wavs) == 1
