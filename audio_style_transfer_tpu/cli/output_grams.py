"""Gram-visualization CLI — mirror of reference output-grams.py:110-124.

Slices a wav into fixed windows, computes channel-wise grams per window
with the tapped encoder, and saves figure grids.
"""

from __future__ import annotations

import argparse
import os

import numpy as np


def build_parser():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("filename")
    p.add_argument("--srcdir", nargs="?", default="./data/src")
    p.add_argument("--figdir", nargs="?", default="./data/fig")
    p.add_argument("--stack", nargs="?", default=None, type=int)
    p.add_argument("--channels", nargs="?", default=128, type=int)
    p.add_argument("--length", nargs="?", default=16384, type=int)
    p.add_argument(
        "--ckpt_path", nargs="?",
        default="./nsynth/model/wavenet-ckpt/model.ckpt-200000",
    )
    p.add_argument("--random_init", action="store_true")
    return p


def read_file(filename: str, length: int, sr: int = 16000):
    """Slice a file into len-`length` windows (reference output-grams.py:56-59)."""
    from audio_style_transfer_tpu.utils.audio_io import load_audio

    aud, _ = load_audio(filename, sr=sr)
    if aud.ndim > 1:
        aud = aud[0]
    return [aud[i * length : (i + 1) * length] for i in range(len(aud) // length)]


def get_path(figdir: str, filename: str, stack, length: int) -> str:
    from audio_style_transfer_tpu.utils.paths import crt_t_fol

    path = crt_t_fol(figdir)
    path = os.path.join(
        path, f"showAcrosslayer::chan0-127f:{filename}stack{stack}length{length}"
    )
    os.makedirs(path, exist_ok=True)
    return path


def main(argv=None):
    from audio_style_transfer_tpu.utils.profiling import enable_compile_cache

    enable_compile_cache()
    args = build_parser().parse_args(argv)

    import jax

    from audio_style_transfer_tpu.analysis.viz import show_our_gram
    from audio_style_transfer_tpu.models import WaveNetAEConfig, init_params
    from audio_style_transfer_tpu.transfer import StyleTransfer, TransferSpec

    if args.random_init:
        params = init_params(jax.random.PRNGKey(0), WaveNetAEConfig())
    else:
        from audio_style_transfer_tpu.ckpt import load_pretrained

        params = load_pretrained(args.ckpt_path)

    spec = TransferSpec(
        stack=args.stack,
        batch_size=args.length,
        nb_channels=args.channels,
        write_artifacts=False,
    )
    engine = StyleTransfer(spec, params)

    filepath = os.path.join(args.srcdir, args.filename + ".wav")
    audios = read_file(filepath, args.length)
    figdir = get_path(args.figdir, args.filename, args.stack, args.length)

    for i, aud in enumerate(audios):
        grams = engine.get_embeds(aud, is_content=False)
        show_our_gram(np.asarray(grams), i, figdir)
        print(f"window {i}: gram grid saved")


if __name__ == "__main__":
    main()
