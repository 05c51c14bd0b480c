"""Dataset-wide baseline latent dump (reference nsynth/baseline/save_embeddings.py).

Encodes every example of a TFRecord dataset with the baseline spectral AE
and saves z vectors + metadata as .npz.
"""

from __future__ import annotations

import argparse
import os

import numpy as np


def build_parser():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--tfrecord_path", default="", help="Dataset to encode.")
    p.add_argument("--checkpoint_dir", default="",
                   help="Baseline train logdir with ckpt-* subdirs.")
    p.add_argument("--savedir", default="", help="Output directory.")
    p.add_argument("--batch_size", type=int, default=8)
    p.add_argument("--max_batches", type=int, default=0)
    return p


def main(argv=None):
    from audio_style_transfer_tpu.utils.profiling import enable_compile_cache

    enable_compile_cache()
    args = build_parser().parse_args(argv)
    if not (args.tfrecord_path and args.savedir):
        raise RuntimeError("need --tfrecord_path and --savedir")

    import jax

    from audio_style_transfer_tpu.data import NSynthDataset
    from audio_style_transfer_tpu.models.baseline_ae import (
        BaselineHParams,
        encode,
        init_baseline_params,
    )

    hparams = BaselineHParams(batch_size=args.batch_size)
    if args.checkpoint_dir:
        import orbax.checkpoint as ocp

        steps = [
            int(d.split("-")[1])
            for d in os.listdir(args.checkpoint_dir)
            if d.startswith("ckpt-")
        ]
        if not steps:
            raise FileNotFoundError(f"no checkpoints in {args.checkpoint_dir}")
        from audio_style_transfer_tpu.models.baseline_ae import train_step_fn

        params0 = init_baseline_params(jax.random.PRNGKey(0), hparams)
        _, init_state = train_step_fn(hparams)
        template = jax.tree.map(np.asarray, dict(init_state(params0)))
        ckptr = ocp.StandardCheckpointer()
        state = ckptr.restore(
            os.path.join(os.path.abspath(args.checkpoint_dir), f"ckpt-{max(steps)}"),
            template,
        )
        params = state["params"]
    else:
        params = init_baseline_params(jax.random.PRNGKey(0), hparams)

    os.makedirs(args.savedir, exist_ok=True)
    dataset = NSynthDataset(args.tfrecord_path, is_training=False)
    encode_jit = jax.jit(lambda p, s: encode(p, s, hparams, is_training=False)[0])

    for bi, batch in enumerate(dataset.get_baseline_batch(hparams)):
        if args.max_batches and bi >= args.max_batches:
            break
        z = np.asarray(encode_jit(params, batch["spectrogram"]))
        for i in range(z.shape[0]):
            key = batch["key"][i].decode("utf-8", "ignore") or f"b{bi}_{i}"
            np.savez(
                os.path.join(args.savedir, f"{key}_baseline_z.npz"),
                z=z[i],
                pitch=batch["pitch"][i],
            )
        print(f"batch {bi}: saved {z.shape[0]} latents")


if __name__ == "__main__":
    main()
