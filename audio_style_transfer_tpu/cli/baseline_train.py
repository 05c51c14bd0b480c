"""Baseline spectral-AE training CLI (reference nsynth/baseline/train.py:29-96).

The reference trained this model with *asynchronous* parameter-server
workers; async PS is not idiomatic on TPU (SURVEY.md §2d), so this driver
runs the same model/loss synchronously on the local device(s).
"""

from __future__ import annotations

import argparse
import os
import time


def build_parser():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--train_path", default="", help="Path to the train tfrecord.")
    p.add_argument("--logdir", default="/tmp/nsynth_baseline")
    p.add_argument("--config", default="nfft_1024", help="Config name (hparams set)")
    p.add_argument("--num_iters", type=int, default=10000)
    p.add_argument("--batch_size", type=int, default=8)
    p.add_argument("--log_every", type=int, default=50)
    p.add_argument("--save_every", type=int, default=1000)
    return p


def main(argv=None):
    from audio_style_transfer_tpu.utils.profiling import enable_compile_cache

    enable_compile_cache()
    args = build_parser().parse_args(argv)
    if not args.train_path:
        raise RuntimeError("No --train_path specified.")

    import jax
    import numpy as np

    from audio_style_transfer_tpu.data import NSynthDataset
    from audio_style_transfer_tpu.models.baseline_ae import (
        BaselineHParams,
        init_baseline_params,
        train_step_fn,
    )
    from audio_style_transfer_tpu.utils.profiling import MetricsLogger

    hparams = BaselineHParams(batch_size=args.batch_size)
    params = init_baseline_params(jax.random.PRNGKey(0), hparams)
    step_fn, init_state = train_step_fn(hparams)
    step_fn = jax.jit(step_fn)
    state = init_state(params)

    dataset = NSynthDataset(args.train_path, is_training=True)
    batches = dataset.get_baseline_batch(hparams)

    os.makedirs(args.logdir, exist_ok=True)
    metrics = MetricsLogger(args.logdir)
    t0 = time.time()
    for i, batch in enumerate(batches):
        if i >= args.num_iters:
            break
        state, loss = step_fn(
            state,
            {"spectrogram": batch["spectrogram"], "pitch": batch["pitch"]},
        )
        step = int(state["step"])
        if step % args.log_every == 0:
            print(
                f"step {step} loss {float(loss):.5f} "
                f"({step / (time.time() - t0):.2f} steps/s)"
            )
            metrics.log(step, loss=float(loss))
        if args.save_every and step % args.save_every == 0:
            import orbax.checkpoint as ocp

            ckptr = ocp.StandardCheckpointer()
            ckptr.save(
                os.path.join(os.path.abspath(args.logdir), f"ckpt-{step}"),
                dict(state), force=True,
            )
            ckptr.wait_until_finished()
    metrics.close()


if __name__ == "__main__":
    main()
