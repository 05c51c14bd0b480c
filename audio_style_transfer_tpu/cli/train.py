"""WaveNet-AE training CLI — mirror of reference nsynth/wavenet/train.py:32-50.

The parameter-server flags (master/task/worker_replicas/ps_tasks) are
superseded by the device mesh: pass --num_devices to shard the batch over
local TPU chips; gradients all-reduce over ICI.

    python -m audio_style_transfer_tpu.cli.train \
        --train_path data.tfrecord --logdir /tmp/nsynth --total_batch_size 32
"""

from __future__ import annotations

import argparse


def build_parser():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--config", default="model", help="Model configuration name")
    p.add_argument("--total_batch_size", type=int, default=1,
                   help="Batch size spread across all replicas. We use 32.")
    p.add_argument("--logdir", default="/tmp/nsynth",
                   help="The log directory for this experiment.")
    p.add_argument("--train_path", default="",
                   help="The path to the train tfrecord.")
    p.add_argument("--log", default="INFO")
    p.add_argument("--num_iters", type=int, default=200000)
    p.add_argument("--num_devices", type=int, default=None,
                   help="Devices in the data-parallel mesh (default: all).")
    p.add_argument("--sample_length", type=int, default=6144)
    p.add_argument("--resume", action="store_true",
                   help="Resume from the latest checkpoint in logdir.")
    return p


def main(argv=None):
    from audio_style_transfer_tpu.utils.profiling import enable_compile_cache

    enable_compile_cache()
    args = build_parser().parse_args(argv)
    if not args.train_path:
        raise RuntimeError("No --train_path specified.")

    from audio_style_transfer_tpu.data import NSynthDataset
    from audio_style_transfer_tpu.parallel import make_mesh
    from audio_style_transfer_tpu.train import TrainConfig, Trainer

    mesh = make_mesh(args.num_devices)
    cfg = TrainConfig(
        total_batch_size=args.total_batch_size,
        sample_length=args.sample_length,
        num_iters=args.num_iters,
        logdir=args.logdir,
    )
    trainer = Trainer(cfg, mesh=mesh)
    state = trainer.restore() if args.resume else trainer.init_state()

    dataset = NSynthDataset(args.train_path, is_training=True)
    batches = dataset.get_wavenet_batch(
        args.total_batch_size, length=args.sample_length
    )
    state = trainer.fit(state, batches, num_steps=args.num_iters)
    trainer.save(state)


if __name__ == "__main__":
    main()
