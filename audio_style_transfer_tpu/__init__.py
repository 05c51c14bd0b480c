"""TPU-native audio style transfer framework.

A ground-up JAX/XLA/Pallas re-design of the capabilities of
winlp4ever/audio_style_transfer (see /root/repo/SURVEY.md): an NSynth
WaveNet autoencoder with encoder feature taps, channel-wise / Gatys Gram
style losses, a fully on-device L-BFGS waveform optimizer, fast
autoregressive generation via `lax.scan`, data-parallel training over a
`jax.sharding.Mesh`, and the surrounding signal/visualization/analysis
toolkit (mu-law, STFT, CQT rainbowgrams, NMF + optimal transport).

Layering (bottom-up):
  signal/    pure signal kernels (mu-law codecs, STFT, spectrograms, CQT)
  ops/       NN primitives (dilated conv1d, pooling, Pallas kernels)
  models/    WaveNet AE (encoder taps / decoder / fastgen state)
  transfer/  Gram losses + on-device L-BFGS + style-transfer engine
  ckpt/      TF1 checkpoint -> pytree conversion, orbax-style saving
  generate/  encoder inference + autoregressive synthesis
  train/     data pipeline + distributed training step
  parallel/  mesh / collectives / time-axis halo sharding
  analysis/  NMF, optimal transport, gram & activation visualization
  cli/       argparse surfaces mirroring the reference binaries
"""

__version__ = "0.1.0"
