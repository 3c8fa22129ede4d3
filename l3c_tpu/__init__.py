"""l3c_tpu — TPU-native learned lossless image compression (L3C capabilities).

A from-scratch JAX/XLA/Pallas/pjit framework with the capabilities of
fab-jul/L3C-PyTorch (CVPR'19, arXiv 1811.12817): a multi-scale hierarchy of
convolutional feature extractors and predictors whose discretized logistic
mixture outputs drive a host-side C++ rANS entropy coder into a bit-exact
lossless bitstream.

Layout (see SURVEY.md for the reference layer map this build mirrors):
  models/    pure-function numerics core + flax multiscale network
  ops/       Pallas kernels + the C++ rANS entropy backend
  parallel/  jax.sharding Mesh / pjit data-parallel training utilities
  data/      host data pipeline (file caches, crops, testsets)
  train/     training runtime (trainer, LR schedules, checkpointing)
  codec/     bitstream format, file encode/decode, auto-crop tiling
  eval/      bpsp evaluation runtime, timers, result caches
  utils/     padding, config system, log dirs, printers
  convert/   PyTorch checkpoint -> JAX pytree importer
"""

__version__ = "0.1.0"
