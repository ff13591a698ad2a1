"""mpa_tpu — TPU-native framework for Markov-process point-cloud analysis.

A ground-up JAX/XLA/Pallas re-design of the capabilities of
ssr0512/Markov-Process-Analysis-on-Point-Cloud ("Revisiting 3D point cloud
analysis with Markov process", Pattern Recognition 2024):

- static-shape, kernel-backed point-set primitives (FPS, kNN, ball query,
  gather, scatter-mean upsample, 3-NN interpolation)   -> mpa_tpu.ops
- umbrella surface geometry (RepSurf features)          -> mpa_tpu.geometry
- Markov transition blocks (difference-wise attention,
  LocalMerge states, cross-scale Fuse)                  -> mpa_tpu.nn
- task models (classification, part/semantic seg,
  pose, completion)                                     -> mpa_tpu.models
- data pipelines + jit-able augmentation                -> mpa_tpu.data
- training loop, losses, metrics, TTA, checkpointing    -> mpa_tpu.train
- device-mesh data parallelism over ICI                 -> mpa_tpu.parallel
"""

__version__ = "0.1.0"
