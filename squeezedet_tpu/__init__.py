"""SqueezeDet-TPU: a TPU-native (JAX/XLA/Pallas) object-detection framework.

A from-scratch rebuild of the capabilities of the SqueezeDet-PyTorch reference
(anchor-based one-stage detector on KITTI) designed TPU-first:

- pure-functional model (NHWC, params as a pytree) compiled with `jax.jit`
- fully on-device inference: decode + score fusion + top-K + class-wise NMS
  inside the jitted predict step; only fixed-shape detections reach the host
- SPMD data parallelism over a `jax.sharding.Mesh` (batch axis), XLA emits the
  gradient all-reduce over ICI
- host-side numpy input pipeline (augmentations produce variable shapes before
  the fixed-size resize, so they stay off-device) with async device prefetch
- Pallas kernels for hot ops, always tested against the `lax` reference path
- native C++ components: the official KITTI devkit 2D AP evaluator equivalent
  and a libpng-based image-loading/preprocessing library
"""

__version__ = "0.1.0"
