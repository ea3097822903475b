"""maskfusion_tpu — a TPU-native (JAX/XLA/Pallas) object-aware dynamic RGB-D
SLAM framework with the capabilities of MaskFusion (ISMAR '18).

Every independently moving object — plus the static background — gets its own
surfel map and 6-DoF pose track.  The per-frame pipeline (preprocess → track →
segment → fuse → clean → predict) is built from statically-shaped, jit-compiled
JAX functions and Pallas kernels operating on HBM-resident tensors; the host
side only orchestrates, streams frames, and runs lightweight label logic.

Layer map (mirrors SURVEY.md §1 of the reference analysis):
  ops/          dense kernels: preprocessing, GN reductions, splat/gather,
                fusion, clean, segmentation stencils   (ref: Core/Cuda, Core/Shaders)
  tracking/     projective ICP + photometric odometry  (ref: Core/Utils/RGBDOdometry)
  mapping/      per-object surfel maps + prediction    (ref: Core/Model)
  segmentation/ mask+geometry instance segmentation    (ref: Core/Segmentation)
  reloc/        ferns keyframe DB + deformation graph  (ref: Core/Ferns, Deformation)
  maskrcnn/     JAX Mask R-CNN inference graph         (ref: Core/Segmentation/MaskRCNN)
  io/           log readers, exporters                 (ref: GUI/Tools)
  parallel/     device-mesh sharding of the model axis and NN training
  engine.py     the per-frame pipeline                 (ref: Core/MaskFusion.cpp)
"""

__version__ = "0.1.0"

import jax as _jax

# Geometry code (pose chains, GN solves) is written against f32 semantics; do
# not let backends silently drop f32 matmuls to bf16.  NN code opts into bf16
# explicitly via parameter/activation dtypes, which this does not affect.
_jax.config.update("jax_default_matmul_precision", "float32")

from maskfusion_tpu.camera import CameraIntrinsics, Resolution
from maskfusion_tpu.config import Config

__all__ = ["CameraIntrinsics", "Resolution", "Config", "__version__"]
