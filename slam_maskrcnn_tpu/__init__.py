"""slam_maskrcnn_tpu — TPU-native semantic 3D reconstruction framework.

A ground-up JAX/XLA/Pallas rebuild of the capabilities of
qq456cvb/SLAM-MaskRCNN: Mask R-CNN instance segmentation over RGB-D video
(stage 1) feeding a semantic TSDF fusion engine with per-voxel instance
histograms, Bayesian cross-frame instance association, and a raycast
renderer (stage 2).

Layout:
  fusion/    TSDF volume state, fusion update, raycaster, instance association
  data/      TUM RGB-D frontend, synthetic datasets, prefetch pipeline
  models/    Mask R-CNN (Flax): backbone/FPN/RPN/heads, detection, losses
  ops/       box ops, ROIAlign, NMS — jnp reference + Pallas TPU kernels
  parallel/  device-mesh sharding (volume sharding, data parallel)
  train/     training loop, checkpointing
  eval/      mAP / COCO-style evaluation, RLE codec
  viz/       instance display + offline orbit viewer
"""

__version__ = "0.1.0"
