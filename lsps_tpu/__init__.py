"""LSPS-TPU: a TPU-native framework for 3D hand-pose estimation with a
shared latent space (capabilities of masabdi/LSPS, BMVC 2018, re-designed
for JAX/XLA/Pallas/pjit).

Layer map (bottom-up):
  data/      geometry, cameras, importers, detector, augmentation, loaders
  ops/       functional NN building blocks + Pallas TPU kernels
  models/    poseVAE, SharedResGen/SharedResXGen, SharedDis, Mapping
  train/     optimizers, jitted update steps, checkpointing
  eval/      hand-pose metrics and plots
  parallel/  device mesh + sharding rules (DP over ICI, optional model axis)
  serve/     fused single-program depth->pose inference
  cli/       pose_train / depth_train entry points
"""

__version__ = "0.1.0"

from lsps_tpu.config import NetConfig, load_config  # noqa: F401
