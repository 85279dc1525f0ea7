"""ubpl_tpu — TPU-native semi-supervised 2D pose estimation framework.

A ground-up JAX/XLA/Pallas re-design of the capabilities of
Qi2019KB/UBPL-PoseEstimation (PyTorch, single-GPU): Mean-Teacher +
Uncertainty-Based Pseudo-Labeling over stacked-hourglass heatmap regression,
with the full augmentation + target-synthesis pipeline fused into the
compiled training step and data parallelism expressed over a
``jax.sharding.Mesh``.

Layers (bottom-up):
  ops/       batched XLA/Pallas kernels: affine transforms, Gaussian heatmap
             synthesis, argmax decode, PCK, feature covariance
  models/    flax.linen model zoo: StackedHourglass, LitePose, CIFAR
             classifiers (VGG/ResNet/MobileNet)
  data/      datasources (Mouse/FLIC/LSP/AP-10K/Fly/Pranav/CIFAR), semi
             splits, two-stream batch composition, device-side pipeline
  train/     losses, schedules, EMA, the four training regimes
             (supervised / MT / MT_UBPL / DualPose_UBPL) as fused jitted steps
  parallel/  mesh + sharding utilities (dp over ICI, ensemble-branch axis)
  utils/     logging, checkpointing (orbax), json run logs
"""

__version__ = "0.1.0"
