"""mm_masking_tpu — TPU-native rebuild of utiasASRL/mm_masking.

A JAX/XLA/Pallas framework for learning per-pixel ICP weight masks over raw
Navtech radar scans, end-to-end through a differentiable ICP solver, for
radar→lidar localization on the Boreas dataset (arXiv:2309.08731).

Layering (bottom-up, see SURVEY.md §7):
  geom/        SE(3)/SO(3) Lie ops (replaces pylgmath/STEAM math)
  ops/         radar ops library (replaces mm_masking/radar_utils.py) + Pallas kernels
  dicp/        batched differentiable ICP (replaces external/dICP)
  models/      flax UNet weight-mask policy (replaces icp_weight_policy.py)
  data/        dataset, converters, synthetic generators (replaces icp_weight_dataset.py + ROS plumbing)
  parallel/    mesh / sharding helpers (TPU-native replacement for process fan-out)
  train/       jitted train step, losses, checkpoints (replaces train_icp_weights.py)
  evaluation/  baselines + sequence localization eval (replaces gen_data eval scripts)
"""

__version__ = "0.1.0"
