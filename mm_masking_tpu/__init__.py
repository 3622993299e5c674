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

# Honor an explicitly-set JAX_PLATFORMS before any backend init. The axon TPU
# plugin registers itself regardless of the env var (only the config call
# reliably pins the platform — tests/conftest.py documents this), so without
# this, `JAX_PLATFORMS=cpu python -m mm_masking_tpu....` still initializes the
# TPU client — and HANGS every CLI surface when the tunnel is wedged. Honoring
# the variable the user explicitly set is the principle of least surprise;
# when it is unset, backend selection is untouched.
import os as _os

if _os.environ.get("JAX_PLATFORMS"):
    import jax as _jax

    _jax.config.update("jax_platforms", _os.environ["JAX_PLATFORMS"])
del _os
