"""Frame-to-map ICP odometry + teach-pass map building.

Basic-capability rebuild of the vtr3 odometry chain the reference's data
generation runs (`radar.odometry_icp` → `radar.odometry_map_maintenance` →
`radar.vertex_test`, `/root/reference/gen_data/config/radar_config.yaml:159-206`;
submodule empty — semantics from the config schema). The STEAM continuous-time
trajectory prior is intentionally out of scope (SURVEY.md §7.8: consume the
discrete-time solution); what this module provides is the *teach pass*: drive a
sequence of scans through frame-to-local-map ICP, keyframe on motion
thresholds, and maintain a voxelized local map with normals — enough to build
the lidar/radar maps the localization pipeline consumes.

All per-frame compute is jitted and fixed-shape; the map lives in a fixed-size
buffer (pad rows at the far sentinel).
"""
from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from mm_masking_tpu.dicp import ICPConfig, icp, TARGET_PAD_VAL
from mm_masking_tpu.geom import planar_xi_first_order, se3_inv, transform_points
from mm_masking_tpu.ops.preprocessing import estimate_normals, voxel_downsample


@dataclasses.dataclass(frozen=True)
class OdometryConfig:
    icp_type: str = "pt2pt"
    max_iterations: int = 30
    trim_dist: float = 5.0
    cauchy_k: float = 1.0
    # vertex_test thresholds; 0 → every frame is a keyframe (the reference's
    # data-gen setting, `radar_config.yaml:203-206`).
    max_translation: float = 0.0
    max_rotation_deg: float = 0.0
    voxel_size: float = 0.5
    max_map_pts: int = 8192
    normals_k: int = 8


def _icp_cfg(cfg: OdometryConfig) -> ICPConfig:
    return ICPConfig(
        icp_type=cfg.icp_type,
        max_iterations=cfg.max_iterations,
        differentiable=False,
        trim_dist=cfg.trim_dist,
        loss_name="cauchy",
        loss_metric=cfg.cauchy_k,
        dim=2,
    )


def register_frame(scan: jax.Array, map_pc: jax.Array, T_init: jax.Array,
                   cfg: OdometryConfig):
    """Align one scan (1, N, 3) against the local map (1, M, 3/6)."""
    valid = ~((scan[..., 0] == 0.0) & (scan[..., 1] == 0.0))
    out = icp(scan, map_pc, T_init, weight=valid.astype(scan.dtype),
              cfg=_icp_cfg(cfg))
    return out["T"]


def is_keyframe(T_delta: jax.Array, cfg: OdometryConfig) -> bool:
    """Motion since the last keyframe exceeds the vertex-test thresholds."""
    th, r = planar_xi_first_order(T_delta)
    trans = float(jnp.linalg.norm(r))
    rot_deg = float(jnp.max(jnp.abs(jnp.arcsin(jnp.clip(th, -1, 1))))) * 180.0 / np.pi
    return trans >= cfg.max_translation or rot_deg >= cfg.max_rotation_deg


def merge_into_map(map_pts: jax.Array, scan_world: jax.Array,
                   cfg: OdometryConfig) -> jax.Array:
    """Voxel-merge new world-frame scan points into the fixed-size map buffer.

    map_pts: (M, 3) with far-sentinel pads; scan_world: (N, 3) with (0,0,0)
    pads (dropped via the sentinel so they don't pollute cell (0,0,0)).
    """
    pad = (scan_world[:, 0] == 0.0) & (scan_world[:, 1] == 0.0)
    scan_world = jnp.where(pad[:, None], TARGET_PAD_VAL, scan_world)
    merged = jnp.concatenate([map_pts, scan_world], axis=0)
    keep = jnp.abs(merged[:, 0]) < TARGET_PAD_VAL / 2
    merged = jnp.where(keep[:, None], merged, TARGET_PAD_VAL)
    return voxel_downsample(
        merged, voxel=cfg.voxel_size, max_out=cfg.max_map_pts,
        pad_val=TARGET_PAD_VAL,
    )


class TeachPass:
    """Sequential odometry + map building over a scan stream."""

    def __init__(self, cfg: OdometryConfig = OdometryConfig()):
        self.cfg = cfg
        self.map_pts: jax.Array | None = None  # (M, 3) world frame
        self.T_world_robot = jnp.eye(4)[None]  # (1, 4, 4)
        self.T_last_key = jnp.eye(4)[None]
        self.trajectory: list[np.ndarray] = []
        self.n_keyframes = 0
        self._register = jax.jit(
            lambda s, m, T: register_frame(s, m, T, cfg)
        )

    def map_with_normals(self) -> jax.Array:
        """(1, M, 6) current map with estimated normals (for pt2pl loc)."""
        nrm, _ = estimate_normals(self.map_pts[None], k=self.cfg.normals_k)
        pad = jnp.abs(self.map_pts[:, 0]) >= TARGET_PAD_VAL / 2
        nrm = jnp.where(pad[None, :, None], TARGET_PAD_VAL, nrm)
        return jnp.concatenate([self.map_pts[None], nrm], axis=-1)

    def process(self, scan: jax.Array) -> jax.Array:
        """Feed one scan cloud (N, 3), world pose (4, 4) returned."""
        scan = scan[None] if scan.ndim == 2 else scan
        if self.map_pts is None:
            # Bootstrap: first frame seeds the map at the origin.
            init = jnp.full((self.cfg.max_map_pts, 3), TARGET_PAD_VAL,
                            scan.dtype)
            self.map_pts = merge_into_map(init, scan[0], self.cfg)
            self.n_keyframes = 1
            self.trajectory.append(np.eye(4))
            return jnp.eye(4)

        # Register against the map in the world frame, warm-started from the
        # last pose (constant-position prior).
        T = self._register(scan, self.map_pts[None], self.T_world_robot)
        self.T_world_robot = T
        self.trajectory.append(np.asarray(T[0]))

        T_delta = se3_inv(self.T_last_key) @ T
        if is_keyframe(T_delta[0][None], self.cfg):
            scan_world = transform_points(T, scan)[0]
            self.map_pts = merge_into_map(self.map_pts, scan_world, self.cfg)
            self.T_last_key = T
            self.n_keyframes += 1
        return T[0]
