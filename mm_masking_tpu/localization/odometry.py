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
    # GN trust region (`ICPConfig.max_step_m`): caps each iteration's
    # translation update. A near-degenerate solve (frontier thinned, matches
    # collinear) otherwise hops metres in one step and the divergence
    # overflows f32 — measured on the e2e corridor teach pass. 0 disables.
    max_step_m: float = 2.0
    # vertex_test thresholds; 0 → every frame is a keyframe (the reference's
    # data-gen setting, `radar_config.yaml:203-206`).
    max_translation: float = 0.0
    max_rotation_deg: float = 0.0
    voxel_size: float = 0.5
    max_map_pts: int = 8192
    normals_k: int = 8
    # ICP warm start: "constant_velocity" extrapolates the last inter-frame
    # motion (the discrete-time analogue of the reference's WNOA/STEAM
    # trajectory prior, `radar_config.yaml:160-188` — white-noise-on-
    # acceleration means constant velocity is the MAP extrapolation);
    # "constant_position" reuses the previous pose (round-1 behavior).
    motion_prior: str = "constant_velocity"
    # Information weight of the motion prior *inside* the GN solve (WNOA
    # fusion, `radar_config.yaml:160-188`): keeps unobservable directions
    # (e.g. along-corridor translation) pinned to the extrapolated motion.
    # 0 = warm-start only (the prior seeds but does not constrain).
    prior_weight: float = 0.0
    # MC-RANSAC pre-filter (`radar_config.yaml:140-158`, disabled there too):
    # RANSAC over NN correspondences before ICP. `filter_pc` zeroes scan
    # points outside the RANSAC consensus (rejects gross clutter the robust
    # loss would otherwise drag in). `init_icp` warm-starts ICP from the
    # RANSAC pose — only meaningful with appearance-based correspondences
    # (the C++ module's ORB path); over NN pairs the consensus is ≈ the warm
    # start itself, so it defaults off.
    use_mcransac: bool = False
    mcransac_init_icp: bool = False
    mcransac_filter_pc: bool = True
    mcransac_tolerance: float = 0.1225
    mcransac_iterations: int = 100
    # Continuous-time registration (`dicp.ct_icp`): per-point pose
    # interpolation INSIDE the GN solve — the scan-period body twist becomes
    # a state estimated jointly with the pose, replacing the reference's
    # STEAM/WNOA continuous-time trajectory (`radar_config.yaml:160-188`).
    # Needs per-point times passed to `TeachPass.process`.
    continuous_time: bool = False
    # WNOA information weight tying the estimated twist to the extrapolated
    # inter-frame motion (the prior mean).
    ct_twist_prior_weight: float = 1.0


def _icp_cfg(cfg: OdometryConfig) -> ICPConfig:
    return ICPConfig(
        icp_type=cfg.icp_type,
        max_iterations=cfg.max_iterations,
        differentiable=False,
        trim_dist=cfg.trim_dist,
        loss_name="cauchy",
        loss_metric=cfg.cauchy_k,
        dim=2,
        prior_weight=cfg.prior_weight,
        max_step_m=cfg.max_step_m,
    )


def register_frame(scan: jax.Array, map_pc: jax.Array, T_init: jax.Array,
                   cfg: OdometryConfig):
    """Align one scan (1, N, 3) against the local map (1, M, 3/6)."""
    valid = ~((scan[..., 0] == 0.0) & (scan[..., 1] == 0.0))
    if cfg.use_mcransac:
        from mm_masking_tpu.ops.mcransac import (
            RansacConfig,
            mcransac,
            ransac_filter_pc,
        )
        from mm_masking_tpu.ops.pallas.nn_assoc import nn_argmin

        p = (
            jnp.einsum("bij,bnj->bni", T_init[:, :3, :3], scan,
                       precision="highest")
            + T_init[:, None, :3, 3]
        )
        idx, d2 = nn_argmin(p, map_pc[..., :3])
        tgt = jnp.take_along_axis(map_pc[..., :3], idx[..., None], axis=1)
        pairs_ok = valid & (d2 < cfg.trim_dist**2)
        res = mcransac(
            p, tgt, pairs_ok,
            RansacConfig(tolerance=cfg.mcransac_tolerance,
                         iterations=cfg.mcransac_iterations),
        )
        if cfg.mcransac_init_icp:
            T_init = jnp.matmul(res["T"].astype(T_init.dtype), T_init,
                                precision="highest")
        if cfg.mcransac_filter_pc:
            scan = ransac_filter_pc(scan, res["inliers"])
            valid = valid & res["inliers"]
    out = icp(scan, map_pc, T_init, weight=valid.astype(scan.dtype),
              cfg=_icp_cfg(cfg),
              T_prior=T_init if cfg.prior_weight > 0.0 else None)
    return out["T"]


def register_frame_ct(scan: jax.Array, times: jax.Array, map_pc: jax.Array,
                      T_init: jax.Array, xi_prior: jax.Array,
                      cfg: OdometryConfig):
    """Continuous-time registration of one scan (1, N, 3) + per-point times
    (1, N) against the local map: joint (pose, within-scan twist) GN solve
    (`dicp.ct_icp`). Returns (T_end (1, 4, 4), xi (1, 3))."""
    from mm_masking_tpu.dicp import CTICPConfig, ct_icp

    valid = ~((scan[..., 0] == 0.0) & (scan[..., 1] == 0.0))
    out = ct_icp(
        scan, times, map_pc, T_init,
        weight=valid.astype(scan.dtype),
        cfg=CTICPConfig(
            icp_type=cfg.icp_type,
            max_iterations=cfg.max_iterations,
            trim_dist=cfg.trim_dist,
            loss_name="cauchy",
            loss_metric=cfg.cauchy_k,
            twist_prior_weight=cfg.ct_twist_prior_weight,
            pose_prior_weight=cfg.prior_weight,
        ),
        xi_prior=xi_prior,
        T_prior=T_init if cfg.prior_weight > 0.0 else None,
    )
    return out["T_end"], out["xi"]


def orthonormalize_planar(T: jax.Array) -> jax.Array:
    """Project the planar rotation block of (..., 4, 4) poses back onto SO(2).

    The odometry chain composes hundreds of f32 matmuls (30 GN iterations ×
    every frame), each adding ~1e-7 of determinant drift — harmless alone,
    but the constant-velocity warm start `T·(T_prev⁻¹·T)` SQUARES the
    accumulated pose each frame, so log-det follows d_{k+1}=2d_k−d_{k-1}+ε
    and grows quadratically-to-exponentially: measured det(R) 1.007 by frame
    13 and 3.7 by frame 19 on the e2e corridor — the scaled warm start
    inflates the whole scan until registration diverges. atan2 cancels any
    isotropic scale, so this recovers the exact underlying angle.
    """
    th = jnp.arctan2(T[..., 1, 0], T[..., 0, 0])
    c, s = jnp.cos(th), jnp.sin(th)
    T = T.at[..., 0, 0].set(c).at[..., 0, 1].set(-s)
    T = T.at[..., 1, 0].set(s).at[..., 1, 1].set(c)
    return T


def is_keyframe(T_delta: jax.Array, cfg: OdometryConfig) -> bool:
    """Motion since the last keyframe exceeds the vertex-test thresholds."""
    th, r = planar_xi_first_order(T_delta)
    trans = float(jnp.linalg.norm(r))
    rot_deg = float(jnp.max(jnp.abs(jnp.arcsin(jnp.clip(th, -1, 1))))) * 180.0 / np.pi
    return trans >= cfg.max_translation or rot_deg >= cfg.max_rotation_deg


def merge_into_map(map_pts: jax.Array, scan_world: jax.Array,
                   cfg: OdometryConfig,
                   center: jax.Array | None = None,
                   map_w: jax.Array | None = None):
    """Voxel-merge new world-frame scan points into the fixed-size map buffer.

    map_pts: (M, 3) with far-sentinel pads; scan_world: (N, 3) with (0,0,0)
    pads (dropped via the sentinel so they don't pollute cell (0,0,0)).
    center: robot position (3,) — on buffer overflow the nearest cells to it
    survive (vtr's sliding local map, `radar_config.yaml:190-200`); without
    it, overflow eviction is hash-ordered (frontier cells can vanish).
    map_w: per-row observation weights (M,) — with it the merge is a
    PERSISTENT weighted mean (each map row carries its accumulated
    observation count; a new scan point adds weight 1) and the return value
    is an (means, weights) pair. Without it every merge re-weights a cell's
    whole history equal to one new point — the map becomes an EMA of the
    latest scan, and odometry error compounds through it (see
    `voxel_downsample`).
    """
    pad = (scan_world[:, 0] == 0.0) & (scan_world[:, 1] == 0.0)
    scan_world = jnp.where(pad[:, None], TARGET_PAD_VAL, scan_world)
    merged = jnp.concatenate([map_pts, scan_world], axis=0)
    keep = jnp.abs(merged[:, 0]) < TARGET_PAD_VAL / 2
    merged = jnp.where(keep[:, None], merged, TARGET_PAD_VAL)
    weights = None
    if map_w is not None:
        scan_w = jnp.where(pad, 0.0, 1.0).astype(merged.dtype)
        weights = jnp.concatenate(
            [jnp.where(keep[: map_pts.shape[0]], map_w, 0.0), scan_w])
    return voxel_downsample(
        merged, voxel=cfg.voxel_size, max_out=cfg.max_map_pts,
        pad_val=TARGET_PAD_VAL, center=center, weights=weights,
    )


class TeachPass:
    """Sequential odometry + map building over a scan stream."""

    def __init__(self, cfg: OdometryConfig = OdometryConfig()):
        self.cfg = cfg
        self.map_pts: jax.Array | None = None  # (M, 3) world frame
        self.map_w: jax.Array | None = None  # (M,) per-cell observation mass
        self.T_world_robot = jnp.eye(4)[None]  # (1, 4, 4)
        self.T_prev = None  # previous pose, for the velocity estimate
        self.T_last_key = jnp.eye(4)[None]
        self.trajectory: list[np.ndarray] = []
        self.stamps: list[int] = []
        self.n_keyframes = 0
        self._register = jax.jit(
            lambda s, m, T: orthonormalize_planar(
                register_frame(s, m, T, cfg))
        )

        def _reg_ct(s, t, m, T, xp):
            T_end, xi = register_frame_ct(s, t, m, T, xp, cfg)
            return orthonormalize_planar(T_end), xi

        self._register_ct = jax.jit(_reg_ct)

    def _warm_start(self) -> jax.Array:
        """ICP initial guess from the motion prior."""
        if (
            self.cfg.motion_prior != "constant_velocity"
            or self.T_prev is None
        ):
            return self.T_world_robot
        # T_init = T_k · (T_{k-1}⁻¹ · T_k): replay the last inter-frame motion.
        delta = se3_inv(self.T_prev) @ self.T_world_robot
        return self.T_world_robot @ delta

    def velocity_estimate(self, dt: float = 0.25) -> jax.Array:
        """Planar body-frame velocity (vx, vy) from the last inter-frame
        motion — feeds `ops.detectors.doppler_shift` (β=0.049 correction) in
        the extraction path."""
        if self.T_prev is None:
            return jnp.zeros(2)
        delta = (se3_inv(self.T_prev) @ self.T_world_robot)[0]
        return delta[:2, 3] / dt

    def map_with_normals(self) -> jax.Array:
        """(1, M, 6) current map with estimated normals (for pt2pl loc)."""
        nrm, _ = estimate_normals(self.map_pts[None], k=self.cfg.normals_k)
        pad = jnp.abs(self.map_pts[:, 0]) >= TARGET_PAD_VAL / 2
        nrm = jnp.where(pad[None, :, None], TARGET_PAD_VAL, nrm)
        return jnp.concatenate([self.map_pts[None], nrm], axis=-1)

    def _xi_prior(self) -> jax.Array:
        """WNOA twist-prior mean: exact planar log of the last inter-frame
        motion (constant-velocity extrapolation)."""
        from mm_masking_tpu.dicp.ct_icp import planar_log

        if self.T_prev is None:
            return jnp.zeros((1, 3))
        delta = se3_inv(self.T_prev) @ self.T_world_robot
        return planar_log(delta)

    def pose_at(self, stamp_us: int) -> tuple[jax.Array, jax.Array]:
        """Continuous-time trajectory query: WNOA Gauss-process interpolation
        of the odometry trajectory at an arbitrary timestamp (the across-knot
        capability of the reference's steam trajectory,
        `/root/reference/gen_data/config/radar_config.yaml:160-188`).

        Requires every `process` call to have carried a `stamp_us`. Returns
        (T_world_robot (4, 4), body twist (6,) in units/sec) at the query
        time, clamped to the processed span. Knot twists are estimated by
        central differences of the pose sequence (`body_twists_from_trajectory`).
        """
        from mm_masking_tpu.geom.gp_interp import interpolate_trajectory

        if len(self.stamps) != len(self.trajectory):
            raise ValueError(
                "pose_at needs a stamp for every processed frame "
                f"({len(self.stamps)} stamps vs {len(self.trajectory)} poses)"
            )
        Ts = jnp.asarray(np.stack(self.trajectory))
        times = jnp.asarray(self.stamps, Ts.dtype) * 1e-6
        Tq, wq = interpolate_trajectory(
            Ts, times, jnp.asarray([stamp_us * 1e-6], Ts.dtype)
        )
        return Tq[0], wq[0]

    def process(self, scan: jax.Array, stamp_us: int | None = None,
                times: jax.Array | None = None) -> jax.Array:
        """Feed one scan cloud (N, 3), world pose (4, 4) returned.

        times: optional (N,) per-point observation times — with
        `cfg.continuous_time` the frame is registered by the joint
        (pose, within-scan twist) solve (`dicp.ct_icp`) and the map is
        merged from twist-undistorted points.
        """
        scan = scan[None] if scan.ndim == 2 else scan
        ct = self.cfg.continuous_time and times is not None
        if ct:
            times = jnp.asarray(times)
            times = times[None] if times.ndim == 1 else times
        if stamp_us is not None:
            self.stamps.append(int(stamp_us))
        if self.map_pts is None:
            # Bootstrap: first frame seeds the map at the origin.
            init = jnp.full((self.cfg.max_map_pts, 3), TARGET_PAD_VAL,
                            scan.dtype)
            self.map_pts, self.map_w = merge_into_map(
                init, scan[0], self.cfg,
                center=jnp.zeros(3, scan.dtype),
                map_w=jnp.zeros((self.cfg.max_map_pts,), scan.dtype))
            self.n_keyframes = 1
            self.trajectory.append(np.eye(4))
            return jnp.eye(4)

        # Register against the map in the world frame, warm-started from the
        # motion prior.
        if ct:
            # The scan-START pose IS (approximately) the previous scan-end
            # pose — the sweep is continuous — so the constant-velocity
            # extrapolation lives in the twist prior, not the pose warm
            # start; ct_icp returns the scan-end pose.
            T, xi = self._register_ct(scan, times, self.map_pts[None],
                                      self.T_world_robot, self._xi_prior())
            self._last_xi = xi
        else:
            T = self._register(scan, self.map_pts[None], self._warm_start())
        self.T_prev = self.T_world_robot
        self.T_world_robot = T
        self.trajectory.append(np.asarray(T[0]))

        T_delta = se3_inv(self.T_last_key) @ T
        if is_keyframe(T_delta[0][None], self.cfg):
            if ct:
                # Merge UNDISTORTED points: u_i = Exp(s_i ξ)·p_i in the
                # scan-start frame, then through the scan-start pose.
                from mm_masking_tpu.dicp.ct_icp import undistort_with_twist
                from mm_masking_tpu.geom import se3_exp

                u = undistort_with_twist(scan, times, xi)
                d6 = jnp.zeros((1, 6), T.dtype)
                d6 = d6.at[:, 0].set(xi[:, 0]).at[:, 1].set(xi[:, 1])
                d6 = d6.at[:, 5].set(xi[:, 2])
                T_start = T @ se3_inv(se3_exp(d6))
                scan_world = transform_points(T_start, u)[0]
            else:
                scan_world = transform_points(T, scan)[0]
            self.map_pts, self.map_w = merge_into_map(
                self.map_pts, scan_world, self.cfg,
                center=T[0, :3, 3], map_w=self.map_w)
            self.T_last_key = T
            self.n_keyframes += 1
        return T[0]


def descriptor_bootstrap(
    img_a: jax.Array,
    pts_a: jax.Array,
    img_b: jax.Array,
    pts_b: jax.Array,
    cart_resolution: float,
    descriptor: str = "orb",
    nndr: float = 1.0,
    ransac_cfg=None,
    rng: jax.Array | None = None,
) -> dict:
    """Appearance-based relative pose between consecutive scans — the C++
    mcransac module's descriptor path (`radar_config.yaml:146-153`:
    ``descriptor: orb`` patch 31 / ``nndr``, or BASD nbins 16): descriptors
    at the extracted keypoints on the cartesian images, Hamming + NNDR +
    mutual matching, RANSAC consensus. Unlike the NN-correspondence flavor in
    :func:`register_frame`, this needs NO initial guess — it is the far-init
    bootstrap whose pose warm-starts ICP (``init_icp``) and whose consensus
    filters clutter (``filter_pc``).

    img_*: (B, H, W) cartesian images; pts_*: (B, N, 3) extracted keypoints
    (x=y=0 pads). Returns {'T' (B, 4, 4) mapping a→b, 'inliers', 'ok',
    'matches' (B, N) int32, 'match_ok' (B, N) bool}.
    """
    from mm_masking_tpu.ops.descriptors import (
        basd_descriptors,
        match_descriptors,
        orb_descriptors,
    )
    from mm_masking_tpu.ops.mcransac import RansacConfig, mcransac

    desc_fn = orb_descriptors if descriptor == "orb" else basd_descriptors
    da = jax.vmap(lambda i, p: desc_fn(i, p, cart_resolution))(img_a, pts_a)
    db = jax.vmap(lambda i, p: desc_fn(i, p, cart_resolution))(img_b, pts_b)
    va = ~((pts_a[..., 0] == 0.0) & (pts_a[..., 1] == 0.0))
    vb = ~((pts_b[..., 0] == 0.0) & (pts_b[..., 1] == 0.0))
    idx, ok = jax.vmap(
        lambda a, b, xa, xb: match_descriptors(a, b, xa, xb, nndr=nndr)
    )(da, db, va, vb)
    tgt = jnp.take_along_axis(pts_b[..., :2], idx[..., None], axis=1)
    res = mcransac(
        pts_a[..., :2], tgt, ok,
        ransac_cfg if ransac_cfg is not None else RansacConfig(),
        rng=rng,
    )
    res["matches"] = idx
    res["match_ok"] = ok
    return res
