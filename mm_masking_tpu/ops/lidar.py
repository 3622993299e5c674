"""Raw lidar ingestion: velodyne conversion + the vtr_lidar preprocessing chain.

Capability rebuild of `lidar.velodyne_converter` and `lidar.preprocessing`
(`/root/reference/gen_data/config/lidar_config.yaml:81-117` — the C++ lives in
the empty vtr3 submodule; the config knobs define the surface):

  conversion: optional horizontal FOV limit (``fov_center`` ± ``fov``/2, deg)
  filtering:  ``crop_range`` → ``frame_voxel_size`` grid subsample →
              normals via neighborhoods in a *scaled log-polar* metric
              (``r_scale``/``h_scale``/``vertical_angle_res``·``polar_r_scale``
              equalize the anisotropic spinning-lidar sampling) →
              stage 1: keep ≤ ``num_sample1`` points with planarity ≥
              ``min_norm_score1`` → stage 2: keep ≤ ``num_sample2`` by an
              incident-angle-corrected normal score ≥ ``min_norm_score2``,
              with normals only trusted beyond ``min_normal_estimate_dist``
              and under ``max_normal_estimate_angle``·π incidence.

Everything is fixed-shape (top-k selection instead of boolean compaction);
dropped rows are zeroed, matching the (0, 0) pad convention downstream.
"""
from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from mm_masking_tpu.ops.preprocessing import (
    estimate_normals,
    knn_indices,
    _sym_eigh_3x3,
    voxel_downsample,
)


@dataclasses.dataclass(frozen=True)
class LidarPreprocessConfig:
    """Mirrors the `lidar.preprocessing` parameter block."""

    crop_range: float = 60.0
    frame_voxel_size: float = 0.3
    vertical_angle_res: float = 0.0017453292519943296
    polar_r_scale: float = 2.0
    r_scale: float = 4.0
    h_scale: float = 2.0
    num_sample1: int = 10000
    min_norm_score1: float = 0.95
    num_sample2: int = 20000
    min_norm_score2: float = 0.0
    min_normal_estimate_dist: float = 2.0
    max_normal_estimate_angle: float = 0.42  # × π
    knn_k: int = 10
    max_voxels: int = 32768


def velodyne_convert(
    raw: jax.Array,
    use_fov_limit: bool = False,
    fov_center: float = 45.0,
    fov: float = 60.0,
) -> dict:
    """Raw velodyne returns (N, ≥3: x y z [intensity [t]]) → conversion dict.

    Returns {'points' (N, 3), 'polar' (N, 3) = (rho, theta, phi), 'valid'}
    with theta the polar (inclination) and phi the azimuth angle. The FOV
    limit zeroes returns whose azimuth falls outside ``fov_center ± fov/2``
    degrees (fixed-shape mask, not compaction).
    """
    pts = raw[..., :3]
    rho = jnp.linalg.norm(pts, axis=-1)
    phi = jnp.arctan2(pts[..., 1], pts[..., 0])
    theta = jnp.arccos(
        jnp.clip(pts[..., 2] / jnp.maximum(rho, 1e-12), -1.0, 1.0)
    )
    valid = rho > 1e-6
    if use_fov_limit:
        center = jnp.deg2rad(fov_center)
        half = jnp.deg2rad(fov) / 2.0
        d = jnp.abs((phi - center + jnp.pi) % (2 * jnp.pi) - jnp.pi)
        valid = valid & (d <= half)
    pts = jnp.where(valid[..., None], pts, 0.0)
    return {
        "points": pts,
        "polar": jnp.stack([rho, theta, phi], axis=-1),
        "valid": valid,
    }


def _scaled_polar_embedding(pts: jax.Array, cfg: LidarPreprocessConfig):
    """The log-polar metric the C++ module searches neighbors in: range →
    log(rho)/r_scale, azimuth → phi/h_scale, inclination unscaled (its
    resolution is the reference unit)."""
    rho = jnp.maximum(jnp.linalg.norm(pts, axis=-1), 1e-6)
    phi = jnp.arctan2(pts[..., 1], pts[..., 0])
    theta = jnp.arccos(jnp.clip(pts[..., 2] / rho, -1.0, 1.0))
    return jnp.stack(
        [jnp.log(rho) / cfg.r_scale, theta, phi / cfg.h_scale], axis=-1
    )


def _select_top(pts, nrm, score, ok, n_keep):
    """Keep ≤ n_keep rows by score among ok rows; zero the rest (fixed shape)."""
    masked = jnp.where(ok, score, -jnp.inf)
    k = min(n_keep, score.shape[-1])
    top, idx = jax.lax.top_k(masked, k)
    keep_valid = jnp.isfinite(top)
    sel_pts = jnp.take_along_axis(pts, idx[..., None], axis=-2)
    sel_nrm = jnp.take_along_axis(nrm, idx[..., None], axis=-2)
    sel_pts = jnp.where(keep_valid[..., None], sel_pts, 0.0)
    sel_nrm = jnp.where(keep_valid[..., None], sel_nrm, 0.0)
    return sel_pts, sel_nrm, keep_valid


def lidar_preprocess(
    points: jax.Array,
    cfg: LidarPreprocessConfig = LidarPreprocessConfig(),
) -> dict:
    """Full filtering chain on one frame (N, 3) → fixed-size filtered cloud.

    Returns {'points' (num_sample2, 3), 'normals' (num_sample2, 3),
    'valid' (num_sample2,)} — the cloud the lidar teach-map builder consumes
    (pad rows zeroed).
    """
    # 1. range crop (+ drop zero pads).
    rho = jnp.linalg.norm(points, axis=-1)
    in_range = (rho > 1e-6) & (rho <= cfg.crop_range)
    pts = jnp.where(in_range[..., None], points, 0.0)

    # 2. voxel subsample (fixed output size, zero pads).
    vox = voxel_downsample(
        pts, voxel=cfg.frame_voxel_size, max_out=cfg.max_voxels, pad_val=0.0
    )
    vvalid = jnp.any(vox != 0.0, axis=-1)

    # 3. normals from neighborhoods in the scaled log-polar metric. The
    # neighbor search runs in the embedding; the covariance/PCA runs on the
    # euclidean points (the C++ module's split).
    emb = _scaled_polar_embedding(vox, cfg)
    emb = jnp.where(vvalid[..., None], emb, 1e6)  # pads never neighbor
    idx = knn_indices(emb[None], cfg.knn_k)[0]  # (V, k)
    nbrs = vox[idx]  # (V, k, 3)
    mean = jnp.mean(nbrs, axis=1, keepdims=True)
    centered = nbrs - mean
    cov = jnp.einsum("nki,nkj->nij", centered, centered,
                     precision="highest") / cfg.knn_k
    vals, vecs = _sym_eigh_3x3(cov)
    normals = vecs[..., 0]
    flip = jnp.sum(normals * vox, axis=-1, keepdims=True) > 0
    normals = jnp.where(flip, -normals, normals)
    e1, e2, e3 = vals[..., 0], vals[..., 1], vals[..., 2]
    planarity = (e2 - e1) / jnp.maximum(e3, 1e-12)

    # Normal trust gates: distance + incidence angle.
    rho_v = jnp.maximum(jnp.linalg.norm(vox, axis=-1), 1e-9)
    cos_inc = jnp.abs(jnp.sum(normals * (-vox / rho_v[..., None]), axis=-1))
    incidence = jnp.arccos(jnp.clip(cos_inc, 0.0, 1.0))
    trust = (
        (rho_v >= cfg.min_normal_estimate_dist)
        & (incidence <= cfg.max_normal_estimate_angle * jnp.pi)
    )

    # 4. stage 1: planarity filter.
    ok1 = vvalid & trust & (planarity >= cfg.min_norm_score1)
    p1, n1, v1 = _select_top(vox, normals, planarity, ok1, cfg.num_sample1)

    # 5. stage 2: incident-angle-corrected score over the stage-1 survivors
    # plus everything that passed the relaxed bar (the module's second,
    # larger sample with min_norm_score2).
    score2 = planarity * cos_inc
    ok2 = vvalid & trust & (score2 >= cfg.min_norm_score2)
    p2, n2, v2 = _select_top(vox, normals, score2, ok2, cfg.num_sample2)

    return {
        "points": p2,
        "normals": n2,
        "valid": v2,
        "stage1_points": p1,
        "stage1_normals": n1,
        "stage1_valid": v1,
    }


def lidar_frame_to_map_cloud(
    raw: jax.Array,
    cfg: LidarPreprocessConfig = LidarPreprocessConfig(),
    use_fov_limit: bool = False,
    fov_center: float = 45.0,
    fov: float = 60.0,
) -> jax.Array:
    """Raw velodyne frame → (num_sample2, 6) [xyz + normals] cloud ready for
    the teach-pass map builder / radar_lidar localization map (the full
    `conversion → filtering` pipeline, one call)."""
    conv = velodyne_convert(raw, use_fov_limit, fov_center, fov)
    out = lidar_preprocess(conv["points"], cfg)
    return jnp.concatenate([out["points"], out["normals"]], axis=-1)
