"""Radar→lidar localization pipeline: raw Navtech scan → pose against a map.

Rebuild of the `radar_lidar.localization_icp` flow the reference's data
generation runs (`/root/reference/gen_data/config/radar_lidar_config.yaml:219-248`
— the vtr3 submodule is empty; structure reconstructed from the config schema:
lidar-map projection thresholds, two-phase initial/refined ICP with pairing
distance limits, Huber/Cauchy robust weighting, matched-ratio gating) plus the
`radar.navtech_extractor` front end (`radar_config.yaml:84-118`).

One frame = one jitted program:
  detector (any of the five) → peak extraction to a fixed-size cloud →
  optional Doppler correction → optional learned-mask weighting →
  map FOV/z-normal projection filter → initial ICP (coarse, few iters, loose
  trim) → refined ICP (tolerance-terminated, tight trim) → matched-ratio check.

Whole sequences batch through `localize_sequence`; frames are independent so
the mesh keeps every chip busy (replaces the reference's 6-way bash fan-out).
"""
from __future__ import annotations

import dataclasses
import functools
from typing import Any

import jax
import jax.numpy as jnp

from mm_masking_tpu.dicp import ICPConfig, icp
from mm_masking_tpu.ops import extract_pc, extract_weights
from mm_masking_tpu.ops.detectors import detect, doppler_shift


@dataclasses.dataclass(frozen=True)
class LocalizationConfig:
    """Mirrors the radar_lidar localization_icp + navtech_extractor surface."""

    detector: str = "modified_cacfar"
    detector_kwargs: tuple = ()  # dict items, e.g. (("width", 101),)
    radar_resolution: float = 0.0596
    max_points: int = 4096
    beta: float = 0.049  # Doppler factor; 0 disables
    # lidar map projection (the dataset's filter_map mirrors these)
    elevation_threshold: float = 0.05
    normal_threshold: float = 0.5
    # two-phase ICP
    icp_type: str = "pt2pl"
    initial_max_iter: int = 4
    initial_max_pairing_dist: float = 5.0
    refined_max_iter: int = 50
    refined_max_pairing_dist: float = 5.0
    cauchy_k: float = 1.0
    tolerance: float = 1e-5
    min_matched_ratio: float = 0.0
    # Constant-velocity motion-during-scan un-distortion (the cheap 80% of
    # the reference's continuous-time STEAM odometry prior,
    # radar_config.yaml:160-188). Needs `velocity` (and optionally
    # `yaw_rate`) passed to localize_frame.
    motion_undistort: bool = False
    az_time_to_sec: float = 1e-9  # az_times unit (load_radar emits ns)
    # Motion-gated NN refresh in the refined (while-loop) ICP; see
    # ICPConfig.nn_refresh_dist. 0 (default) = search every iteration —
    # reference semantics; bench/eval paths opt into 0.05 explicitly.
    nn_refresh_dist: float = 0.0
    # Trust-region clamp on each GN update's translation (m), both ICP
    # phases; see ICPConfig.max_step_m. 0 = off (reference semantics).
    max_step_m: float = 0.0


def project_map(map_pc: jax.Array, cfg: LocalizationConfig) -> jax.Array:
    """Zero out (→ pad-like) map points outside the radar's view.

    map_pc: (B, M, 6) in the scan frame. Points above the elevation threshold
    or with |z-normal| beyond the normal threshold are pushed to the far pad
    value so association never selects them (fixed-shape analogue of the
    C++ module's projection).
    """
    pts = map_pc[..., :3]
    nrm = map_pc[..., 3:6]
    elev = jnp.abs(
        jnp.arctan2(
            pts[..., 2],
            jnp.sqrt(pts[..., 0] ** 2 + pts[..., 1] ** 2) + 1e-30,
        )
    )
    ok = (elev <= cfg.elevation_threshold) & (
        jnp.abs(nrm[..., 2]) <= cfg.normal_threshold
    )
    far = jnp.asarray(1000.0, map_pc.dtype)
    out = jnp.where(ok[..., None], map_pc, far)
    return out


def localize_clouds(
    pc: jax.Array,
    map_pc: jax.Array,
    T_init: jax.Array,
    cfg: LocalizationConfig = LocalizationConfig(),
    pc_times: jax.Array | None = None,
    velocity: jax.Array | None = None,
    yaw_rate: jax.Array | None = None,
    weights: jax.Array | None = None,
) -> dict[str, Any]:
    """Register extracted clouds against a map (the back half of
    :func:`localize_frame`, shared with pre-extracted converter-shard input).

    pc (B, N, 3) zero-padded scan clouds; map_pc (B, M, 6) with normals
    (zero normals for pt2pt); T_init (B, 4, 4). Optional Doppler/motion
    correction when velocity (and pc_times) are given. Returns
    {'T', 'points', 'weights', 'matched_ratio', 'ok'}.
    """
    if cfg.beta > 0.0 and velocity is not None:
        ray = jnp.arctan2(pc[..., 1], pc[..., 0])
        pc = doppler_shift(pc, ray, velocity, beta=cfg.beta)
    if cfg.motion_undistort and velocity is not None and pc_times is not None:
        from mm_masking_tpu.ops.detectors import motion_undistort

        wz = (
            yaw_rate
            if yaw_rate is not None
            else jnp.zeros(pc.shape[0], pc.dtype)
        )
        pc = motion_undistort(
            pc, pc_times, velocity, wz, time_to_sec=cfg.az_time_to_sec
        )

    valid = ~((pc[..., 0] == 0.0) & (pc[..., 1] == 0.0))
    if weights is None:
        weights = valid.astype(pc.dtype)

    map_proj = project_map(map_pc, cfg)

    loss = {"name": "cauchy", "metric": cfg.cauchy_k}
    initial = icp(
        pc, map_proj, T_init, weight=weights,
        cfg=ICPConfig(
            icp_type=cfg.icp_type, max_iterations=cfg.initial_max_iter,
            differentiable=True, trim_dist=cfg.initial_max_pairing_dist,
            loss_name=loss["name"], loss_metric=loss["metric"], dim=2,
            max_step_m=cfg.max_step_m,
        ),
    )
    refined = icp(
        pc, map_proj, initial["T"], weight=weights,
        cfg=ICPConfig(
            icp_type=cfg.icp_type, max_iterations=cfg.refined_max_iter,
            differentiable=False, tolerance=cfg.tolerance,
            trim_dist=cfg.refined_max_pairing_dist,
            loss_name=loss["name"], loss_metric=loss["metric"], dim=2,
            nn_refresh_dist=cfg.nn_refresh_dist,
            max_step_m=cfg.max_step_m,
        ),
    )
    T = refined["T"]

    # Matched ratio: fraction of weighted scan points whose NN lies within the
    # refined pairing distance at the solution.
    from mm_masking_tpu.ops.pallas.nn_assoc import nn_argmin

    p = (
        jnp.einsum("bij,bnj->bni", T[:, :3, :3], pc, precision="highest")
        + T[:, None, :3, 3]
    )
    _, d2 = nn_argmin(jax.lax.stop_gradient(p),
                      jax.lax.stop_gradient(map_proj[..., :3]))
    matched = (d2 < cfg.refined_max_pairing_dist**2) & valid
    n_valid = jnp.maximum(jnp.sum(valid, axis=1), 1)
    ratio = jnp.sum(matched, axis=1) / n_valid

    return {
        "T": T,
        "points": pc,
        "weights": weights,
        "matched_ratio": ratio,
        "ok": ratio >= cfg.min_matched_ratio,
    }


def localize_frame(
    fft: jax.Array,
    azimuths: jax.Array,
    az_times: jax.Array,
    map_pc: jax.Array,
    T_init: jax.Array,
    cfg: LocalizationConfig = LocalizationConfig(),
    velocity: jax.Array | None = None,
    yaw_rate: jax.Array | None = None,
    weight_mask: jax.Array | None = None,
    mask_cart_resolution: float = 0.2384,
    mask_cart_width: int = 640,
) -> dict[str, Any]:
    """Batched single-frame localization from raw polar scans.

    fft (B, A, R) raw polar power; azimuths/az_times (B, A); map_pc (B, M, 6)
    with normals, already in (or near) the scan frame; T_init (B, 4, 4).
    Detector + peak extraction front end, then :func:`localize_clouds`.
    Returns {'T', 'points', 'weights', 'matched_ratio', 'ok'}.
    """
    det_kwargs = dict(cfg.detector_kwargs)
    mask = detect(cfg.detector, fft, cfg.radar_resolution, **det_kwargs)
    pc, pc_times = extract_pc(
        mask, cfg.radar_resolution, azimuths, az_times,
        max_points=cfg.max_points, diff=False, return_times=True,
    )
    weights = None
    if weight_mask is not None:
        weights, _ = extract_weights(
            weight_mask, pc, cart_resolution=mask_cart_resolution,
            cart_pixel_width=mask_cart_width,
        )
    return localize_clouds(
        pc, map_pc, T_init, cfg=cfg, pc_times=pc_times,
        velocity=velocity, yaw_rate=yaw_rate, weights=weights,
    )


_localize_frame_jit = jax.jit(
    localize_frame,
    static_argnames=("cfg", "mask_cart_resolution", "mask_cart_width"),
)


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "mask_fn", "mask_cart_resolution",
                     "mask_cart_width"),
)
def _localize_sequence_fused(fft, az, azt, map_b, T0, cfg, mask_fn=None,
                             mask_variables=None,
                             mask_cart_resolution=0.2384,
                             mask_cart_width=640):
    """All chunks in ONE device program: `lax.map` over the chunk axis.

    Replaces the per-chunk Python dispatch loop (a host→device round-trip
    per chunk through the axon tunnel, ~3 ms each, plus a full host sync at
    the final concatenate) with a single dispatch + single sync — the
    device pipelines chunk k+1 while chunk k's results are still in flight.
    fft (C, B, A, R); az/azt (C, B, A); map_b (B, M, 6) shared; T0 (C, B, 4, 4).

    `mask_fn(mask_variables, fft_chunk, az_chunk)` (static, e.g. a trained
    policy's `mask_for_scan`) runs learned-mask inference INSIDE the same
    fused program, weighting the ICP per frame — the deployment-fork path.
    """

    def body(chunk):
        f, a, t, T = chunk
        wm = None
        if mask_fn is not None:
            wm = mask_fn(mask_variables, f, a)
        return localize_frame(
            f, a, t, map_b, T, cfg=cfg, weight_mask=wm,
            mask_cart_resolution=mask_cart_resolution,
            mask_cart_width=mask_cart_width,
        )

    return jax.lax.map(body, (fft, az, azt, T0))


@functools.partial(jax.jit, static_argnames=("cfg",))
def _localize_clouds_fused(pc, map_b, T0, cfg):
    """Fused chunked cloud registration; see `_localize_sequence_fused`."""

    def body(chunk):
        p, T = chunk
        return localize_clouds(p, map_b, T, cfg=cfg)

    return jax.lax.map(body, (pc, T0))


def _pad_chunk(arrays, F: int, batch_size: int):
    """Pad each (F, ...) array to a batch multiple (repeating the last frame)
    and reshape to (n_chunks, batch_size, ...)."""
    pad = (-F) % batch_size

    def prep(x):
        if pad:
            x = jnp.concatenate([x, jnp.repeat(x[-1:], pad, axis=0)])
        return x.reshape((-1, batch_size) + x.shape[1:])

    return tuple(prep(x) for x in arrays), pad


def localize_sequence(
    frames,
    map_pc,
    cfg: LocalizationConfig = LocalizationConfig(),
    T_inits=None,
    batch_size: int = 8,
    mesh=None,
    weight_policy=None,
    policy_variables=None,
):
    """Localize a whole sequence against one map, batching frames through a
    single jitted `localize_frame` program (replaces the reference's 6-way
    bash process fan-out, `run_parallel_test.sh:66-101`).

    frames: either a dict of stacked arrays {'fft' (F, A, R), 'azimuths'
    (F, A), 'az_times' (F, A)} or a list of per-frame dicts (stacked here).
    Frames are independent, so they ride the *batch* axis — chunks of
    ``batch_size`` frames per device program, optionally sharded over a data
    mesh so every chip localizes its own slice. Without a mesh, every chunk
    runs inside ONE fused program (`lax.map` over chunks: one dispatch, one
    sync); with a mesh, the SAME fused program runs with each chunk's batch
    axis sharded over the devices.

    `weight_policy` + `policy_variables` (a `LearnICPWeightPolicy` and its
    trained variables) run learned-mask inference per frame inside the same
    fused program and weight the ICP with the mask — the reference
    deployment forks' LibTorch in-the-loop mask inference (SURVEY.md §2.3).

    Returns a dict of stacked results over all F frames
    ({'T', 'points', 'weights', 'matched_ratio', 'ok'}).
    """
    if isinstance(frames, (list, tuple)):
        # Normalize each per-frame dict to batched form and CONCATENATE — a
        # dict may legitimately carry several frames on a leading batch axis
        # (the shape localize_frame itself takes); slicing [0] here would
        # silently drop all but the first.
        def batched(v, base_ndim):
            v = jnp.asarray(v)
            return v if v.ndim > base_ndim else v[None]

        frames = {
            k: jnp.concatenate(
                [batched(fr[k], 2 if k == "fft" else 1) for fr in frames]
            )
            for k in ("fft", "azimuths", "az_times")
        }
    F = frames["fft"].shape[0]
    if T_inits is None:
        T_inits = jnp.broadcast_to(jnp.eye(4), (F, 4, 4))
    if map_pc.ndim == 2:
        map_pc = map_pc[None]
    map_b = jnp.broadcast_to(map_pc, (batch_size,) + map_pc.shape[1:])

    mask_kw = {}
    if weight_policy is not None:
        pm = weight_policy.cfg.model
        mask_kw = dict(
            mask_fn=weight_policy.mask_for_scan,
            mask_variables=policy_variables,
            mask_cart_resolution=pm.cart_resolution,
            mask_cart_width=pm.cart_pixel_width,
        )

    if mesh is None:
        (fft, az, azt, T0), _ = _pad_chunk(
            (frames["fft"], frames["azimuths"], frames["az_times"], T_inits),
            F, batch_size)
        out = _localize_sequence_fused(fft, az, azt, map_b, T0, cfg=cfg,
                                       **mask_kw)
        return jax.tree.map(
            lambda x: x.reshape((-1,) + x.shape[2:])[:F], out)

    # Sharded: the SAME fused program, with each chunk's batch axis spread
    # over the mesh (axis 1 of the (C, B, …) stacking) and the map
    # replicated — GSPMD runs the lax.map body SPMD, so the fused
    # one-dispatch/one-sync structure survives sharding (previously this
    # path dispatched per chunk from Python).
    from mm_masking_tpu.parallel.mesh import shard_axis, shard_batch

    (fft, az, azt, T0), _ = _pad_chunk(
        (frames["fft"], frames["azimuths"], frames["az_times"], T_inits),
        F, batch_size)
    with mesh:
        fft, az, azt, T0 = shard_axis((fft, az, azt, T0), mesh, axis=1)
        map_b = shard_batch(map_b, mesh)
        out = _localize_sequence_fused(fft, az, azt, map_b, T0, cfg=cfg,
                                       **mask_kw)
    return jax.tree.map(lambda x: x.reshape((-1,) + x.shape[2:])[:F], out)


def localize_cloud_sequence(
    clouds,
    map_pc,
    cfg: LocalizationConfig = LocalizationConfig(),
    T_inits=None,
    batch_size: int = 8,
    mesh=None,
):
    """Localize a sequence of pre-extracted clouds (e.g. converter shards,
    `data/convert.py` `filt_pc`) against one map — the same registration,
    matched-ratio gating, and chunk batching as :func:`localize_sequence`,
    minus the detector front end (clouds are already extracted).

    clouds (F, N, 3) zero-padded; map_pc (M, 3|6) or (1, M, 3|6) — a
    3-column map gets zero normals appended (pt2pt). Returns the stacked
    result dict ({'T', 'points', 'weights', 'matched_ratio', 'ok'}).
    """
    clouds = jnp.asarray(clouds)
    F = clouds.shape[0]
    if T_inits is None:
        T_inits = jnp.broadcast_to(jnp.eye(4), (F, 4, 4))
    map_pc = jnp.asarray(map_pc)
    if map_pc.ndim == 2:
        map_pc = map_pc[None]
    if map_pc.shape[-1] < 6:
        map_pc = jnp.concatenate(
            [map_pc,
             jnp.zeros(map_pc.shape[:-1] + (6 - map_pc.shape[-1],),
                       map_pc.dtype)], axis=-1)
    map_b = jnp.broadcast_to(map_pc, (batch_size,) + map_pc.shape[1:])

    if mesh is None:
        (pc, T0), _ = _pad_chunk((clouds, T_inits), F, batch_size)
        out = _localize_clouds_fused(pc, map_b, T0, cfg=cfg)
        return jax.tree.map(
            lambda x: x.reshape((-1,) + x.shape[2:])[:F], out)

    # Sharded: fused program with the batch axis spread over the mesh (see
    # localize_sequence's mesh branch).
    from mm_masking_tpu.parallel.mesh import shard_axis, shard_batch

    (pc, T0), _ = _pad_chunk((clouds, T_inits), F, batch_size)
    with mesh:
        pc, T0 = shard_axis((pc, T0), mesh, axis=1)
        map_b = shard_batch(map_b, mesh)
        out = _localize_clouds_fused(pc, map_b, T0, cfg=cfg)
    return jax.tree.map(lambda x: x.reshape((-1,) + x.shape[2:])[:F], out)


def localize_sequence_tracked(
    frames,
    map_pc,
    cfg: LocalizationConfig = LocalizationConfig(),
    T0=None,
    weight_policy=None,
    policy_variables=None,
    clouds=None,
) -> dict[str, Any]:
    """Sequential repeat-pass TRACKING against one global map: frame k
    warm-starts from the constant-velocity extrapolation of the previous two
    solutions — the role VTR's live odometry prior plays in the repeat pass
    (tactic odometry feeding `localization_icp`,
    `radar_lidar_config.yaml:51-71`) — so no external (GT) prior is needed
    beyond the first frame's ``T0``.

    Inherently sequential (one jitted frame program per step, batch 1), so
    it trades the batched path's throughput for prior-free operation; use
    `localize_sequence(..., T_inits=...)` when priors exist. The warm start
    is re-orthonormalized every step (see `odometry.orthonormalize_planar` —
    the extrapolation ``T·(T_prev⁻¹·T)`` squares determinant drift).

    frames: {'fft' (F, A, R), 'azimuths', 'az_times'} — or pass pre-extracted
    ``clouds`` (F, N, 3) instead. Returns stacked results like
    `localize_sequence`.
    """
    from mm_masking_tpu.geom import se3_inv
    from mm_masking_tpu.localization.odometry import orthonormalize_planar

    if clouds is None:
        F = frames["fft"].shape[0]
    else:
        if weight_policy is not None:
            raise ValueError(
                "localize_sequence_tracked: weight_policy needs raw frames "
                "(the mask is computed from the scan image); got clouds"
            )
        clouds = jnp.asarray(clouds)
        F = clouds.shape[0]
    if map_pc.ndim == 2:
        map_pc = map_pc[None]

    mask_kw = {}
    mask_fn = None
    if weight_policy is not None:
        pm = weight_policy.cfg.model
        mask_kw = dict(mask_cart_resolution=pm.cart_resolution,
                       mask_cart_width=pm.cart_pixel_width)
        # One compiled mask program reused every frame (eager per-frame UNet
        # dispatch costs per-op overhead on every iteration of this loop).
        # NB batch-global normalization statistics are per CALL — here one
        # frame at a time, vs per chunk in the batched path; the reference
        # has the same batch-size coupling (`icp_weight_policy.py:151-159`).
        mask_fn = jax.jit(weight_policy.mask_for_scan)

    T_prev2 = T_prev = jnp.asarray(
        jnp.eye(4) if T0 is None else T0, jnp.float32)
    outs = []
    for k in range(F):
        T_init = orthonormalize_planar(
            T_prev @ (se3_inv(T_prev2) @ T_prev))[None]
        if clouds is None:
            wm = None
            if mask_fn is not None:
                wm = mask_fn(policy_variables, frames["fft"][k:k + 1],
                             frames["azimuths"][k:k + 1])
            out = _localize_frame_jit(
                frames["fft"][k:k + 1], frames["azimuths"][k:k + 1],
                frames["az_times"][k:k + 1], map_pc, T_init, cfg=cfg,
                weight_mask=wm, **mask_kw)
        else:
            out = _localize_clouds_jit(clouds[k:k + 1], map_pc, T_init,
                                       cfg=cfg)
        outs.append(out)
        # A matched-ratio-gated frame must not poison the chain: keep
        # extrapolating through it (its wild pose would otherwise be SQUARED
        # into frame k+1's warm start). With min_matched_ratio=0 (default)
        # every frame passes — unchanged reference-style behavior.
        T_sol = jnp.where(out["ok"][0], out["T"][0], T_init[0])
        T_prev2, T_prev = T_prev, T_sol
    return jax.tree.map(lambda *x: jnp.concatenate(x, axis=0), *outs)


_localize_clouds_jit = jax.jit(localize_clouds, static_argnames=("cfg",))


def localize_sequence_to_traj(
    frames,
    map_pc,
    times_us,
    out_path: str,
    cfg: LocalizationConfig = LocalizationConfig(),
    T_inits=None,
    batch_size: int = 8,
    mesh=None,
    weight_policy=None,
    policy_variables=None,
) -> dict:
    """Run :func:`localize_sequence` and write a trajectory file that
    `evaluation.gt_tools.eval_localization_run` consumes (closing the
    data-gen → eval seam the reference drives through
    `run_eval.sh` → `extract_loc_gt_v2.py`).

    The solver's ``T`` maps scan→map (``p_map ≈ T p_loc``, i.e. T_map_loc);
    trajectory rows carry ``T_loc_map`` per the GT tools' convention.
    """
    import numpy as np

    from mm_masking_tpu.evaluation.gt_tools import write_traj_file
    from mm_masking_tpu.geom import se3_inv

    out = localize_sequence(frames, map_pc, cfg=cfg, T_inits=T_inits,
                            batch_size=batch_size, mesh=mesh,
                            weight_policy=weight_policy,
                            policy_variables=policy_variables)
    T_loc_map = np.asarray(se3_inv(out["T"]))
    write_traj_file(out_path, list(T_loc_map), [int(t) for t in times_us])
    return out
