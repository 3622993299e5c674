"""Detector bank: each of the five detectors fires on planted targets and
stays quiet on noise; CA-CFAR checked against a loop oracle."""
import numpy as np
import torch
import jax.numpy as jnp

from mm_masking_tpu.ops.detectors import (
    cacfar,
    cen2018,
    detect,
    doppler_shift,
    kstrongest,
    modified_cacfar,
    oscfar,
)

RES = 0.0596


def scan_with_targets(seed=0, B=1, A=8, R=600, n_targets=6, amp=3.0):
    rng = np.random.default_rng(seed)
    raw = (0.08 * rng.random((B, A, R))).astype(np.float32)
    targets = []
    for b in range(B):
        for a in range(A):
            for r in rng.integers(80, R - 80, n_targets):
                raw[b, a, r] = amp
                targets.append((b, a, int(r)))
    return raw, targets


def _check_detector(mask, targets, raw, max_noise=0.05):
    mask = np.asarray(mask)
    hit = sum(mask[b, a, r] > 0 for b, a, r in targets)
    assert hit / len(targets) > 0.9, f"only {hit}/{len(targets)} targets found"
    # False-alarm rate on the noise floor must be low.
    noise = (raw < 0.5) & (mask > 0)
    assert noise.mean() < max_noise


def test_kstrongest():
    raw, targets = scan_with_targets()
    mask = kstrongest(jnp.asarray(raw), RES, kstrong=8, threshold3=0.2,
                      minr=2.0, maxr=35.0)
    _check_detector(mask, targets, raw)
    # Never more than k detections per azimuth.
    assert np.asarray(mask).sum(axis=-1).max() <= 8


def test_cen2018():
    raw, targets = scan_with_targets(seed=1)
    mask = cen2018(jnp.asarray(raw), RES, zq=4.0, sigma=3, minr=2.0, maxr=35.0)
    # Gaussian smoothing smears target energy into neighboring bins, so the
    # "false alarm" count includes the legitimate smear ring around targets.
    _check_detector(mask, targets, raw, max_noise=0.1)


def test_cacfar_matches_loop_oracle():
    raw, _ = scan_with_targets(seed=2, A=3, R=200)
    width, guard = 21, 2
    w2 = width // 2
    got = np.asarray(
        cacfar(jnp.asarray(raw), RES, width=width, guard=guard, threshold=1.0,
               threshold3=0.08, minr=0.5, maxr=10.0)
    )
    raw_t = torch.from_numpy(raw)
    B, A, R = raw.shape
    rng_band = (np.arange(R) * RES >= 0.5) & (np.arange(R) * RES <= 10.0)
    for b in range(B):
        for a in range(A):
            for r in range(w2 + guard, R - w2 - guard):
                cells = np.concatenate([
                    raw[b, a, r - w2 - guard: r - guard],
                    raw[b, a, r + guard + 1: r + w2 + guard + 1],
                ])
                T = cells.mean() + 0.08
                want = float(raw[b, a, r] > T and rng_band[r])
                assert got[b, a, r] == want, (b, a, r)


def test_oscfar():
    raw, targets = scan_with_targets(seed=3)
    mask = oscfar(jnp.asarray(raw), RES, width=21, guard=1, kstat=10,
                  threshold=1.0, threshold3=0.07, minr=2.0, maxr=35.0)
    _check_detector(mask, targets, raw)


def test_modified_cacfar_and_dispatch():
    raw, targets = scan_with_targets(seed=4)
    mask = detect("modified_cacfar", jnp.asarray(raw), RES, width=21, guard=2,
                  threshold=1.0, threshold3=0.09, minr=2.0, maxr=35.0)
    _check_detector(mask, targets, raw)


def test_doppler_shift():
    pts = jnp.asarray([[[10.0, 0.0, 0.0], [0.0, 10.0, 0.0]]])
    az = jnp.asarray([[0.0, np.pi / 2]])
    vel = jnp.asarray([[2.0, 0.0]])  # moving along +x
    out = np.asarray(doppler_shift(pts, az, vel, beta=0.049))
    # Radial velocity 2 m/s on the first ray -> +0.098 m range shift.
    assert abs(np.linalg.norm(out[0, 0, :2]) - 10.098) < 1e-3
    # No radial component on the second ray.
    assert abs(np.linalg.norm(out[0, 1, :2]) - 10.0) < 1e-6


def test_motion_undistort_removes_scan_distortion():
    """A scan swept over 0.25 s from a platform turning at 1.5 rad/s and
    moving 2 m/s is distorted by ~0.3 m at 10 m range; the constant-velocity
    un-distortion (exact planar exponential) must recover the
    reference-time geometry to sub-mm."""
    from mm_masking_tpu.ops import motion_undistort

    rng = np.random.default_rng(3)
    n = 256
    world = np.zeros((n, 3), np.float32)
    r = rng.uniform(3, 15, n)
    a = rng.uniform(0, 2 * np.pi, n)
    world[:, 0] = r * np.cos(a)
    world[:, 1] = r * np.sin(a)

    vx, vy, w = 2.0, 0.3, 1.5  # m/s, rad/s — a fast turn
    times = rng.uniform(0.0, 0.25, n)  # seconds within the sweep

    def pose(t):
        th = w * t
        c, s = np.cos(th), np.sin(th)
        # T(t) = exp(t ξ): exact SE(2) exponential of the body twist.
        V = np.array([[np.sin(th) / th, -(1 - c) / th],
                      [(1 - c) / th, np.sin(th) / th]]) if th > 1e-9 else np.eye(2)
        T = np.eye(4)
        T[:2, :2] = [[c, -s], [s, c]]
        T[:2, 3] = V @ (np.array([vx, vy]) * t)
        return T

    distorted = np.zeros_like(world)
    for i, t in enumerate(times):
        Ti = np.linalg.inv(pose(t))
        distorted[i] = world[i] @ Ti[:3, :3].T + Ti[:3, 3]

    dist_err = np.linalg.norm(distorted[:, :2] - world[:, :2], axis=1)
    assert dist_err.max() > 0.3  # the distortion is material

    out = motion_undistort(
        jnp.asarray(distorted[None]),
        jnp.asarray(times[None]),
        jnp.asarray([[vx, vy]]),
        jnp.asarray([w]),
        t_ref=jnp.asarray([0.0]),
        time_to_sec=1.0,
    )
    und_err = np.linalg.norm(np.asarray(out)[0, :, :2] - world[:, :2], axis=1)
    assert und_err.max() < 1e-3, und_err.max()


def test_motion_undistort_preserves_pads_and_zero_rate():
    from mm_masking_tpu.ops import motion_undistort

    pts = jnp.asarray([[[1.0, 2.0, 0.0], [0.0, 0.0, 0.0]]])  # second row pad
    times = jnp.asarray([[0.1, 0.2]])
    out = motion_undistort(pts, times, jnp.asarray([[1.0, 0.0]]),
                           jnp.asarray([0.0]), time_to_sec=1.0)
    out = np.asarray(out)
    # ω = 0: pure translation v·dt with dt measured from the first REAL point.
    np.testing.assert_allclose(out[0, 0], [1.0, 2.0, 0.0], atol=1e-6)
    np.testing.assert_allclose(out[0, 1], [0.0, 0.0, 0.0], atol=0)


def test_motion_undistort_improves_icp_drift():
    """End effect at the solver: registering the distorted scan against the
    world map biases the pose; the un-distorted scan does not."""
    from mm_masking_tpu.dicp import ICPConfig, icp
    from mm_masking_tpu.ops import motion_undistort

    rng = np.random.default_rng(4)
    n = 384
    world = np.zeros((n, 3), np.float32)
    seg = rng.integers(0, 4, n)
    t = rng.uniform(-10, 10, n)
    world[:, 0] = np.where(seg % 2 == 0, t, np.where(seg == 1, 8.0, -9.0))
    world[:, 1] = np.where(seg % 2 == 0, np.where(seg == 0, 7.0, -6.0), t)

    vx, vy, w = 2.0, 0.0, 1.0
    times = np.sort(rng.uniform(0.0, 0.25, n))

    distorted = np.zeros_like(world)
    for i, ti in enumerate(times):
        th = w * ti
        c, s = np.cos(th), np.sin(th)
        R = np.array([[c, -s], [s, c]])
        V = np.array([[np.sin(th) / th, -(1 - c) / th],
                      [(1 - c) / th, np.sin(th) / th]]) if th > 1e-9 else np.eye(2)
        trans = V @ (np.array([vx, vy]) * ti)
        distorted[i, :2] = R.T @ (world[i, :2] - trans)

    fixed = np.asarray(motion_undistort(
        jnp.asarray(distorted[None]), jnp.asarray(times[None]),
        jnp.asarray([[vx, vy]]), jnp.asarray([w]), time_to_sec=1.0))

    cfg = ICPConfig(icp_type="pt2pt", max_iterations=30, differentiable=True)
    T0 = jnp.eye(4)[None]

    def err(scan):
        T = np.asarray(icp(jnp.asarray(scan), jnp.asarray(world[None]),
                           T0, cfg=cfg)["T"])[0]
        return np.linalg.norm(T[:2, 3]), abs(np.arctan2(T[1, 0], T[0, 0]))

    d_t, d_r = err(distorted[None])
    f_t, f_r = err(fixed)
    # Distortion at ~0.25 rad sweep biases the solution materially; the
    # un-distorted scan registers ~exactly.
    assert f_t < 0.02 and f_r < 0.005, (f_t, f_r)
    assert d_t > 3 * f_t or d_r > 3 * f_r, ((d_t, d_r), (f_t, f_r))
