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
