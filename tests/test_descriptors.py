"""Keypoint descriptor tests: ORB steering, BASD rotation invariance, and the
descriptor → Hamming/NNDR match → mcransac motion-recovery chain (the
`radar.mcransac` correspondence front-end, `radar_config.yaml:146-153`)."""
import numpy as np
import jax
import jax.numpy as jnp

from mm_masking_tpu.ops.descriptors import (
    BasdConfig,
    OrbConfig,
    basd_descriptors,
    match_descriptors,
    orb_descriptors,
)

RES = 0.25  # m/px
WIDTH = 256


def render(landmarks, jitter, seed):
    """Gaussian-blob radar-like image from metric landmark positions, with a
    per-landmark asymmetric lobe so patches are orientation-bearing."""
    rng = np.random.default_rng(seed)
    r = (WIDTH - 1) / 2.0
    yy, xx = np.mgrid[0:WIDTH, 0:WIDTH]
    x = -(yy - r) * RES  # row → x (up = +x)
    y = (xx - r) * RES
    img = np.zeros((WIDTH, WIDTH), np.float32)
    for i, (lx, ly) in enumerate(landmarks):
        d2 = (x - lx) ** 2 + (y - ly) ** 2
        img += np.exp(-d2 / (2 * 0.6**2))
        # A distinctive satellite constellation per landmark (offsets move
        # rigidly with the scene — the jitter rows are rotated by the test's
        # motion), so descriptors are discriminative across keypoints and a
        # rotation rotates the patch (what ORB steering must absorb).
        for k in range(jitter.shape[1]):
            ox, oy = jitter[i, k]
            amp = 0.4 + 0.5 * ((i * 7 + k * 3) % 5) / 4.0
            sig = 0.3 + 0.15 * ((i + k) % 3)
            d2l = (x - (lx + ox)) ** 2 + (y - (ly + oy)) ** 2
            img += amp * np.exp(-d2l / (2 * sig**2))
    img += rng.normal(0, 0.01, img.shape).astype(np.float32)
    return jnp.asarray(img)


def make_pair(theta=0.35, t=(1.5, -0.8), n=24, seed=0):
    rng = np.random.default_rng(seed)
    pts = rng.uniform(-18, 18, (n, 2)).astype(np.float32)
    jit = rng.uniform(-1.6, 1.6, (n, 4, 2)).astype(np.float32)
    c, s = np.cos(theta), np.sin(theta)
    R = np.array([[c, -s], [s, c]], np.float32)
    pts_b = pts @ R.T + np.asarray(t, np.float32)
    jit_b = jit @ R.T  # lobes move rigidly with the scene
    img_a = render(pts, jit, seed=1)
    img_b = render(pts_b, jit_b, seed=2)
    to3 = lambda p: jnp.asarray(np.concatenate(  # noqa: E731
        [p, np.zeros((n, 1), np.float32)], axis=1))
    return img_a, to3(pts), img_b, to3(pts_b), R, np.asarray(t, np.float32)


def hamming(a, b):
    return np.asarray(
        jnp.sum(jax.lax.population_count(jnp.bitwise_xor(a, b)), axis=-1)
    )


def test_orb_translation_stability():
    img_a, pts_a, img_b, pts_b, _, _ = make_pair(theta=0.0, t=(2.0, 1.0))
    da = orb_descriptors(img_a, pts_a, RES)
    db = orb_descriptors(img_b, pts_b, RES)
    d = hamming(da, db)
    assert np.median(d) < 30, d


def test_orb_steering_absorbs_rotation():
    img_a, pts_a, img_b, pts_b, _, _ = make_pair(theta=0.6, t=(0.5, -0.3))
    da = orb_descriptors(img_a, pts_a, RES)
    db = orb_descriptors(img_b, pts_b, RES)
    d_true = hamming(da, db)
    rng = np.random.default_rng(3)
    d_rand = hamming(da, db[rng.permutation(len(d_true))])
    # Correct pairs must sit clearly below random pairs (margin, not an
    # absolute bar: the shared central blob correlates all keypoints some).
    assert np.median(d_true) < 70, (np.median(d_true), np.median(d_rand))
    assert np.median(d_rand) > np.median(d_true) + 25, (
        np.median(d_true), np.median(d_rand))


def test_basd_rotation_invariance():
    img_a, pts_a, img_b, pts_b, _, _ = make_pair(theta=0.8)
    da = basd_descriptors(img_a, pts_a, RES)
    db = basd_descriptors(img_b, pts_b, RES)
    d_true = hamming(da, db)
    assert np.median(d_true) <= 2, d_true


def test_pad_keypoints_zeroed_and_unmatched():
    img_a, pts_a, img_b, pts_b, _, _ = make_pair()
    pa = np.asarray(pts_a).copy()
    pa[-4:] = 0.0  # pad rows
    da = orb_descriptors(img_a, jnp.asarray(pa), RES)
    assert (np.asarray(da[-4:]) == 0).all()
    valid_a = jnp.asarray(~((pa[:, 0] == 0) & (pa[:, 1] == 0)))
    db = orb_descriptors(img_b, pts_b, RES)
    _, ok = match_descriptors(da, db, valid_a, jnp.ones(len(pa), bool))
    assert not np.asarray(ok[-4:]).any()


def test_descriptor_match_mcransac_recovers_motion():
    """Full chain at gross-outlier conditions: ORB match → mcransac pose."""
    from mm_masking_tpu.ops.mcransac import mcransac

    img_a, pts_a, img_b, pts_b, R, t = make_pair(theta=0.3, t=(1.2, -0.7))
    n = pts_a.shape[0]
    # Shuffle b's rows so matching has to find the permutation, and add
    # distractor keypoints that exist only in b.
    rng = np.random.default_rng(7)
    perm = rng.permutation(n)
    pts_b_sh = np.asarray(pts_b)[perm]
    da = orb_descriptors(img_a, pts_a, RES)
    db = orb_descriptors(img_b, jnp.asarray(pts_b_sh), RES)
    valid = jnp.ones(n, bool)
    idx_b, ok = match_descriptors(da, db, valid, valid, nndr=0.95)
    # Most matches must be the true permutation.
    correct = (perm[np.asarray(idx_b)] == np.arange(n)) & np.asarray(ok)
    assert correct.sum() >= 0.6 * n, correct.sum()

    src = np.asarray(pts_a)[None, :, :2]
    tgt = np.asarray(pts_b_sh)[np.asarray(idx_b)][None, :, :2]
    w = np.asarray(ok, np.float32)[None]
    out = mcransac(jnp.asarray(src), jnp.asarray(tgt),
                   valid=jnp.asarray(w > 0.5), rng=jax.random.PRNGKey(0))
    T = np.asarray(out["T"])[0]
    np.testing.assert_allclose(T[:2, :2], R, atol=2e-2)
    np.testing.assert_allclose(T[:2, 3], t, atol=8e-2)


def test_descriptor_bootstrap_pose_no_init():
    """The far-init bootstrap: pose from appearance alone (no initial guess)."""
    from mm_masking_tpu.localization.odometry import descriptor_bootstrap

    img_a, pts_a, img_b, pts_b, R, t = make_pair(theta=0.3, t=(1.2, -0.7))
    out = descriptor_bootstrap(
        img_a[None], pts_a[None], img_b[None], pts_b[None], RES, nndr=0.95
    )
    T = np.asarray(out["T"])[0]
    np.testing.assert_allclose(T[:2, :2], R, atol=1e-3)
    np.testing.assert_allclose(T[:2, 3], t, atol=5e-3)
    assert np.asarray(out["ok"]).all()
