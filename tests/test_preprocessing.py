"""Preprocessing: kNN, closed-form 3x3 eigh, normals, spectral scores, voxel."""
import numpy as np
import jax.numpy as jnp

from mm_masking_tpu.ops.preprocessing import (
    _sym_eigh_3x3,
    estimate_normals,
    knn_indices,
    voxel_downsample,
)


def test_knn_matches_bruteforce():
    rng = np.random.default_rng(0)
    pts = jnp.asarray(rng.normal(size=(2, 100, 3)).astype(np.float32))
    idx = np.asarray(knn_indices(pts, k=5, chunk=32))
    p = np.asarray(pts)
    d = np.linalg.norm(p[:, :, None] - p[:, None], axis=-1)
    for b in range(2):
        for n in range(0, 100, 17):
            want = set(np.argsort(d[b, n])[:5].tolist())
            got = set(idx[b, n].tolist())
            assert got == want, (b, n, got, want)


def test_sym_eigh_3x3_matches_numpy():
    rng = np.random.default_rng(1)
    M = rng.normal(size=(64, 3, 3)).astype(np.float32)
    A = jnp.asarray(M @ np.transpose(M, (0, 2, 1)))
    vals, vecs = _sym_eigh_3x3(A)
    vals, vecs = np.asarray(vals), np.asarray(vecs)
    want = np.linalg.eigvalsh(np.asarray(A))
    np.testing.assert_allclose(vals, want, rtol=2e-4, atol=2e-4)
    # Eigenvector property: A v = lambda v.
    for j in range(3):
        Av = np.einsum("bij,bj->bi", np.asarray(A), vecs[..., j])
        lv = vals[..., j : j + 1] * vecs[..., j]
        np.testing.assert_allclose(Av, lv, atol=5e-3)


def test_normals_on_plane():
    # Points on the z=0 plane (plus jitter): normals ~ +-z, high planarity.
    rng = np.random.default_rng(2)
    pts = np.zeros((1, 200, 3), np.float32)
    pts[0, :, 0] = rng.uniform(-5, 5, 200)
    pts[0, :, 1] = rng.uniform(-5, 5, 200)
    pts[0, :, 2] = 1.0 + rng.normal(0, 0.01, 200)  # offset plane
    normals, scores = estimate_normals(jnp.asarray(pts), k=8, chunk=64)
    nz = np.abs(np.asarray(normals)[0, :, 2])
    assert np.median(nz) > 0.99
    # (e2-e1)/e3 varies with in-plane anisotropy; the plane signature is a
    # vanishing smallest eigenvalue -> near-zero sphericity.
    assert float(np.median(np.asarray(scores["planarity"]))) > 0.3
    assert float(np.median(np.asarray(scores["sphericity"]))) < 0.01
    # Oriented toward the origin: points sit at z=+1, so normals point -z.
    assert np.median(np.asarray(normals)[0, :, 2]) < 0


def test_scores_on_line():
    rng = np.random.default_rng(3)
    pts = np.zeros((1, 100, 3), np.float32)
    pts[0, :, 0] = np.linspace(0, 10, 100)
    pts += rng.normal(0, 0.005, pts.shape).astype(np.float32)
    _, scores = estimate_normals(jnp.asarray(pts), k=8, chunk=32)
    assert float(np.median(np.asarray(scores["linearity"]))) > 0.9


def test_voxel_downsample():
    rng = np.random.default_rng(4)
    pts = rng.uniform(0, 4, (500, 3)).astype(np.float32)
    out = np.asarray(voxel_downsample(jnp.asarray(pts), voxel=1.0, max_out=128))
    used = out[np.any(out != 0, axis=1)]
    # 4x4x4 grid -> at most 64 occupied cells, all means inside the hull.
    assert 30 <= used.shape[0] <= 64
    assert used.min() >= 0 and used.max() <= 4.0
    # Means are genuinely inside their cells (within voxel size of a point).
    d = np.linalg.norm(used[:, None] - pts[None], axis=-1).min(axis=1)
    assert d.max() < 1.0


def test_voxel_downsample_center_keeps_nearest_on_overflow():
    # 6 distinct cells, capacity 3, center at origin: the 3 nearest survive;
    # pad-sentinel rows never occupy a slot (the sliding-local-map eviction
    # of vtr's odometry map maintenance).
    pts = np.array(
        [[0.1, 0.1, 0], [2.0, 0, 0], [4.0, 0, 0], [8.0, 0, 0],
         [16.0, 0, 0], [32.0, 0, 0], [1000.0, 1000.0, 1000.0]], np.float32)
    out = np.asarray(voxel_downsample(
        jnp.asarray(pts), voxel=0.5, max_out=3, pad_val=1000.0,
        center=jnp.zeros(3, jnp.float32)))
    kept = sorted(out[:, 0].tolist())
    assert np.allclose(kept, [0.1, 2.0, 4.0]), kept


def test_voxel_downsample_weighted_mean_persists():
    # A cell whose row carries weight 9 merged with one new unit-weight point
    # moves by 1/10 of the offset — NOT half (the EMA failure mode where the
    # whole history weighs as one point).
    pts = np.array([[1.0, 1.0, 0.0], [1.2, 1.0, 0.0]], np.float32)
    w = np.array([9.0, 1.0], np.float32)
    means, wout = voxel_downsample(
        jnp.asarray(pts), voxel=2.0, max_out=4, pad_val=1000.0,
        center=jnp.zeros(3, jnp.float32), weights=jnp.asarray(w))
    means, wout = np.asarray(means), np.asarray(wout)
    assert np.isclose(means[0, 0], 1.02, atol=1e-5), means[0]
    assert np.isclose(wout[0], 10.0), wout
    # the hash-order (no-center) branch agrees
    means2, wout2 = voxel_downsample(
        jnp.asarray(pts), voxel=2.0, max_out=4, pad_val=1000.0,
        weights=jnp.asarray(w))
    assert np.isclose(np.asarray(means2)[0, 0], 1.02, atol=1e-5)
    assert np.isclose(np.asarray(wout2)[0], 10.0)
