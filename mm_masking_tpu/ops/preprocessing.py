"""Pointcloud preprocessing: k-NN normals, planarity/linearity, voxel grid.

Capability parity with the vtr3 preprocessing modules the reference's data
generation relies on (`lidar.preprocessing` planarity/normal filtering,
`/root/reference/gen_data/config/lidar_config.yaml:81-117`, and
`radar.preprocessing` normal/linearity scoring,
`radar_config.yaml:122-137` — submodule empty; semantics are the standard
PCA-over-neighborhood formulation those modules implement). Everything is
batched, fixed-shape JAX:

* k nearest neighbors through the same tiled association kernel ICP uses
  (top-k variant),
* per-point 3×3 covariance eigendecomposition in closed form (no LAPACK),
* normals = smallest-eigenvalue eigenvector, oriented toward the sensor,
* linearity/planarity/sphericity scores from the eigenvalue spectrum,
* voxel-grid downsampling with fixed output size (scatter-mean over hashed
  cells, first-N occupied cells kept).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def knn_indices(points: jax.Array, k: int, chunk: int = 1024) -> jax.Array:
    """(B, N, 3) → (B, N, k) indices of the k nearest neighbors (incl. self).

    Blocked top-k over distance chunks; O(N·N) work, O(N·chunk) memory.
    """
    B, N, _ = points.shape
    n_chunks = -(-N // chunk)
    pad = n_chunks * chunk - N
    q = points
    if pad:
        q = jnp.concatenate(
            [q, jnp.full((B, pad, 3), 1e30, points.dtype)], axis=1
        )
    q_chunks = jnp.moveaxis(q.reshape(B, n_chunks, chunk, 3), 1, 0)
    p_sq = jnp.sum(points * points, axis=-1)

    def body(carry, qc):
        best_d, best_i, kk = carry
        q_sq = jnp.sum(qc * qc, axis=-1)
        cross = jnp.einsum("bnd,bmd->bnm", points, qc, precision="highest")
        d2 = p_sq[:, :, None] - 2.0 * cross + q_sq[:, None, :]
        idx = (
            jax.lax.broadcasted_iota(jnp.int32, d2.shape, 2) + kk * chunk
        )
        # Merge with running best-k: concatenate and re-top-k.
        d_all = jnp.concatenate([best_d, d2], axis=2)
        i_all = jnp.concatenate([best_i, idx], axis=2)
        neg_top, arg = jax.lax.top_k(-d_all, k)
        return (
            -neg_top,
            jnp.take_along_axis(i_all, arg, axis=2),
            kk + 1,
        ), None

    init = (
        jnp.full((B, N, k), jnp.inf, points.dtype),
        jnp.zeros((B, N, k), jnp.int32),
        jnp.int32(0),
    )
    (best_d, best_i, _), _ = jax.lax.scan(body, init, q_chunks)
    return best_i


def _sym_eigh_3x3(A: jax.Array):
    """Closed-form eigen-decomposition of batched symmetric 3×3 matrices.

    Returns (eigvals ascending (..., 3), eigvecs (..., 3, 3) columns).
    Uses the trigonometric solution for the eigenvalues and cross-product
    null-space extraction for the vectors — no LAPACK, fully vectorized.
    """
    a00, a01, a02 = A[..., 0, 0], A[..., 0, 1], A[..., 0, 2]
    a11, a12, a22 = A[..., 1, 1], A[..., 1, 2], A[..., 2, 2]
    q = (a00 + a11 + a22) / 3.0
    b00, b11, b22 = a00 - q, a11 - q, a22 - q
    p2 = (
        b00 * b00 + b11 * b11 + b22 * b22
        + 2.0 * (a01 * a01 + a02 * a02 + a12 * a12)
    )
    p = jnp.sqrt(jnp.maximum(p2 / 6.0, 1e-30))
    # det(B)/2 with B = (A - qI)
    detB = (
        b00 * (b11 * b22 - a12 * a12)
        - a01 * (a01 * b22 - a12 * a02)
        + a02 * (a01 * a12 - b11 * a02)
    )
    r = jnp.clip(detB / (2.0 * p**3), -1.0, 1.0)
    phi = jnp.arccos(r) / 3.0
    e_big = q + 2.0 * p * jnp.cos(phi)
    e_small = q + 2.0 * p * jnp.cos(phi + 2.0 * jnp.pi / 3.0)
    e_mid = 3.0 * q - e_big - e_small
    vals = jnp.stack([e_small, e_mid, e_big], axis=-1)

    def null_vec(lam):
        # (A - lam I) has rank 2 generically; the null vector is the cross
        # product of its two most independent rows.
        r0 = jnp.stack([a00 - lam, a01, a02], axis=-1)
        r1 = jnp.stack([a01, a11 - lam, a12], axis=-1)
        r2 = jnp.stack([a02, a12, a22 - lam], axis=-1)
        c01 = jnp.cross(r0, r1)
        c02 = jnp.cross(r0, r2)
        c12 = jnp.cross(r1, r2)
        n01 = jnp.sum(c01 * c01, axis=-1, keepdims=True)
        n02 = jnp.sum(c02 * c02, axis=-1, keepdims=True)
        n12 = jnp.sum(c12 * c12, axis=-1, keepdims=True)
        best = jnp.where(
            (n01 >= n02) & (n01 >= n12), c01, jnp.where(n02 >= n12, c02, c12)
        )
        norm = jnp.sqrt(
            jnp.maximum(jnp.sum(best * best, axis=-1, keepdims=True), 1e-30)
        )
        return best / norm

    v_small = null_vec(e_small)
    v_big = null_vec(e_big)
    v_mid = jnp.cross(v_big, v_small)
    vecs = jnp.stack([v_small, v_mid, v_big], axis=-1)  # columns
    return vals, vecs


def estimate_normals(
    points: jax.Array,
    k: int = 10,
    orient_to_origin: bool = True,
    chunk: int = 1024,
):
    """(B, N, 3) → (normals (B, N, 3), scores dict).

    Scores follow the standard spectral definitions the vtr preprocessing
    filters threshold on: linearity (e3−e2)/e3, planarity (e2−e1)/e3,
    sphericity e1/e3, with e1 ≤ e2 ≤ e3.
    """
    idx = knn_indices(points, k, chunk=chunk)  # (B, N, k)
    B, N, _ = points.shape
    nbrs = jnp.take_along_axis(
        points[:, None, :, :].repeat(1, axis=1),
        idx[..., None].reshape(B, 1, N * k, 1).repeat(3, axis=-1),
        axis=2,
    ).reshape(B, N, k, 3)
    mean = jnp.mean(nbrs, axis=2, keepdims=True)
    centered = nbrs - mean
    cov = jnp.einsum("bnki,bnkj->bnij", centered, centered,
                     precision="highest") / k
    vals, vecs = _sym_eigh_3x3(cov)
    normals = vecs[..., 0]  # smallest-eigenvalue eigenvector
    if orient_to_origin:
        flip = jnp.sum(normals * points, axis=-1, keepdims=True) > 0
        normals = jnp.where(flip, -normals, normals)
    e1, e2, e3 = vals[..., 0], vals[..., 1], vals[..., 2]
    safe = jnp.maximum(e3, 1e-12)
    scores = {
        "linearity": (e3 - e2) / safe,
        "planarity": (e2 - e1) / safe,
        "sphericity": e1 / safe,
    }
    return normals, scores


@functools.partial(jax.jit, static_argnames=("voxel", "max_out"))
def voxel_downsample(
    points: jax.Array, voxel: float = 0.5, max_out: int = 4096,
    pad_val: float = 0.0, center: jax.Array | None = None,
    weights: jax.Array | None = None,
):
    """(N, 3) → (max_out, 3) voxel-grid means.

    Fixed-shape equivalent of the vtr map voxel filters
    (`radar_config.yaml:190-200` map maintenance). Unused rows carry
    ``pad_val``.

    Overflow policy (more distinct cells than ``max_out``): with ``center``
    (a (3,) position) the NEAREST ``max_out`` cells to it survive — the
    sliding-local-map semantics of vtr's odometry map maintenance, where the
    map follows the robot. Without it, cells drop in hash order, which at
    saturation evicts a FIXED pseudorandom subset of space — measured on the
    e2e corridor this hollowed out the live frontier and spiralled the teach
    odometry to NaN within 8 frames of the buffer filling.

    ``weights`` ((N,), optional): per-point observation weights. Cell means
    become weighted means and the return value becomes a ``(means (max_out,
    3), cell_weights (max_out,))`` pair, so a caller can feed each merge's
    output weights back in as the next merge's input weights — per-cell
    observation COUNTS persist across merges. Without this, re-merging means
    with raw points weights every cell's whole history equal to ONE new
    point, making the map an EMA of the latest scan: odometry registration
    error feeds into the map and compounds (measured: mm-level error
    doubling per frame into divergence on the e2e corridor).
    """
    N = points.shape[0]
    keys = jnp.floor(points / voxel).astype(jnp.int32)
    # Hash cells; collisions are acceptable for downsampling purposes.
    h = (
        keys[:, 0] * 73856093 ^ keys[:, 1] * 19349663 ^ keys[:, 2] * 83492791
    ).astype(jnp.uint32)
    order = jnp.argsort(h)
    h_sorted = h[order]
    pts_sorted = points[order]
    w_sorted = (
        jnp.ones((N,), points.dtype) if weights is None else weights[order]
    )
    is_new = jnp.concatenate(
        [jnp.ones((1,), bool), h_sorted[1:] != h_sorted[:-1]]
    )
    cell_id = jnp.cumsum(is_new) - 1  # 0-based dense cell index (sorted order)
    if center is None:
        cell_id = jnp.where(cell_id < max_out, cell_id, max_out)
        sums = jnp.zeros((max_out + 1, 3), points.dtype).at[cell_id].add(
            pts_sorted * w_sorted[:, None])
        wsum = jnp.zeros((max_out + 1,), points.dtype).at[cell_id].add(
            w_sorted)
        means = sums[:max_out] / jnp.maximum(wsum[:max_out, None], 1e-12)
        used = wsum[:max_out] > 0
        means = jnp.where(used[:, None], means, jnp.full_like(means, pad_val))
        if weights is None:
            return means
        return means, jnp.where(used, wsum[:max_out], 0.0)
    # Locality-aware eviction: reduce ALL cells (≤ N of them), then keep the
    # max_out nearest to `center`. One extra (N,) argsort per merge.
    sums = jnp.zeros((N, 3), points.dtype).at[cell_id].add(
        pts_sorted * w_sorted[:, None])
    wsum = jnp.zeros((N,), points.dtype).at[cell_id].add(w_sorted)
    means = sums / jnp.maximum(wsum[:, None], 1e-12)
    used = wsum > 0
    # Pad rows (at the ±1000 TARGET_PAD_VAL sentinel) form cells too — push
    # them past every real cell so they never displace one (same |x| < 500
    # real/pad boundary as `merge_into_map`). Non-finite cells (a diverged
    # pose's points) are likewise never kept.
    far = (jnp.abs(means[:, 0]) >= jnp.float32(500.0)) | ~jnp.all(
        jnp.isfinite(means), axis=-1)
    dist = jnp.linalg.norm(means - center[None, :], axis=-1)
    dist = jnp.where(used & ~far, dist, jnp.inf)
    pick = jnp.argsort(dist)[:max_out]
    means = means[pick]
    ok = jnp.isfinite(dist[pick])
    means = jnp.where(ok[:, None], means, jnp.full_like(means, pad_val))
    if weights is None:
        return means
    return means, jnp.where(ok, wsum[pick], 0.0)
