"""CFAR / peak-extraction parity vs an independent loop-based torch oracle.

The oracle implements the documented GO-CFAR semantics (BASELINE.md CFAR row,
SURVEY.md §2.2) with explicit per-column window sums — the same contract the
reference's loop computes — so cumsum-based kernels are checked value-for-value.
"""
import numpy as np
import torch
import jax
import jax.numpy as jnp

from mm_masking_tpu.ops import cfar_mask, mean_peaks, extract_pc


def oracle_cfar(raw, res, width=101, minr=2.0, maxr=80.0, guard=5, a=1.0, b=0.09,
                diff=True, steep=10.0):
    """Loop-based GO-CFAR oracle (torch, float64 windows summed explicitly)."""
    raw = torch.from_numpy(raw)
    B, A, R = raw.shape
    width = width + 1 if width % 2 == 0 else width
    w2 = width // 2
    mincol = max(0, int(minr / res + w2 + guard + 1))
    maxcol = min(R, int(maxr / res - w2 - guard))
    thres_full = torch.full((B, A, R), 1000.0, dtype=raw.dtype)
    for col in range(mincol, maxcol):
        left = raw[:, :, col - w2 - guard : col - guard].sum(dim=2)
        right = raw[:, :, col + guard + 1 : col + w2 + guard + 1].sum(dim=2)
        stat = torch.maximum(left, right) / w2
        thres_full[:, :, col] = a * stat + b
    if diff:
        soft = 0.5 * torch.tanh(steep * (raw - thres_full) + 2.5) + 0.5
        out = torch.nn.functional.hardshrink(soft, lambd=0.99)
    else:
        out = torch.where(raw > thres_full, 1.0, 0.0)
    return out.numpy()


def small_scan(seed=0, B=2, A=6, R=200):
    rng = np.random.default_rng(seed)
    raw = (rng.uniform(size=(B, A, R)) ** 3).astype(np.float32)
    # Plant strong targets.
    for b in range(B):
        for _ in range(12):
            a_i = rng.integers(0, A)
            r_i = rng.integers(20, R - 20)
            raw[b, a_i, r_i : r_i + rng.integers(1, 4)] = rng.uniform(2.0, 4.0)
    return raw


RES = 0.0596


def test_cfar_hard_matches_oracle():
    raw = small_scan()
    kw = dict(width=21, minr=0.5, maxr=10.0, guard=2, diff=False)
    want = oracle_cfar(raw, RES, width=21, minr=0.5, maxr=10.0, guard=2, diff=False)
    got = np.asarray(cfar_mask(jnp.asarray(raw), RES, **kw))
    np.testing.assert_array_equal(got, want)


def test_cfar_diff_matches_oracle():
    raw = small_scan(seed=3)
    kw = dict(width=21, minr=0.5, maxr=10.0, guard=2, diff=True)
    want = oracle_cfar(raw, RES, width=21, minr=0.5, maxr=10.0, guard=2, diff=True)
    got = np.asarray(cfar_mask(jnp.asarray(raw), RES, **kw))
    np.testing.assert_allclose(got, want, atol=2e-5)


def test_cfar_full_size_column_band():
    # Full-size polar scan: check the valid column band placement at defaults.
    raw = small_scan(seed=5, B=1, A=2, R=3360)
    got = np.asarray(cfar_mask(jnp.asarray(raw), RES, diff=False))
    mincol = int(2.0 / RES + 50 + 5 + 1)
    maxcol = int(80.0 / RES - 50 - 5)
    assert got[:, :, :mincol].sum() == 0
    assert got[:, :, maxcol:].sum() == 0


def test_cfar_is_differentiable():
    raw = jnp.asarray(small_scan(seed=7, B=1, A=2, R=128))
    g = jax.grad(
        lambda x: jnp.sum(cfar_mask(x, RES, width=11, minr=0.2, maxr=6.0, guard=1))
    )(raw)
    assert np.all(np.isfinite(np.asarray(g)))


def oracle_mean_peaks(arr, diff, steep=10.0):
    arr = torch.from_numpy(arr)
    res = torch.zeros_like(arr)
    zd = 1 - torch.tanh(steep * arr) if diff else (arr == 0).to(arr.dtype)
    res[:, :, :-1] = arr[:, :, :-1] * zd[:, :, 1:] + arr[:, :, 1:] * zd[:, :, :-1]
    return res.numpy()


def test_mean_peaks_matches_oracle():
    raw = small_scan(seed=11, B=2, A=3, R=64)
    raw[raw < 1.0] = 0.0
    for diff in (False, True):
        want = oracle_mean_peaks(raw, diff)
        got = np.asarray(mean_peaks(jnp.asarray(raw), diff=diff))
        np.testing.assert_allclose(got, want, atol=1e-6)


def oracle_extract_pc(thres_mask, res, az, times, diff):
    """Ragged reference-semantics oracle: pair consecutive nonzero flat entries."""
    tm = torch.from_numpy(thres_mask)
    B, A, R = tm.shape
    thres_scan = res * torch.arange(R) * tm
    peaks = torch.from_numpy(oracle_mean_peaks(thres_scan.numpy(), diff))
    clouds = []
    for b in range(B):
        entries = []
        for a_i in range(A):
            for r_i in range(R):
                v = peaks[b, a_i, r_i].item()
                if v != 0:
                    entries.append((v, az[b, a_i], times[b, a_i]))
        pts = []
        for k in range(len(entries) // 2):
            e0, e1 = entries[2 * k], entries[2 * k + 1]
            r = (e0[0] + e1[0]) / 2
            phi = (e0[1] + e1[1]) / 2
            pts.append((r * np.cos(phi), r * np.sin(phi), 0.0))
        clouds.append(np.array(pts, dtype=np.float32).reshape(-1, 3))
    return clouds


def test_extract_pc_matches_ragged_oracle():
    rng = np.random.default_rng(13)
    B, A, R = 2, 4, 48
    mask = (rng.uniform(size=(B, A, R)) > 0.8).astype(np.float32)
    mask[:, :, -1] = 0
    az = np.sort(rng.uniform(0, 2 * np.pi, size=(B, A)).astype(np.float32), axis=1)
    times = rng.uniform(0, 1, size=(B, A)).astype(np.float32)

    want = oracle_extract_pc(mask, RES, az, times, diff=False)
    got = np.asarray(
        extract_pc(
            jnp.asarray(mask), RES, jnp.asarray(az), jnp.asarray(times),
            max_points=64, diff=False,
        )
    )
    for b in range(B):
        n = want[b].shape[0]
        np.testing.assert_allclose(got[b, :n], want[b], atol=1e-4)
        # Padding rows are exactly zero.
        np.testing.assert_array_equal(got[b, n:], 0.0)
