"""Value-level parity against the *imported* reference implementation.

The reference `/root/reference/mm_masking/radar_utils.py` depends only on
torch + cv2 + numpy, all baked into this image, so instead of hand-rewritten
torch oracles (which can encode the same misunderstanding twice) these tests
load the actual reference module and assert parity at full production shapes:
polar 400×3360, cartesian 640², realistic point counts, both diff and hard
variants.

Every test cites the reference lines it checks.
"""
from __future__ import annotations

import importlib.util
import os
import sys

import numpy as np
import pytest
import torch

pytestmark = pytest.mark.skipif(
    not os.path.exists("/root/reference/mm_masking/radar_utils.py"),
    reason="reference tree not mounted",
)

import jax.numpy as jnp

from mm_masking_tpu.ops import cfar as m_cfar
from mm_masking_tpu.ops import radar as m_radar
from mm_masking_tpu.ops import weights as m_weights

POLAR_RES = 0.0596
B, A, R = 2, 400, 3360
W = 640


@pytest.fixture(scope="module")
def ref():
    """Import the reference radar_utils module from its real path."""
    spec = importlib.util.spec_from_file_location(
        "reference_radar_utils", "/root/reference/mm_masking/radar_utils.py"
    )
    mod = importlib.util.module_from_spec(spec)
    sys.modules["reference_radar_utils"] = mod
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope="module")
def polar_scan():
    """Full-shape synthetic Navtech power scan with sparse bright returns.

    Noise floor is kept below the CFAR threshold so the hard mask detects
    ~only the planted blobs (realistic Boreas point counts, ~3k/scan).
    """
    rng = np.random.default_rng(7)
    x = (rng.random((B, A, R)) * 0.15).astype(np.float32)
    for _ in range(3000):
        b = rng.integers(B)
        a = rng.integers(A)
        r = rng.integers(120, 3000)
        x[b, a, r : r + rng.integers(2, 6)] += 0.5 + rng.random() * 1.5
    return x


@pytest.fixture(scope="module")
def wobbly_azimuths():
    """(B, A) increasing azimuths with non-uniform (wobbly) steps."""
    rng = np.random.default_rng(3)
    base = np.linspace(0.0, 2 * np.pi * (A - 1) / A, A, dtype=np.float64)
    az = base[None, :] + rng.normal(0.0, 2e-4, size=(B, A))
    az = np.sort(az, axis=1).astype(np.float32)
    az[:, 0] = np.maximum(az[:, 0], 0.0)
    return az


# ---------------------------------------------------------------------------
# cfar_mask (radar_utils.py:29-69)
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("diff", [True, False])
def test_cfar_mask_full_shape(ref, polar_scan, diff):
    got = np.asarray(
        m_cfar.cfar_mask(jnp.asarray(polar_scan), POLAR_RES, diff=diff)
    )
    want = ref.cfar_mask(torch.from_numpy(polar_scan), POLAR_RES, diff=diff).numpy()
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_cfar_mask_nondefault_params(ref, polar_scan):
    kw = dict(width=40, minr=5.0, maxr=60.0, guard=2, a_thresh=1.5, b_thresh=0.05)
    got = np.asarray(m_cfar.cfar_mask(jnp.asarray(polar_scan), POLAR_RES, **kw))
    want = ref.cfar_mask(torch.from_numpy(polar_scan), POLAR_RES, **kw).numpy()
    # A handful of elements can straddle the hardshrink(0.99) knife-edge from
    # f32 window-sum rounding (one side 0, the other >= 0.99); everything else
    # must agree tightly.
    err = np.abs(got - want)
    flips = err > 1e-5
    assert flips.mean() < 1e-5, flips.sum()
    assert np.all((np.minimum(got, want) == 0.0)[flips])
    assert np.all((np.maximum(got, want) >= 0.99)[flips])


# ---------------------------------------------------------------------------
# mean_peaks_parallel_fast (radar_utils.py:167-185)
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("diff", [True, False])
def test_mean_peaks_full_shape(ref, polar_scan, diff):
    mask = ref.cfar_mask(torch.from_numpy(polar_scan), POLAR_RES, diff=diff)
    scan = POLAR_RES * torch.arange(R) * mask
    want = ref.mean_peaks_parallel_fast(scan, diff=diff, steep_fact=10.0).numpy()
    got = np.asarray(m_cfar.mean_peaks(jnp.asarray(scan.numpy()), diff=diff))
    np.testing.assert_allclose(got, want, atol=2e-4)


# ---------------------------------------------------------------------------
# extract_pc (radar_utils.py:71-106): ragged reference list vs fixed-shape pad
# ---------------------------------------------------------------------------


def _blob_mask(rng, n_blobs=3000, min_width=2, max_width=5):
    """Hard detection mask of multi-bin blobs (>=2 bins, never adjacent).

    Multi-bin blobs each emit exactly two peak entries, so the reference's
    0::2 / 1::2 pairing (`radar_utils.py:92-93`) stays aligned; its ragged
    path hard-errors on odd entry counts, so single-bin blobs get their own
    dedicated test below.
    """
    mask = np.zeros((B, A, R), dtype=np.float32)
    for _ in range(n_blobs):
        b = rng.integers(B)
        a = rng.integers(A)
        r = rng.integers(100, 3000)
        w = rng.integers(min_width, max_width + 1)
        # Clear a guard bin each side so planted blobs never merge/extend.
        mask[b, a, r - 1] = 0.0
        mask[b, a, r : r + w] = 1.0
        mask[b, a, r + w] = 0.0
    return mask


@pytest.mark.parametrize("diff", [True, False])
def test_extract_pc_full_shape(ref, wobbly_azimuths, diff):
    mask = _blob_mask(np.random.default_rng(29))
    mask_t = torch.from_numpy(mask)
    az_t = torch.from_numpy(wobbly_azimuths)
    # Small float times: the reference carries times through the same float32
    # averaging path, so int64-nanosecond magnitudes would lose precision in
    # *both* implementations identically but make comparison meaningless.
    times = np.linspace(0.0, 0.25, A, dtype=np.float32)[None].repeat(B, 0)
    t_t = torch.from_numpy(times)

    want_list = ref.extract_pc(mask_t, POLAR_RES, az_t, t_t, diff=diff)

    max_points = 6144
    got = np.asarray(
        m_cfar.extract_pc(
            jnp.asarray(mask_t.numpy()),
            POLAR_RES,
            jnp.asarray(wobbly_azimuths),
            jnp.asarray(times),
            max_points=max_points,
            diff=diff,
        )
    )
    for b in range(B):
        want = want_list[b].numpy()
        n = want.shape[0]
        assert n > 100, "degenerate test scene"
        assert n <= max_points
        np.testing.assert_allclose(got[b, :n], want, atol=2e-3)
        # Pad rows are exactly zero.
        np.testing.assert_array_equal(got[b, n:], 0.0)


def test_extract_pc_single_bin_quirk(ref, wobbly_azimuths):
    """Single-bin blobs merge forward+backward gates into ONE doubled entry
    (`radar_utils.py:177-183`), shifting the 0::2/1::2 pairing — reproduce the
    quirk exactly (even entry count keeps the reference's ragged path alive).
    """
    mask = np.zeros((B, A, R), dtype=np.float32)
    mask[:, 5, 500] = 1.0  # single-bin
    mask[:, 5, 800] = 1.0  # single-bin
    mask[:, 9, 1000:1003] = 1.0  # 3-bin blob
    az_t = torch.from_numpy(wobbly_azimuths)
    times = np.zeros((B, A), dtype=np.float32)
    want_list = ref.extract_pc(
        torch.from_numpy(mask), POLAR_RES, az_t, torch.from_numpy(times), diff=False
    )
    got = np.asarray(
        m_cfar.extract_pc(
            jnp.asarray(mask),
            POLAR_RES,
            jnp.asarray(wobbly_azimuths),
            jnp.asarray(times),
            max_points=16,
            diff=False,
        )
    )
    for b in range(B):
        want = want_list[b].numpy()
        n = want.shape[0]
        np.testing.assert_allclose(got[b, :n], want, atol=1e-4)


def test_extract_pc_with_transform(ref, wobbly_azimuths):
    mask_t = torch.from_numpy(_blob_mask(np.random.default_rng(31)))
    az_t = torch.from_numpy(wobbly_azimuths)
    times = np.zeros((B, A), dtype=np.float32)
    rng = np.random.default_rng(11)
    th = rng.uniform(-np.pi, np.pi, B)
    T = np.tile(np.eye(4, dtype=np.float32), (B, 1, 1))
    T[:, 0, 0] = np.cos(th)
    T[:, 0, 1] = -np.sin(th)
    T[:, 1, 0] = np.sin(th)
    T[:, 1, 1] = np.cos(th)
    T[:, :2, 3] = rng.uniform(-5, 5, (B, 2)).astype(np.float32)

    want_list = ref.extract_pc(
        mask_t, POLAR_RES, az_t, torch.from_numpy(times), T_ab=torch.from_numpy(T),
        diff=False,
    )
    got = np.asarray(
        m_cfar.extract_pc(
            jnp.asarray(mask_t.numpy()),
            POLAR_RES,
            jnp.asarray(wobbly_azimuths),
            jnp.asarray(times),
            max_points=6144,
            T_ab=jnp.asarray(T),
            diff=False,
        )
    )
    for b in range(B):
        want = want_list[b].numpy()
        n = want.shape[0]
        np.testing.assert_allclose(got[b, :n], want, atol=2e-3)


# ---------------------------------------------------------------------------
# extract_weights (radar_utils.py:108-140)
# ---------------------------------------------------------------------------


def test_extract_weights_full_shape(ref):
    rng = np.random.default_rng(5)
    mask = rng.random((B, W, W), dtype=np.float32)
    n_pts = 4096
    pc = rng.uniform(-80, 80, (B, n_pts, 3)).astype(np.float32)
    pc[:, :, 2] = 0.0
    # Some points out of the ±76 m BEV, some exact pads.
    pc[:, -500:, :2] = 0.0
    pc[:, :64, :2] *= 3.0

    w_want, dn_want, n_want, mean_want, max_want, min_want = ref.extract_weights(
        torch.from_numpy(mask), torch.from_numpy(pc)
    )
    got_w, stats = m_weights.extract_weights(jnp.asarray(mask), jnp.asarray(pc))

    np.testing.assert_allclose(np.asarray(got_w), w_want.numpy(), atol=1e-5)
    np.testing.assert_allclose(
        float(stats.diff_mean_num_non0), float(dn_want), rtol=1e-5
    )
    np.testing.assert_allclose(float(stats.mean_num_non0), float(n_want), rtol=1e-6)
    np.testing.assert_allclose(float(stats.mean_w), float(mean_want), rtol=1e-4)
    np.testing.assert_allclose(float(stats.max_w), float(max_want), rtol=1e-6)
    np.testing.assert_allclose(
        float(stats.min_w), float(min_want), rtol=1e-4, atol=1e-7
    )


# ---------------------------------------------------------------------------
# extract_bev_from_pts (radar_utils.py:142-165)
# ---------------------------------------------------------------------------


def test_extract_bev_full_shape(ref):
    rng = np.random.default_rng(9)
    n_pts = 4096
    pc = rng.uniform(-90, 90, (B, n_pts, 3)).astype(np.float32)
    pc[:, -300:, :2] = 0.0  # pads

    want = ref.extract_bev_from_pts(torch.from_numpy(pc)).numpy()
    got = np.asarray(m_weights.extract_bev_from_pts(jnp.asarray(pc)))
    np.testing.assert_array_equal(got, want)


# ---------------------------------------------------------------------------
# radar_polar_to_cartesian_diff (radar_utils.py:258-336)
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("fix_wobble", [True, False])
@pytest.mark.parametrize("interpolate_crossover", [True, False])
def test_polar_to_cartesian_diff_full_shape(
    ref, polar_scan, wobbly_azimuths, fix_wobble, interpolate_crossover
):
    want = ref.radar_polar_to_cartesian_diff(
        torch.from_numpy(polar_scan),
        torch.from_numpy(wobbly_azimuths),
        POLAR_RES,
        interpolate_crossover=interpolate_crossover,
        fix_wobble=fix_wobble,
    ).numpy()
    got = np.asarray(
        m_radar.radar_polar_to_cartesian(
            jnp.asarray(polar_scan),
            jnp.asarray(wobbly_azimuths),
            POLAR_RES,
            interpolate_crossover=interpolate_crossover,
            fix_wobble=fix_wobble,
        )
    )
    # Warp coordinates agree to ~2.5e-4 px (f32 ULP in grid construction);
    # bilinear amplifies that to ~1e-3 in image value where the local gradient
    # is steep. A half-pixel convention bug would show up 100-1000x larger.
    err = np.abs(got - want)
    assert err.max() < 2e-3, err.max()
    assert err.mean() < 1e-5, err.mean()
    assert np.quantile(err, 0.99) < 1e-4


# ---------------------------------------------------------------------------
# radar_cartesian_to_polar (radar_utils.py:338-372)
# ---------------------------------------------------------------------------


def test_cartesian_to_polar_full_shape(ref, wobbly_azimuths):
    rng = np.random.default_rng(13)
    cart = rng.random((B, W, W), dtype=np.float32)
    # The reference casts the warp to double inside (radar_utils.py:370), so
    # torch requires a double input image; feed both implementations doubles.
    want = ref.radar_cartesian_to_polar(
        torch.from_numpy(cart).double(),
        torch.from_numpy(wobbly_azimuths).double(),
        POLAR_RES,
    ).numpy()
    got = np.asarray(
        m_radar.radar_cartesian_to_polar(
            jnp.asarray(cart), jnp.asarray(wobbly_azimuths), POLAR_RES
        )
    )
    # Reference computes the warp in f64 (radar_utils.py:370); ours is f32
    # (x64 disabled under JAX) — same quantile-style bound as above.
    err = np.abs(got - want)
    assert err.max() < 2e-3, err.max()
    assert err.mean() < 1e-5, err.mean()
    assert np.quantile(err, 0.99) < 1e-4


# ---------------------------------------------------------------------------
# point_to_cart_idx / grids / load_radar (radar_utils.py:374-437, 20-27)
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("min_to_plus_1", [True, False])
def test_point_to_cart_idx(ref, min_to_plus_1):
    rng = np.random.default_rng(2)
    pc = rng.uniform(-80, 80, (3, 1000, 3)).astype(np.float32)
    want = ref.point_to_cart_idx(
        torch.from_numpy(pc), min_to_plus_1=min_to_plus_1
    ).numpy()
    got = np.asarray(
        m_radar.point_to_cart_idx(jnp.asarray(pc), min_to_plus_1=min_to_plus_1)
    )
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)


def test_form_cart_range_angle_grid(ref):
    for width in (640, 641):
        r_want, a_want = ref.form_cart_range_angle_grid(
            cart_pixel_width=width, dtype=torch.float32
        )
        r_got, a_got = m_radar.form_cart_range_angle_grid(cart_pixel_width=width)
        np.testing.assert_allclose(np.asarray(r_got), r_want.numpy(), atol=1e-4)
        np.testing.assert_allclose(np.asarray(a_got), a_want.numpy(), atol=1e-5)


def test_form_polar_range_grid(ref):
    want = ref.form_polar_range_grid(dtype=torch.float32).numpy()
    got = np.asarray(m_radar.form_polar_range_grid())
    np.testing.assert_allclose(got, want, atol=1e-4)
    # Non-default resolution too.
    want = ref.form_polar_range_grid(
        polar_resolution=POLAR_RES, dtype=torch.float32
    ).numpy()
    got = np.asarray(m_radar.form_polar_range_grid(POLAR_RES))
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_load_radar(ref):
    rng = np.random.default_rng(17)
    raw = rng.integers(0, 256, size=(A, 11 + R), dtype=np.uint8)
    # Plant a strictly increasing encoder column and plausible timestamps.
    ticks = np.sort(rng.choice(5600, size=A, replace=False)).astype(np.uint16)
    raw[:, 8:10] = ticks[:, None].view(np.uint8).reshape(A, 2)
    ts = (1.6e15 + np.arange(A) * 625.0).astype(np.int64)
    raw[:, :8] = ts[:, None].view(np.uint8).reshape(A, 8)

    f_want, a_want, t_want = ref.load_radar(raw)
    f_got, a_got, t_got = m_radar.load_radar(raw)
    np.testing.assert_array_equal(f_got, f_want)
    np.testing.assert_allclose(a_got, a_want, rtol=0, atol=0)
    np.testing.assert_array_equal(t_got, t_want)


def test_pol_2_cart(ref):
    rng = np.random.default_rng(23)
    pts = rng.uniform(0, 80, (500, 3)).astype(np.float32)
    want = ref.pol_2_cart(torch.from_numpy(pts)).numpy()
    got = np.asarray(m_radar.pol_2_cart(jnp.asarray(pts)))
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)
