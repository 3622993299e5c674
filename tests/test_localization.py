"""Full localization pipeline: raw scan -> detector -> cloud -> 2-phase ICP."""
import numpy as np
import jax.numpy as jnp

from mm_masking_tpu.data.synthetic import SyntheticSpec, synthetic_batch
from mm_masking_tpu.geom import planar_xi_first_order
from mm_masking_tpu.localization import (
    LocalizationConfig,
    localize_frame,
    project_map,
)

SPEC = SyntheticSpec(
    n_scan=128, n_map=512, polar_shape=(64, 512), cart_pixel_width=64,
    res=15.0 / 512, cart_resolution=0.5, max_range=14.0, min_range=2.0,
    pos_std=0.3, rot_std=0.1, network_input_type="polar",
)


def test_localize_frame_recovers_pose():
    b = synthetic_batch(0, batch=6, spec=SPEC)
    cfg = LocalizationConfig(
        detector="modified_cacfar",
        detector_kwargs=(("width", 21), ("guard", 2), ("maxr", 15.0)),
        radar_resolution=SPEC.res,
        max_points=256,
        beta=0.0,
        icp_type="pt2pl",
        refined_max_iter=50,
    )
    out = localize_frame(
        b["loc_data"]["fft_data"],  # polar (network_input_type='polar')
        b["loc_data"]["azimuths"],
        b["loc_data"]["az_times"],
        b["map_data"]["pc"],
        b["transforms"]["T_ml_init"],
        cfg,
    )
    import numpy as np

    th, r = planar_xi_first_order(out["T"])
    trans = np.asarray(jnp.linalg.norm(r, axis=-1))
    # The typical frame must shed most of the (0.3 m, 0.1 rad) perturbation
    # (an occasional frame lands in a wrong basin on this sparse scene).
    th0, r0 = planar_xi_first_order(b["transforms"]["T_ml_init"])
    init_trans = np.asarray(jnp.linalg.norm(r0, axis=-1))
    assert float(np.median(trans)) < 0.6 * float(np.median(init_trans)), (
        trans, init_trans)
    assert float(jnp.mean(out["matched_ratio"])) > 0.5
    assert bool(out["ok"].all())


def test_project_map_filters_elevation_and_normals():
    cfg = LocalizationConfig(elevation_threshold=0.05, normal_threshold=0.5)
    pts = jnp.asarray([[
        [10.0, 0.0, 0.0, 0.0, 1.0, 0.0],   # keep
        [10.0, 0.0, 5.0, 0.0, 1.0, 0.0],   # high elevation -> drop
        [10.0, 0.0, 0.0, 0.0, 0.0, 1.0],   # z-normal -> drop
    ]])
    out = np.asarray(project_map(pts, cfg))
    assert out[0, 0, 0] == 10.0
    assert np.all(out[0, 1] == 1000.0)
    assert np.all(out[0, 2] == 1000.0)
