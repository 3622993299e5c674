"""Evaluation harness: sequence localization with constant / masked weights,
plus the online CACFAR->extract_pc->ICP slice (baseline config 2)."""
import numpy as np
import jax.numpy as jnp

from mm_masking_tpu.config import Config, ModelConfig
from mm_masking_tpu.data.synthetic import SyntheticSpec, synthetic_batch
from mm_masking_tpu.evaluation import (
    evaluate_sequence,
    make_constant_weight_localizer,
    make_masked_localizer,
)

SPEC = SyntheticSpec(
    n_scan=128, n_map=512, polar_shape=(64, 512), cart_pixel_width=64,
    res=15.0 / 512, cart_resolution=0.5, max_range=14.0, min_range=2.0,
    pos_std=0.4, rot_std=0.15, network_input_type="polar",
)


def cfg():
    return Config(model=ModelConfig(
        res=SPEC.res, polar_shape=SPEC.polar_shape,
        cart_pixel_width=SPEC.cart_pixel_width,
        cart_resolution=SPEC.cart_resolution,
    ))


def batches(n=2, batch=4):
    return [synthetic_batch(i, batch=batch, spec=SPEC) for i in range(n)]


def test_constant_weight_sequence_eval():
    c = cfg()
    localize = make_constant_weight_localizer(c, max_iterations=50)

    def fn(batch):
        return localize(
            batch["loc_data"]["filtered_pc"], batch["map_data"]["pc"],
            batch["transforms"]["T_ml_init"],
        )

    errs = evaluate_sequence(batches(), fn)
    assert errs.n_frames == 8
    # Most frames converge to mm-level; an occasional frame may fall into a
    # wrong-correspondence basin on this sparse random scene (plain ICP).
    assert errs.trans_mean < 0.12, errs
    assert errs.rot_mean < 0.03, errs


def test_masked_localizer_zero_mask_keeps_damped_solution_finite():
    # All-zero mask -> all weights 0 -> damped GN must stay finite (no NaNs).
    c = cfg()
    localize = make_masked_localizer(c, max_iterations=5)
    b = batches(1)[0]
    mask = jnp.zeros((4, SPEC.cart_pixel_width, SPEC.cart_pixel_width))
    T = localize(mask, b["loc_data"]["filtered_pc"], b["map_data"]["pc"],
                 b["transforms"]["T_ml_init"])
    assert np.isfinite(np.asarray(T)).all()


def test_online_cacfar_extract_icp_slice():
    # Baseline config 2: raw polar scan -> CFAR -> peaks -> ICP, no dataset
    # clouds involved. The synthetic FFT has bright returns at scan points, so
    # the extracted cloud must localize against the map.
    from mm_masking_tpu.evaluation.baselines import config2_cacfar_constant_icp
    from mm_masking_tpu.evaluation.localization import frame_errors

    c = cfg()
    b = batches(1, batch=6)[0]
    T_pred, pc = config2_cacfar_constant_icp(c, b, max_points=256)
    n_pts = int(((np.asarray(pc)[..., 0] != 0).sum(axis=1)).mean())
    assert n_pts > 30, f"too few extracted points: {n_pts}"
    rot, trans = frame_errors(T_pred, b["transforms"]["T_ml_gt"])
    # Online-extracted clouds are coarser than the dataset clouds; the typical
    # frame must still shed most of the (0.4 m, 0.15 rad) init perturbation
    # (an occasional frame lands in a wrong-correspondence basin).
    assert float(np.median(np.asarray(trans))) < 0.25
    assert float(np.median(np.asarray(rot))) < 0.08


def test_config1_unweighted_pt2pl():
    from mm_masking_tpu.evaluation.baselines import config1_unweighted_pt2pl
    from mm_masking_tpu.evaluation.localization import frame_errors

    c = cfg()
    b = batches(1, batch=8)[0]
    T = config1_unweighted_pt2pl(c, b)
    rot, trans = frame_errors(T, b["transforms"]["T_ml_gt"])
    import numpy as np
    # Synthetic normals are random (not true surface normals), so pt2pl is
    # noisy; the typical frame must still converge.
    assert float(np.median(np.asarray(trans))) < 0.1
