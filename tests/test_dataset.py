"""Dataset layer: synthetic on-disk tree → ICPWeightDataset → batches → train."""
import dataclasses
import numpy as np
import jax.numpy as jnp
import pytest

from mm_masking_tpu.config import Config, DataConfig, ModelConfig, TrainConfig
from mm_masking_tpu.data import ICPWeightDataset, epoch_batches
from mm_masking_tpu.data.testing import write_synthetic_dataset
from mm_masking_tpu.dicp import TARGET_PAD_VAL
from mm_masking_tpu.geom import planar_xi_first_order
from mm_masking_tpu.train import Trainer


@pytest.fixture(scope="module")
def synth_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("boreas")
    info = write_synthetic_dataset(str(root), n_frames=4)
    return str(root), info


def make_config(root, info, **data_kw) -> Config:
    A, R = info["polar_shape"]
    cart_width = 64
    return Config(
        model=ModelConfig(
            enc_channels=(4, 8),
            dropout=0.0,
            res=info["polar_res"],
            polar_shape=(A, R),
            cart_pixel_width=cart_width,
            cart_resolution=2 * 15.0 / cart_width,
            max_iter=3,
            inference_max_iter=50,
        ),
        data=DataConfig(
            data_dir=root, pos_std=0.3, rot_std=0.1,
            max_loc_pts=256, max_map_pts=512, **data_kw,
        ),
        train=TrainConfig(batch_size_train=2, batch_size_test=2),
    )


def pairs(info):
    return [(info["map_seq"], info["loc_seq"])]


def test_dataset_loads_and_pads(synth_root):
    root, info = synth_root
    cfg = make_config(root, info)
    ds = ICPWeightDataset(pairs(info), cfg, dataset_type="train")
    assert len(ds) == 4
    item = ds[0]
    raw = item["loc_data"]["raw_pc"]
    assert raw.shape == (ds.max_loc_pts, 3)
    mp = item["map_data"]["pc"]
    assert mp.shape[1] == 6
    # Map pads carry the target pad value.
    assert np.all(mp[-1, :3] == TARGET_PAD_VAL) or mp.shape[0] == 400
    # FFT decoded from the raw Navtech byte layout; stays uint8 on the host
    # (the loader normalizes /255 on device).
    fft = item["loc_data"]["fft_data"]
    assert fft.shape == tuple(info["polar_shape"])
    assert fft.dtype == np.uint8
    assert item["loc_data"]["fft_cfar"].dtype == np.uint8


def test_dataset_gt_alignment_makes_identity_optimal(synth_root):
    # With gt_eye, the map is pre-aligned into the scan frame: scan points must
    # lie on the (filtered) map cloud.
    root, info = synth_root
    cfg = make_config(root, info, augment=False)
    ds = ICPWeightDataset(pairs(info), cfg, dataset_type="train")
    item = ds[1]
    scan = item["loc_data"]["filtered_pc"]
    real_scan = scan[~((scan[:, 0] == 0) & (scan[:, 1] == 0))]
    mp = item["map_data"]["pc"][:, :3]
    real_map = mp[np.abs(mp[:, 0]) < TARGET_PAD_VAL / 2]
    d = np.linalg.norm(real_scan[:, None, :2] - real_map[None, :, :2], axis=-1)
    assert np.median(d.min(axis=1)) < 0.1


def test_dataset_determinism_seed99(synth_root):
    root, info = synth_root
    cfg = make_config(root, info)
    a = ICPWeightDataset(pairs(info), cfg, dataset_type="train")
    b = ICPWeightDataset(pairs(info), cfg, dataset_type="train")
    np.testing.assert_array_equal(a.T_loc_init[0], b.T_loc_init[0])


def test_timestamp_lookup(synth_root):
    root, info = synth_root
    cfg = make_config(root, info, augment=False)
    ds = ICPWeightDataset(pairs(info), cfg, dataset_type="test")
    item = ds.get_item_from_loc_timestamp(info["loc_stamps"][2])
    assert item["loc_data"]["timestamp"] == info["loc_stamps"][2]


def test_epoch_batches_and_train_step(synth_root):
    root, info = synth_root
    cfg = make_config(root, info, augment=True)
    ds = ICPWeightDataset(pairs(info), cfg, dataset_type="train")
    batches = list(epoch_batches(ds, 2, cfg, shuffle=True, seed=0))
    assert len(batches) == 2
    b = batches[0]
    # Cartesian conversion happened on device.
    assert b["loc_data"]["fft_data"].shape == (2, 64, 64)

    trainer = Trainer(cfg)
    state = trainer.init_state()
    state, loss, *_ = trainer._train_step(state, b, mask_losses_active=True)
    assert np.isfinite(float(loss))


def test_loader_normalizes_u8_on_device(synth_root):
    """The u8-on-the-wire pipeline must be numerically identical to the
    legacy host-f32 path: fft u8/255 in f32 on device, cfar {0,1} cast."""
    root, info = synth_root
    cfg = make_config(root, info, augment=False)
    cfg = dataclasses.replace(
        cfg, model=dataclasses.replace(cfg.model, network_input_type="polar")
    )
    ds = ICPWeightDataset(pairs(info), cfg, dataset_type="test")
    item = ds[0]
    assert item["loc_data"]["fft_data"].dtype == np.uint8

    b = next(iter(epoch_batches(ds, 2, cfg, shuffle=False)))
    fft = np.asarray(b["loc_data"]["fft_data"])
    cfar = np.asarray(b["loc_data"]["fft_cfar"])
    assert fft.dtype == np.float32 and cfar.dtype == np.float32
    want = np.divide(item["loc_data"]["fft_data"], 255.0, dtype=np.float32)
    # One f32 ulp: XLA lowers the constant divide to a reciprocal multiply.
    np.testing.assert_allclose(fft[0], want, rtol=0, atol=1e-7)
    np.testing.assert_array_equal(
        cfar[0], item["loc_data"]["fft_cfar"].astype(np.float32))

    # Cartesian mode: warping the device-normalized u8 must equal warping a
    # host-normalized f32 image (the pre-change contract).
    from mm_masking_tpu.data.loader import _warp_batch

    m = cfg.model
    got, _ = _warp_batch(
        jnp.asarray(item["loc_data"]["fft_data"])[None],
        jnp.asarray(item["loc_data"]["fft_cfar"])[None],
        jnp.asarray(item["loc_data"]["azimuths"])[None],
        m.res, m.cart_resolution, m.cart_pixel_width,
    )
    ref, _ = _warp_batch(
        jnp.asarray(want)[None],
        jnp.asarray(item["loc_data"]["fft_cfar"].astype(np.float32))[None],
        jnp.asarray(item["loc_data"]["azimuths"])[None],
        m.res, m.cart_resolution, m.cart_pixel_width,
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=0, atol=1e-6)


def test_epoch_batches_prefetch_matches_inline(synth_root):
    """The prefetch thread must not change batch content or order — including
    the augmentation RNG consumption sequence (one worker, same call order)."""
    root, info = synth_root
    cfg = make_config(root, info, augment=True)

    def run(prefetch):
        ds = ICPWeightDataset(pairs(info), cfg, dataset_type="train")
        return list(epoch_batches(ds, 2, cfg, shuffle=True, seed=3,
                                  prefetch=prefetch))

    a, b = run(0), run(1)
    assert len(a) == len(b)
    import jax

    for ba, bb in zip(a, b):
        la, lb = jax.tree_util.tree_leaves(ba), jax.tree_util.tree_leaves(bb)
        assert len(la) == len(lb)
        for xa, xb in zip(la, lb):
            np.testing.assert_array_equal(np.asarray(xa), np.asarray(xb))


def test_cfar_cache_u8_and_legacy_f32(synth_root, tmp_path):
    """CFAR cache is written u8; a legacy f32 cache file is accepted."""
    root, info = synth_root
    cfg = make_config(root, info, augment=False)
    ds = ICPWeightDataset(pairs(info), cfg, dataset_type="train")
    _, _, cfar_path, _ = ds.entries[0]
    cached = np.load(cfar_path)
    assert cached.dtype == np.uint8
    assert set(np.unique(cached)) <= {0, 1}
    # Rewrite as legacy f32; the loader must still hand back u8 {0,1} AND
    # re-save the cache file as u8 (one-time re-quantization, not per-read).
    np.save(cfar_path, cached.astype(np.float32))
    item = ds[0]
    assert item["loc_data"]["fft_cfar"].dtype == np.uint8
    assert np.load(cfar_path).dtype == np.uint8
    np.save(cfar_path, cached)  # restore for other tests


def test_epoch_batches_prefetch_propagates_worker_errors(synth_root):
    """An exception inside the worker (dataset/collate) must surface to the
    consumer as the exception, not a hang or silent truncation."""
    root, info = synth_root
    cfg = make_config(root, info, augment=False)
    ds = ICPWeightDataset(pairs(info), cfg, dataset_type="train")

    class Boom(RuntimeError):
        pass

    class ExplodingView:
        def __len__(self):
            return len(ds)

        def __getitem__(self, i):
            if i >= 2:
                raise Boom("bad item")
            return ds[i]

    import pytest

    it = epoch_batches(ExplodingView(), 2, cfg, shuffle=False, prefetch=1)
    next(it)  # first batch (items 0, 1) is fine
    with pytest.raises(Boom, match="bad item"):
        next(it)


def test_epoch_batches_abandoned_prefetch_joins_worker(synth_root):
    """Abandoning the generator early must stop AND join the worker thread —
    a live worker would race a new epoch's iteration on the same dataset's
    (non-thread-safe) augmentation RNG."""
    import threading

    root, info = synth_root
    cfg = make_config(root, info, augment=True)
    ds = ICPWeightDataset(pairs(info), cfg, dataset_type="train")
    it = epoch_batches(ds, 2, cfg, shuffle=True, seed=3, prefetch=1)
    next(it)
    it.close()  # GeneratorExit -> finally: stop.set(); t.join()
    assert not any(
        t.name == "epoch_batches_prefetch" and t.is_alive()
        for t in threading.enumerate()
    )


def test_val_dataset_ones_baseline_reduces_error(synth_root):
    # End-to-end slice on the on-disk pipeline: unweighted ICP from the
    # perturbed init must approach identity on the synthetic scene.
    root, info = synth_root
    from mm_masking_tpu.config import LossWeights

    cfg = make_config(root, info, augment=False)
    # Zero the mask-loss weights so generate_baseline picks the all-ones mask
    # (with mask_pts > 0 it would pick the map-BEV mask, reference `:296-316`).
    cfg = dataclasses.replace(
        cfg, loss=LossWeights(icp_rot=1.0, icp_trans=1.0, mask_pts=0.0)
    )
    ds = ICPWeightDataset(pairs(info), cfg, dataset_type="test")
    trainer = Trainer(cfg)
    state = trainer.init_state()
    batches = list(epoch_batches(ds, 2, cfg, shuffle=False, seed=0))
    init_loss, ones_loss = trainer.generate_baseline(
        state, batches, baseline_type="val"
    )
    assert ones_loss < 0.5 * init_loss, (init_loss, ones_loss)


def test_augmentation_keeps_scan_and_image_consistent(synth_root):
    # SURVEY §4 property: the rotation augmentation must rotate clouds and
    # roll the polar image *together* — bright FFT bins still line up with the
    # scan points' polar coordinates after augmentation.
    root, info = synth_root
    cfg = make_config(root, info, augment=True)
    ds = ICPWeightDataset(pairs(info), cfg, dataset_type="train")
    item = ds[0]
    fft = item["loc_data"]["fft_data"]  # polar (A, R), augmented
    az = item["loc_data"]["azimuths"]
    scan = item["loc_data"]["filtered_pc"]
    real = scan[~((scan[:, 0] == 0) & (scan[:, 1] == 0))]

    A, R = fft.shape
    res = info["polar_res"]
    r_idx = np.clip((np.linalg.norm(real[:, :2], axis=1) / res).astype(int),
                    0, R - 1)
    ang = np.mod(np.arctan2(real[:, 1], real[:, 0]), 2 * np.pi)
    # Floor-semantics row lookup against the (rolled, sorted) azimuth array:
    # the synthetic writer plants each return in the row whose azimuth is the
    # floor of the point angle (single-row peaks — nearest-rounding misses
    # half of them).
    a_idx = np.searchsorted(az, ang, side="right") - 1
    a_idx = np.where(a_idx < 0, A - 1, a_idx)
    vals = fft[a_idx, r_idx]
    # Scan-point bins must be much brighter than the noise floor.
    assert np.median(vals) > 5 * np.median(fft), (np.median(vals),
                                                  np.median(fft))
