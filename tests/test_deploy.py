"""Deployment artifacts: jax.export round trip of the mask-inference program.

The reference's deployment forks export the trained UNet to LibTorch for
in-C++ inference inside vtr3 (SURVEY.md §2.3 LibTorch row); here the whole
raw-scan→mask forward is serialized as a StableHLO artifact and must
reproduce `LearnICPWeightPolicy.mask_for_scan` exactly after a byte-level
round trip — including at batch sizes never seen at export time (symbolic
batch dimension).
"""
import dataclasses
import json

import jax
import numpy as np
import pytest

from mm_masking_tpu.config import Config, DataConfig, ModelConfig, TrainConfig
from mm_masking_tpu.models import LearnICPWeightPolicy


A, R, CART = 32, 128, 32


def make_policy(cfar_input=True):
    cfg = Config(
        model=ModelConfig(
            enc_channels=(4, 8), dropout=0.0, res=15.0 / R,
            polar_shape=(A, R), cart_pixel_width=CART,
            cart_resolution=2 * 15.0 / CART, cfar_input=cfar_input,
        ),
        data=DataConfig(max_loc_pts=64, max_map_pts=128),
        train=TrainConfig(num_devices=1),
    )
    policy = LearnICPWeightPolicy(cfg)
    variables = policy.init(jax.random.PRNGKey(0))
    return cfg, policy, variables


def scans(batch, seed=0):
    rng = np.random.default_rng(seed)
    fft = rng.random((batch, A, R), np.float32) ** 2
    az = np.tile(
        (np.arange(A, dtype=np.float32) / A * 2 * np.pi)[None], (batch, 1)
    )
    return fft, az


def test_export_roundtrip_symbolic_batch(tmp_path):
    from mm_masking_tpu.deploy import (
        export_mask_policy, load_mask_policy, write_artifact,
    )

    cfg, policy, variables = make_policy()
    payload, header = export_mask_policy(policy, variables, batch="b")
    path = str(tmp_path / "policy.mmx")
    write_artifact(path, payload, header)

    call, hdr = load_mask_policy(path)
    assert hdr["polar_shape"] == [A, R]
    # Two batch sizes through ONE artifact; exact match with the live policy.
    for b, seed in ((1, 0), (3, 1)):
        fft, az = scans(b, seed)
        got = np.asarray(call(fft, az))
        want = np.asarray(policy.mask_for_scan(variables, fft, az))
        assert got.shape == (b, CART, CART)
        # isfinite first: assert_array_equal treats NaN == NaN as a match,
        # which would hide an all-NaN forward on both sides.
        assert np.isfinite(want).all()
        # Symbolic-batch lowering fuses differently from the concrete-shape
        # live program; bound the f32 rounding skew tightly instead of
        # demanding bit equality (observed max 1.2e-6 on CPU — three orders
        # below the mask's own 1/255 input quantization).
        np.testing.assert_allclose(got, want, rtol=0, atol=5e-6)

    # u8 wire-format planes normalize /255 inside the loader wrapper —
    # NOT a silent cast of 0-255 counts to 0.0-255.0 floats.
    fft_u8 = (scans(2, 2)[0] * 255).astype(np.uint8)
    az2 = scans(2, 2)[1]
    got_u8 = np.asarray(call(fft_u8, az2))
    want_u8 = np.asarray(policy.mask_for_scan(
        variables, fft_u8.astype(np.float32) / 255.0, az2))
    np.testing.assert_allclose(got_u8, want_u8, rtol=0, atol=5e-6)


def test_artifact_header_and_magic(tmp_path):
    from mm_masking_tpu.deploy import read_artifact, write_artifact

    path = str(tmp_path / "x.mmx")
    write_artifact(path, b"payload-bytes", {"kind": "mask_policy"})
    payload, header = read_artifact(path)
    assert payload == b"payload-bytes"
    assert header["kind"] == "mask_policy"
    assert header["version"] == 1

    bad = str(tmp_path / "bad.mmx")
    with open(bad, "wb") as f:
        f.write(b"NOTMAGIC" + b"\x00" * 16)
    with pytest.raises(ValueError, match="not an mm_masking_tpu artifact"):
        read_artifact(bad)


def test_cli_export_info_run(tmp_path):
    """Run-dir → artifact → masks over raw scan files, via the CLI."""
    from mm_masking_tpu.deploy.__main__ import main
    from mm_masking_tpu.train.checkpoint import save_checkpoint
    from mm_masking_tpu.train.trainer import Trainer

    cfg, policy, variables = make_policy()
    run = tmp_path / "run"
    cfg = dataclasses.replace(
        cfg, train=dataclasses.replace(cfg.train, checkpoint_dir=str(run))
    )
    trainer = Trainer(cfg)
    save_checkpoint(str(run), "best_policy", trainer.init_state())
    with open(run / "config.json", "w") as f:
        json.dump(dataclasses.asdict(cfg), f)

    art = str(tmp_path / "policy.mmx")
    assert main(["export", "--checkpoint", str(run), "--out", art]) == 0
    assert main(["info", art]) == 0

    # raw Navtech scans on disk (the layout load_radar decodes)
    scan_dir = tmp_path / "scans"
    scan_dir.mkdir()
    rng = np.random.default_rng(0)
    for i in range(2):
        img = np.zeros((A, 11 + R), np.uint8)
        ts = (np.arange(A, dtype=np.int64) + 1000 * i) * 400
        img[:, :8] = np.frombuffer(ts.tobytes(), np.uint8).reshape(A, 8)
        enc = (np.arange(A, dtype=np.float64) / A * 5600).astype(np.uint16)
        img[:, 8:10] = np.frombuffer(enc.tobytes(), np.uint8).reshape(A, 2)
        img[:, 11:] = rng.integers(0, 255, (A, R), dtype=np.uint8)
        np.save(scan_dir / f"{1_000_000 + i}.npy", img)

    out = str(tmp_path / "masks.npz")
    # --batch-size 1 exercises the chunked path (real repeats are thousands
    # of scans; one giant batch would OOM)
    assert main(["run", "--artifact", art, "--scans", str(scan_dir),
                 "--out", out, "--batch-size", "1"]) == 0
    z = np.load(out)
    assert z["masks"].shape == (2, CART, CART)
    assert list(z["stamps"]) == ["1000000", "1000001"]
    assert np.isfinite(z["masks"]).all()
    assert z["masks"].min() >= 0.0 and z["masks"].max() <= 1.0


def test_export_fixed_batch_rejects_other_sizes(tmp_path):
    from mm_masking_tpu.deploy import export_mask_policy, load_mask_policy, \
        write_artifact

    cfg, policy, variables = make_policy(cfar_input=False)
    payload, header = export_mask_policy(policy, variables, batch=2)
    path = str(tmp_path / "fixed.mmx")
    write_artifact(path, payload, header)
    call, _ = load_mask_policy(path)
    fft, az = scans(2)
    assert np.asarray(call(fft, az)).shape == (2, CART, CART)
    fft3, az3 = scans(3)
    with pytest.raises(Exception):
        call(fft3, az3)


def test_localizer_export_roundtrip(tmp_path):
    """Registration-step artifact (the reference's C++ localization_icp
    module as a servable program): byte-level round trip must reproduce
    `localize_clouds` on a synthetic scene, at unseen batch sizes."""
    import jax.numpy as jnp

    from mm_masking_tpu.data.synthetic import SyntheticSpec, synthetic_batch
    from mm_masking_tpu.deploy import (
        export_localizer, load_localizer, write_artifact,
    )
    from mm_masking_tpu.localization.pipeline import (
        LocalizationConfig, localize_clouds,
    )

    spec = SyntheticSpec(cart_pixel_width=CART, polar_shape=(A, R),
                         res=15.0 / R, cart_resolution=2 * 15.0 / CART,
                         n_scan=64, n_map=128, pos_std=0.4, rot_std=0.15)
    b = synthetic_batch(3, batch=3, spec=spec)
    cfg = LocalizationConfig(max_points=64, beta=0.0, icp_type="pt2pl",
                             initial_max_iter=2, refined_max_iter=6,
                             min_matched_ratio=0.3)
    pc = jnp.asarray(b["loc_data"]["filtered_pc"][..., :3])
    map_pc = jnp.asarray(b["map_data"]["pc"])
    T0 = jnp.asarray(b["transforms"]["T_ml_init"])
    w = (~((pc[..., 0] == 0.0) & (pc[..., 1] == 0.0))).astype(jnp.float32)

    payload, header = export_localizer(
        cfg, n_points=pc.shape[1], n_map=map_pc.shape[1], batch="b")
    path = str(tmp_path / "localizer.mmx")
    write_artifact(path, payload, header)

    call, hdr = load_localizer(path)
    assert hdr["kind"] == "localizer"
    assert hdr["iterations"] == [2, 6]
    T, ratio, ok = call(pc, map_pc, T0, w)
    ref = localize_clouds(pc, map_pc, T0, cfg, weights=w)
    np.testing.assert_allclose(np.asarray(T), np.asarray(ref["T"]),
                               rtol=0, atol=1e-5)
    np.testing.assert_allclose(np.asarray(ratio),
                               np.asarray(ref["matched_ratio"]),
                               rtol=0, atol=1e-6)
    np.testing.assert_array_equal(np.asarray(ok), np.asarray(ref["ok"]))
    assert np.asarray(ratio).min() > 0.0  # the scene actually matches

    # unseen batch size through the same artifact
    T1, r1, _ = call(pc[:1], map_pc[:1], T0[:1], w[:1])
    assert T1.shape == (1, 4, 4) and r1.shape == (1,)

    # a mask_policy artifact must be refused by the localizer loader
    from mm_masking_tpu.deploy import load_mask_policy  # noqa: F401
    bad = str(tmp_path / "wrong.mmx")
    write_artifact(bad, b"x", {"kind": "mask_policy"})
    with pytest.raises(ValueError, match="expected 'localizer'"):
        load_localizer(bad)


def test_cli_export_localizer(tmp_path):
    from mm_masking_tpu.deploy import load_localizer
    from mm_masking_tpu.deploy.__main__ import main

    art = str(tmp_path / "loc.mmx")
    assert main(["export-localizer", "--out", art, "--n-points", "32",
                 "--n-map", "64", "--batch", "2",
                 "--cfg", "icp_type=pt2pt", "--cfg", "refined_max_iter=3",
                 "--cfg", "min_matched_ratio=0.25"]) == 0
    assert main(["info", art]) == 0
    call, hdr = load_localizer(art)
    assert hdr["icp_type"] == "pt2pt" and hdr["iterations"][1] == 3
    rng = np.random.default_rng(0)
    pts = rng.normal(size=(2, 32, 3)).astype(np.float32)
    mp = np.concatenate(
        [pts[:, :32], rng.normal(size=(2, 32, 3)).astype(np.float32)], axis=1)
    mp = np.concatenate([mp, np.zeros((2, 64, 3), np.float32)], axis=-1)
    T0 = np.tile(np.eye(4, dtype=np.float32), (2, 1, 1))
    T, ratio, ok = call(pts, mp, T0, np.ones((2, 32), np.float32))
    assert T.shape == (2, 4, 4) and np.isfinite(np.asarray(T)).all()

    # unknown --cfg key refuses loudly
    with pytest.raises(SystemExit, match="unknown LocalizationConfig"):
        main(["export-localizer", "--out", art, "--cfg", "nope=1"])
