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
    assert main(["run", "--artifact", art, "--scans", str(scan_dir),
                 "--out", out]) == 0
    z = np.load(out)
    assert z["masks"].shape == (2, CART, CART)
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
