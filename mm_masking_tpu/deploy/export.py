"""Serialize the learned-mask inference program as a standalone artifact.

The reference's deployment story is: train in PyTorch, export the UNet to
LibTorch, run mask inference in C++ inside vtr3's localization pipeline
(SURVEY.md §2.3 LibTorch row — the training repo itself only ships the
training-side policy, `/root/reference/mm_masking/icp_weight_policy.py`).

TPU-native equivalent built here with `jax.export`:

  * the WHOLE deployment forward — raw polar power → optional CFAR channel →
    polar→cartesian warp → UNet → max-normalization → cartesian weight mask
    (`LearnICPWeightPolicy.mask_for_scan`) — is traced, lowered to StableHLO
    with the trained weights baked in as constants, and serialized;
  * the artifact is one self-describing file (magic + JSON header + payload)
    that any JAX runtime can deserialize and call WITHOUT this package, flax,
    orbax, or the run's config — the serving-side analog of a TorchScript
    module, portable across TPU/CPU/GPU backends that XLA targets;
  * the batch dimension is symbolic by default (`jax.export.symbolic_shape`),
    so one artifact serves any number of scans per call.

The registration step itself (`localize_clouds` — the reference's C++
`localization_icp` module) exports the same way via `export_localizer`.

CLI: ``python -m mm_masking_tpu.deploy export|export-localizer|info|run``
(see __main__).
"""
from __future__ import annotations

import json
import os.path as osp
import struct
from typing import Any, Callable, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax import export as jax_export

_MAGIC = b"MMTPUEXP"
_VERSION = 1


# --------------------------------------------------------------------- export
def export_mask_policy(
    policy,
    variables: Any,
    *,
    batch: int | str = "b",
    platforms: Sequence[str] | None = None,
) -> tuple[bytes, dict]:
    """Trace + serialize `policy.mask_for_scan` with `variables` baked in.

    batch: an int fixes the batch dimension; a string makes it symbolic
    (one artifact, any batch size). Returns (payload, header) where header
    records the input/output contract for `info`/loaders.

    Note the batch-global max-normalization inside `mask_for_scan`: with a
    symbolic batch the normalization statistics span whatever batch the
    caller passes, exactly like reference validation batches.
    """
    m = policy.cfg.model
    A, R = m.polar_shape

    def fn(fft_polar, azimuths):
        return policy.mask_for_scan(variables, fft_polar, azimuths)

    if isinstance(batch, str):
        (b,) = jax_export.symbolic_shape(f"({batch},)")
        fft_aval = jax.ShapeDtypeStruct((b, A, R), jnp.float32)
        az_aval = jax.ShapeDtypeStruct((b, A), jnp.float32)
    else:
        fft_aval = jax.ShapeDtypeStruct((int(batch), A, R), jnp.float32)
        az_aval = jax.ShapeDtypeStruct((int(batch), A), jnp.float32)

    kwargs = {}
    if platforms is not None:
        kwargs["platforms"] = list(platforms)
    exported = jax_export.export(jax.jit(fn), **kwargs)(fft_aval, az_aval)
    header = {
        "kind": "mask_policy",
        "polar_shape": [int(A), int(R)],
        "cart_pixel_width": int(m.cart_pixel_width),
        "cart_resolution": float(m.cart_resolution),
        "res": float(m.res),
        "batch": batch,
        "platforms": list(exported.platforms),
        "inputs": "fft_polar (B, A, R) f32 in [0,1]; azimuths (B, A) f32 rad",
        "output": "cartesian weight mask (B, Wc, Wc) f32 in [0,1]",
    }
    return exported.serialize(), header


def export_from_run_dir(
    run_dir: str,
    *,
    checkpoint_name: str = "best_policy",
    batch: int | str = "b",
    platforms: Sequence[str] | None = None,
) -> tuple[bytes, dict]:
    """Export from a Trainer run directory (config.json + orbax checkpoint),
    the same inputs the localization CLI's --checkpoint path consumes."""
    from mm_masking_tpu.config import Config
    from mm_masking_tpu.models import LearnICPWeightPolicy
    from mm_masking_tpu.train.checkpoint import load_policy_variables

    cfg_path = osp.join(run_dir, "config.json")
    if not osp.exists(cfg_path):
        raise FileNotFoundError(
            f"{cfg_path} not found — train with this repo's Trainer "
            "(it writes the run config next to its checkpoints)"
        )
    run_cfg = Config.from_dict(json.load(open(cfg_path)))
    # conv_impl / s2d are checkpoint-compatible *lowering* choices
    # (tests/test_unet.py proves identical params + outputs). Artifacts must
    # stay platform-portable, so always export the plain-XLA lowering — a run
    # trained with Pallas NHCW convs would otherwise bake TPU-only Mosaic
    # custom calls into the StableHLO.
    import dataclasses

    run_cfg = dataclasses.replace(
        run_cfg,
        model=dataclasses.replace(
            run_cfg.model, conv_impl="xla", s2d_convs=False),
    )
    policy = LearnICPWeightPolicy(run_cfg)
    variables = load_policy_variables(run_dir, checkpoint_name)
    payload, header = export_mask_policy(
        policy, variables, batch=batch, platforms=platforms
    )
    header["run_dir"] = osp.abspath(run_dir)
    header["checkpoint"] = checkpoint_name
    return payload, header


def export_localizer(
    cfg_loc,
    *,
    n_points: int,
    n_map: int,
    batch: int | str = "b",
    platforms: Sequence[str] | None = None,
) -> tuple[bytes, dict]:
    """Trace + serialize the registration step: clouds → pose.

    The serving-side analog of the reference's C++ localization ICP module
    (`vtr_radar_lidar.localization_icp`, SURVEY.md §2.3 — the module whose
    behavior training imitates): `localize_clouds` with this config baked in,
    callable as (pc (B, N, 3) zero-padded scan clouds, map_pc (B, M, 6) with
    normals, T_init (B, 4, 4), weights (B, N)) → (T (B, 4, 4),
    matched_ratio (B,), ok (B,) bool).

    N and M are static (the solver's sorts/kernels need them); batch may be
    symbolic. NOTE: the NN-association backend is chosen at TRACE time
    (Pallas on TPU, blocked XLA elsewhere), so an artifact exported under a
    TPU backend runs only on TPU; export under CPU (or pass
    platforms=['cpu']) for a portable blocked-XLA artifact.
    """
    from mm_masking_tpu.localization.pipeline import localize_clouds

    def fn(pc, map_pc, T_init, weights):
        out = localize_clouds(pc, map_pc, T_init, cfg_loc, weights=weights)
        return out["T"], out["matched_ratio"], out["ok"]

    if isinstance(batch, str):
        (b,) = jax_export.symbolic_shape(f"({batch},)")
    else:
        b = int(batch)
    avals = (
        jax.ShapeDtypeStruct((b, int(n_points), 3), jnp.float32),
        jax.ShapeDtypeStruct((b, int(n_map), 6), jnp.float32),
        jax.ShapeDtypeStruct((b, 4, 4), jnp.float32),
        jax.ShapeDtypeStruct((b, int(n_points)), jnp.float32),
    )
    kwargs = {}
    if platforms is not None:
        kwargs["platforms"] = list(platforms)
    exported = jax_export.export(jax.jit(fn), **kwargs)(*avals)
    header = {
        "kind": "localizer",
        "n_points": int(n_points),
        "n_map": int(n_map),
        "batch": batch,
        "platforms": list(exported.platforms),
        "icp_type": cfg_loc.icp_type,
        "iterations": [int(cfg_loc.initial_max_iter),
                       int(cfg_loc.refined_max_iter)],
        "min_matched_ratio": float(cfg_loc.min_matched_ratio),
        "inputs": "pc (B, N, 3) zero-padded; map_pc (B, M, 6) xyz+normals "
                  "(zero normals for pt2pt); T_init (B, 4, 4); weights (B, N)",
        "output": "(T (B, 4, 4), matched_ratio (B,), ok (B,) bool)",
    }
    return exported.serialize(), header


def load_localizer(path: str) -> tuple[Callable, dict]:
    """Deserialize a localizer artifact into
    (pc, map_pc, T_init, weights) → (T, matched_ratio, ok). Needs only jax."""
    payload, header = read_artifact(path)
    if header.get("kind") != "localizer":
        raise ValueError(f"{path}: kind={header.get('kind')!r}, "
                         "expected 'localizer'")
    exported = jax_export.deserialize(payload)

    def call(pc, map_pc, T_init, weights):
        return exported.call(
            jnp.asarray(pc, jnp.float32), jnp.asarray(map_pc, jnp.float32),
            jnp.asarray(T_init, jnp.float32),
            jnp.asarray(weights, jnp.float32),
        )

    return call, header


# ------------------------------------------------------------------ file I/O
def write_artifact(path: str, payload: bytes, header: dict) -> None:
    """One self-describing file: magic, u32 header length, JSON header, payload."""
    hdr = json.dumps({"version": _VERSION, **header}).encode()
    with open(path, "wb") as f:
        f.write(_MAGIC)
        f.write(struct.pack("<I", len(hdr)))
        f.write(hdr)
        f.write(payload)


def read_artifact(path: str) -> tuple[bytes, dict]:
    with open(path, "rb") as f:
        magic = f.read(len(_MAGIC))
        if magic != _MAGIC:
            raise ValueError(f"{path}: not an mm_masking_tpu artifact")
        (n,) = struct.unpack("<I", f.read(4))
        header = json.loads(f.read(n))
        payload = f.read()
    return payload, header


def load_mask_policy(path: str) -> tuple[Callable, dict]:
    """Deserialize an artifact into a callable (fft_polar, azimuths) → mask.

    Needs only jax — no flax/orbax/model code; the weights live inside the
    serialized program.
    """
    payload, header = read_artifact(path)
    exported = jax_export.deserialize(payload)

    def call(fft_polar, azimuths):
        # The artifact contract is f32 power in [0, 1]. uint8 is this repo's
        # wire format for the same plane (raw counts / 255), so normalize it
        # here rather than silently casting 0-255 counts to 0.0-255.0 floats
        # (which would feed cfar thresholds tuned for [0, 1] garbage input).
        fft_polar = jnp.asarray(fft_polar)
        if fft_polar.dtype == jnp.uint8:
            fft_polar = fft_polar.astype(jnp.float32) / 255.0
        return exported.call(fft_polar.astype(jnp.float32),
                             jnp.asarray(azimuths, jnp.float32))

    return call, header
