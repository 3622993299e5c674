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

CLI: ``python -m mm_masking_tpu.deploy export|info|run`` (see __main__).
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
    policy = LearnICPWeightPolicy(run_cfg)
    variables = load_policy_variables(run_dir, checkpoint_name)
    payload, header = export_mask_policy(
        policy, variables, batch=batch, platforms=platforms
    )
    header["run_dir"] = osp.abspath(run_dir)
    header["checkpoint"] = checkpoint_name
    return payload, header


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
        return exported.call(jnp.asarray(fft_polar, jnp.float32),
                             jnp.asarray(azimuths, jnp.float32))

    return call, header
