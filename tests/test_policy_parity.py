"""End-to-end policy parity: flax UNet → extract_weights → ICP vs the
reference-equivalent torch chain (`benchmarks/reference_torch.py`).

The solver-parity suite (test_solver_parity.py) bounds the ICP alone; this
test closes the remaining seam VERDICT r3 #3 named: the SAME network weights
driving both full pipelines (UNet forward with the reference's decoder
double-application quirk, `icp_weight_policy.py:100-182` → bilinear weight
lookup, `radar_utils.py:108-140` → 10-iter Cauchy-trim planar ICP per the
dICP call surface, `icp_weight_policy.py:277-288`) must produce masks that
agree to float tolerance and poses within the 1 cm / 0.05° parity budget.
"""
import os.path as osp
import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

sys.path.insert(0, osp.join(osp.dirname(osp.dirname(osp.abspath(__file__))),
                            "benchmarks"))

torch = pytest.importorskip("torch")
from reference_torch import (  # noqa: E402
    TorchUNet,
    extract_weights_torch,
    torch_icp,
)

from mm_masking_tpu.dicp import ICPConfig, icp  # noqa: E402
from mm_masking_tpu.models.unet import UNet  # noqa: E402
from mm_masking_tpu.ops.weights import extract_weights  # noqa: E402

ENC = (4, 8, 16)
WIDTH = 64
CART_RES = 0.5


def _copy_block(tblock, fparams):
    """flax ConvBlock params → torch TorchConvBlock (HWIO → OIHW)."""
    with torch.no_grad():
        for tconv, fname in ((tblock.c1, "Conv_0"), (tblock.c2, "Conv_1")):
            k = np.asarray(fparams[fname]["kernel"])  # (3, 3, cin, cout)
            tconv.weight.copy_(torch.tensor(k.transpose(3, 2, 0, 1)))
            tconv.bias.copy_(torch.tensor(np.asarray(fparams[fname]["bias"])))


def _torch_from_flax(params):
    """Instantiate TorchUNet carrying the flax UNet's weights."""
    net = TorchUNet(cin=1, enc=ENC)
    p = params["params"]
    n_enc = len(ENC)
    for i, blk in enumerate(net.encoder):
        _copy_block(blk, p[f"ConvBlock_{i}"])
    for i, blk in enumerate(net.decoder):
        _copy_block(blk, p[f"ConvBlock_{n_enc + i}"])
    with torch.no_grad():
        k = np.asarray(p["Conv_0"]["kernel"])  # (1, 1, cin, 1)
        net.final[0].weight.copy_(torch.tensor(k.transpose(3, 2, 0, 1)))
        net.final[0].bias.copy_(torch.tensor(np.asarray(p["Conv_0"]["bias"])))
    net.eval()  # dropout off, matching deterministic flax apply
    return net


def _scene(rng, B, n_src=128, n_map=512):
    """Wall-segment scene; map is (B, n_map, 6) with per-point wall normals
    (in-plane perpendicular of each segment direction) so the same scene
    drives both the pt2pt and pt2pl chain tests."""
    mp = np.zeros((B, n_map, 6), np.float32)
    src = np.zeros((B, n_src, 3), np.float32)
    for b in range(B):
        ang = rng.uniform(0, 2 * np.pi, 4)
        for k in range(4):
            d = np.array([np.cos(ang[k]), np.sin(ang[k])])
            a = rng.uniform(-8, 8, 2)
            t = rng.uniform(0, 10, n_map // 4 + n_src // 4)
            pts = a[None] + t[:, None] * d[None]
            sl = slice(k * (n_map // 4), (k + 1) * (n_map // 4))
            mp[b, sl, :2] = pts[: n_map // 4]
            mp[b, sl, 3:5] = [-d[1], d[0]]
            src[b, k * (n_src // 4):(k + 1) * (n_src // 4), :2] = (
                pts[n_map // 4:] + rng.normal(0, 0.02, (n_src // 4, 2)))
    src[..., :2] += np.where(np.abs(src[..., :2]) < 1e-9, 1e-6, 0.0)
    return src, mp


def test_policy_chain_parity():
    rng = np.random.default_rng(3)
    B = 2
    img = rng.uniform(0, 1, (B, WIDTH, WIDTH)).astype(np.float32)

    model = UNet(enc_channels=ENC, dropout=0.0)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, WIDTH, WIDTH, 1)))
    mask_jax = np.asarray(model.apply(params, jnp.asarray(img)[..., None]))

    tnet = _torch_from_flax(params)
    with torch.no_grad():
        mask_torch = tnet(torch.tensor(img).unsqueeze(1)).numpy()

    # Same weights, same math (XLA conv vs torch conv, f32): float-level
    # agreement on the mask.
    assert np.max(np.abs(mask_jax - mask_torch)) < 1e-5, (
        np.max(np.abs(mask_jax - mask_torch)))

    # Weight lookup parity at the scan points.
    src, mp = _scene(rng, B)
    w_jax, _ = extract_weights(jnp.asarray(mask_jax), jnp.asarray(src),
                               cart_resolution=CART_RES,
                               cart_pixel_width=WIDTH)
    w_torch = extract_weights_torch(
        torch.tensor(mask_torch), torch.tensor(src),
        cart_res=CART_RES, width=WIDTH).numpy()
    assert np.max(np.abs(np.asarray(w_jax) - w_torch)) < 1e-5

    # Full-chain pose parity: each side's own mask → weights → 10-iter ICP.
    T0 = np.broadcast_to(np.eye(4), (B, 4, 4)).copy()
    pert = np.eye(4)
    pert[0, 3], pert[1, 3] = 0.2, -0.15
    T0 = T0 @ pert
    cfg = ICPConfig(icp_type="pt2pt", max_iterations=10, differentiable=True,
                    trim_dist=5.0, loss_name="cauchy", loss_metric=1.0, dim=2)
    T_jax = np.asarray(
        icp(src.astype(np.float64), mp.astype(np.float64), T0,
            weight=np.asarray(w_jax, np.float64), cfg=cfg)["T"])
    T_torch = torch_icp(
        torch.tensor(src, dtype=torch.float64),
        torch.tensor(mp, dtype=torch.float64),
        torch.tensor(T0, dtype=torch.float64),
        torch.tensor(w_torch, dtype=torch.float64),
        iters=10,
    ).numpy()
    dt = np.linalg.norm(T_jax[:, :2, 3] - T_torch[:, :2, 3], axis=-1).max()
    dR = np.einsum("bij,bkj->bik", T_jax[:, :2, :2], T_torch[:, :2, :2])
    dr = np.abs(np.arctan2(dR[:, 1, 0], dR[:, 0, 0])).max()
    assert dt <= 0.01, f"policy-chain translation deviation {dt*100:.3f} cm"
    assert dr <= np.radians(0.05), (
        f"policy-chain rotation deviation {np.degrees(dr):.4f} deg")
    print(f"[policy parity] mask maxdiff {np.max(np.abs(mask_jax - mask_torch)):.2e}, "
          f"pose dev {dt*100:.4f} cm / {np.degrees(dr):.5f} deg")


def test_policy_chain_parity_pt2pl_50iter():
    """The EVAL configuration end to end: same UNet weights → weights →
    point-to-plane 50-iteration ICP (the reference's inference solver,
    `icp_weight_policy.py:54-55` max_iterations=50 + the radar→lidar pt2pl
    modules, `radar_lidar_config.yaml:219-248`), JAX chain vs torch chain.
    At convergence the parity budget applies strictly."""
    rng = np.random.default_rng(11)
    B = 2
    img = rng.uniform(0, 1, (B, WIDTH, WIDTH)).astype(np.float32)

    model = UNet(enc_channels=ENC, dropout=0.0)
    params = model.init(jax.random.PRNGKey(1), jnp.zeros((1, WIDTH, WIDTH, 1)))
    mask_jax = np.asarray(model.apply(params, jnp.asarray(img)[..., None]))
    tnet = _torch_from_flax(params)
    with torch.no_grad():
        mask_torch = tnet(torch.tensor(img).unsqueeze(1)).numpy()

    src, mp = _scene(rng, B)
    w_jax, _ = extract_weights(jnp.asarray(mask_jax), jnp.asarray(src),
                               cart_resolution=CART_RES,
                               cart_pixel_width=WIDTH)
    w_torch = extract_weights_torch(
        torch.tensor(mask_torch), torch.tensor(src),
        cart_res=CART_RES, width=WIDTH).numpy()

    T0 = np.broadcast_to(np.eye(4), (B, 4, 4)).copy()
    pert = np.eye(4)
    pert[0, 3], pert[1, 3] = 0.2, -0.15
    T0 = T0 @ pert
    cfg = ICPConfig(icp_type="pt2pl", max_iterations=50, differentiable=True,
                    trim_dist=5.0, loss_name="cauchy", loss_metric=1.0, dim=2)
    T_jax = np.asarray(
        icp(src.astype(np.float64), mp.astype(np.float64), T0,
            weight=np.asarray(w_jax, np.float64), cfg=cfg)["T"])
    T_torch = torch_icp(
        torch.tensor(src, dtype=torch.float64),
        torch.tensor(mp[..., :3], dtype=torch.float64),
        torch.tensor(T0, dtype=torch.float64),
        torch.tensor(w_torch, dtype=torch.float64),
        iters=50,
        normals=torch.tensor(mp[..., 3:6], dtype=torch.float64),
    ).numpy()
    dt = np.linalg.norm(T_jax[:, :2, 3] - T_torch[:, :2, 3], axis=-1).max()
    dR = np.einsum("bij,bkj->bik", T_jax[:, :2, :2], T_torch[:, :2, :2])
    dr = np.abs(np.arctan2(dR[:, 1, 0], dR[:, 0, 0])).max()
    assert dt <= 0.01, f"pt2pl policy-chain translation dev {dt*100:.3f} cm"
    assert dr <= np.radians(0.05), (
        f"pt2pl policy-chain rotation dev {np.degrees(dr):.4f} deg")
    print(f"[policy parity pt2pl/50] pose dev {dt*100:.4f} cm / "
          f"{np.degrees(dr):.5f} deg")
