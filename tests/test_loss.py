"""Loss parity vs torch (BCE semantics) and pose-error conventions."""
import numpy as np
import torch
import jax.numpy as jnp

from mm_masking_tpu.config import LossWeights
from mm_masking_tpu.geom import se3_exp
from mm_masking_tpu.train import bce, eval_training_loss, eval_validation_loss


def test_bce_matches_torch():
    rng = np.random.default_rng(0)
    p = rng.uniform(1e-6, 1 - 1e-6, size=(4, 8, 8)).astype(np.float32)
    t = (rng.uniform(size=(4, 8, 8)) > 0.5).astype(np.float32)
    want = torch.nn.BCELoss()(torch.from_numpy(p), torch.from_numpy(t)).item()
    got = float(bce(jnp.asarray(p), jnp.asarray(t)))
    assert abs(got - want) < 1e-6


def test_bce_extreme_values_clamped():
    p = jnp.asarray([[0.0, 1.0]], dtype=jnp.float32)
    t = jnp.asarray([[1.0, 0.0]], dtype=jnp.float32)
    want = torch.nn.BCELoss()(
        torch.tensor([[0.0, 1.0]]), torch.tensor([[1.0, 0.0]])
    ).item()
    got = float(bce(p, t))
    assert np.isfinite(got)
    assert abs(got - want) < 1e-4  # both clamp log at -100


def test_validation_loss_convention():
    # Known planar transform: errors must read sin(theta) and the translation.
    theta, x, y = 0.1, 0.3, -0.2
    xi = jnp.asarray([[x, y, 0, 0, 0, theta]], dtype=jnp.float32)
    T = se3_exp(xi)
    err = np.asarray(eval_validation_loss(T, T))  # gt_eye=True ignores T_gt
    assert abs(err[1] - np.sin(theta)) < 1e-6
    # xi_r is the raw translation column of T (J(phi) rho), not rho itself.
    expected_trans = np.linalg.norm(np.asarray(T)[0, 0:2, 3])
    assert abs(err[2] - expected_trans) < 1e-6
    assert abs(err[0] - np.sqrt(np.sin(theta) ** 2 + expected_trans**2)) < 1e-6


def test_training_loss_terms_toggle():
    B, H, W = 2, 16, 16
    rng = np.random.default_rng(1)
    mask = jnp.asarray(rng.uniform(0.05, 0.95, (B, H, W)).astype(np.float32))
    fft = jnp.asarray(rng.uniform(size=(B, H, W)).astype(np.float32))
    cfar = jnp.asarray((rng.uniform(size=(B, H, W)) > 0.7).astype(np.float32))
    T = se3_exp(jnp.asarray(rng.normal(size=(B, 6)).astype(np.float32) * 0.1))
    T_gt = jnp.broadcast_to(jnp.eye(4), (B, 4, 4))
    scan = {"fft_data": fft, "fft_cfar": cfar}
    mapd = {"pc": jnp.zeros((B, 32, 6))}
    num = jnp.asarray(10.0)
    allpts = jnp.asarray(12.0)

    w = LossWeights(icp_rot=1.0, icp_trans=1.0, fft=0.5, cfar=0.25,
                    mask_pts=0.0, num_pts=1.0)
    loss, comp = eval_training_loss(
        T, mask, num, allpts, T_gt, scan, mapd, w,
        cart_pixel_width=W, cart_resolution=0.5,
    )
    total = (comp.rot + comp.trans + comp.fft + comp.mask_pts + comp.cfar
             + comp.num_pts)
    assert abs(float(loss) - float(total)) < 1e-5
    assert float(comp.num_pts) == 2.0  # 12 - 10
    assert float(comp.mask_pts) == 0.0

    # With mask losses gated off, only the ICP terms remain.
    loss2, comp2 = eval_training_loss(
        T, mask, num, allpts, T_gt, scan, mapd, w,
        mask_losses_active=False, cart_pixel_width=W, cart_resolution=0.5,
    )
    assert float(comp2.fft) == 0.0 and float(comp2.cfar) == 0.0
    assert abs(float(loss2) - float(comp2.rot + comp2.trans)) < 1e-6


def test_config_from_reference_params():
    from mm_masking_tpu.config import Config

    params = {
        "icp_type": "pt2pl", "num_train": 4, "batch_size_train": 8,
        "loss_cfar_mask_weight": 0.5, "normalize": ["standardize"],
        "pos_std": 1.5, "max_iter": 7, "optimizer": "sgd",
        "device": "ignored", "float_type": "ignored",
    }
    cfg = Config.from_reference_params(params)
    assert cfg.model.icp_type == "pt2pl"
    assert cfg.model.normalize == "standardize"
    assert cfg.model.max_iter == 7
    assert cfg.data.num_train == 4 and cfg.data.pos_std == 1.5
    assert cfg.train.batch_size_train == 8 and cfg.train.optimizer == "sgd"
    assert cfg.loss.cfar == 0.5 and cfg.loss.mask_pts == 1.0


def test_num_pts_hinged_floor():
    """num_pts_floor > 0: reference-gradient below the floor, exactly zero
    above it (the round-3 anti-collapse term)."""
    import jax
    from mm_masking_tpu.config import LossWeights

    T = jnp.eye(4)[None]
    mask = jnp.full((1, 8, 8), 0.5)
    batch_scan = {"fft_data": mask}
    batch_map = {"pc": jnp.zeros((1, 4, 6))}
    w = LossWeights(icp_rot=0.0, icp_trans=0.0, mask_pts=0.0,
                    num_pts=1.0, num_pts_floor=0.25)
    mean_all = jnp.asarray(1000.0)

    def num_loss(diff_num):
        loss, comp = eval_training_loss(
            T, mask, diff_num, mean_all, T, batch_scan, batch_map, w)
        return loss

    # Above the floor (250): zero value AND zero gradient.
    assert float(num_loss(jnp.asarray(400.0))) == 0.0
    assert float(jax.grad(num_loss)(jnp.asarray(400.0))) == 0.0
    # Below: the reference's linear gradient (−1 per point).
    assert float(num_loss(jnp.asarray(100.0))) == 150.0
    assert float(jax.grad(num_loss)(jnp.asarray(100.0))) == -1.0
    # floor=0 keeps the reference's always-on linear term.
    w0 = LossWeights(icp_rot=0.0, icp_trans=0.0, mask_pts=0.0, num_pts=1.0)
    loss, _ = eval_training_loss(
        T, mask, jnp.asarray(400.0), mean_all, T, batch_scan, batch_map, w0)
    assert float(loss) == 600.0
