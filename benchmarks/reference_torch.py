"""One-time baseline measurement: reference-equivalent PyTorch pipeline.

The reference repo publishes no throughput numbers (BASELINE.md) and its GPU
stack cannot run here (CUDA torch + the dICP/vtr submodules are absent from
the snapshot). This script times a PyTorch implementation of the *same*
computation the reference performs — the documented UNet
(`icp_weight_policy.py:85-125`, incl. decoder double application), bilinear
weight lookup (`radar_utils.py:108-140`), and a 10-iteration unrolled
pt2pt Cauchy ICP with trim (dICP call surface, `icp_weight_policy.py:277-288`)
— on this host's torch build (CPU), at the same operating shapes as bench.py.

Writes ../bench_baseline.json with provenance. Run once per machine:
    python benchmarks/reference_torch.py [--quick]
"""
from __future__ import annotations

import argparse
import json
import os.path as osp
import time

import numpy as np
import torch
import torch.nn as nn
import torch.nn.functional as F


class TorchConvBlock(nn.Module):
    def __init__(self, cin, cout, pool):
        super().__init__()
        self.c1 = nn.Conv2d(cin, cout, 3, padding=1)
        self.c2 = nn.Conv2d(cout, cout, 3, padding=1)
        self.pool = pool
        self.drop = nn.Dropout(p=0.05)

    def forward(self, x):
        x = F.relu(self.c1(x))
        x = F.relu(self.c2(x))
        x = self.drop(x)
        if self.pool:
            x = F.max_pool2d(x, 2, 2)
        return x


class TorchUNet(nn.Module):
    """Reference architecture: enc [C,8,...,256], decoder blocks applied twice."""

    def __init__(self, cin=1, enc=(8, 16, 32, 64, 128, 256)):
        super().__init__()
        chans = [cin] + list(enc)
        self.encoder = nn.ModuleList(
            [TorchConvBlock(chans[i], chans[i + 1], pool=(i > 0))
             for i in range(len(enc))]
        )
        dec = list(reversed(enc))
        self.decoder = nn.ModuleList(
            [TorchConvBlock(dec[i], dec[i + 1], pool=False)
             for i in range(len(dec) - 1)]
        )
        self.final = nn.Sequential(nn.Conv2d(dec[-1], 1, 1), nn.Sigmoid())

    def forward(self, x):
        skips = []
        for block in self.encoder:
            skips.append(x)
            x = block(x)
        skips = skips[::-1]
        for i, block in enumerate(self.decoder):
            skip = skips[i]
            x = nn.UpsamplingBilinear2d(size=skip.shape[2:])(x)
            x = block(x)
            x = torch.cat([skip, x], dim=1)
            x = block(x)
        return self.final(x).squeeze(1)


def _nn_assoc(p, mapp, chunk=512):
    """Chunked brute-force NN indices (no autograd; the argmin is piecewise
    constant, and `min(dim=2)`'s backward routes through the argmin element —
    so gathering map[idx] and recomputing the distance differentiably gives
    values AND gradients identical to a full cdist+min, without materializing
    the (B, N, M) matrix ×iters under autograd (4 GB each at reference scale)."""
    with torch.no_grad():
        idxs = []
        for i in range(0, p.shape[1], chunk):
            d = torch.cdist(p[:, i:i + chunk], mapp)
            idxs.append(d.min(dim=2).indices)
        return torch.cat(idxs, dim=1)


def torch_icp(scan, mapp, T_init, weights, iters=10, trim=5.0, k=1.0,
              normals=None):
    """Unrolled batched Cauchy ICP, planar DOF (dICP semantics).

    pt2pt by default; pass `normals` (B, M, 3) for the point-to-plane
    residual the reference's radar→lidar eval modules use
    (`radar_lidar_config.yaml:219-248`, dICP called with normals-carrying
    maps, `icp_weight_dataset.py:395-398`): signed scalar r = n·(p − q),
    robust weight on |r|, trim still gated on point distance.
    """
    T = T_init
    B, N, _ = scan.shape
    for _ in range(iters):
        p = torch.einsum("bij,bnj->bni", T[:, :3, :3], scan) + T[:, None, :3, 3]
        idx = _nn_assoc(p, mapp[..., :3])
        q = torch.gather(mapp[..., :3], 1, idx.unsqueeze(-1).expand(-1, -1, 3))
        r = p - q
        dmin = r.norm(dim=-1)
        if normals is not None:
            nq = torch.gather(normals, 1, idx.unsqueeze(-1).expand(-1, -1, 3))
            r_pl = (nq * r).sum(dim=-1)  # (B, N) signed plane residual
            w = 1.0 / (1.0 + (r_pl.abs() / k) ** 2)
            w = w * (dmin < trim) * weights
            # Planar point-to-plane GN row: J = [n_x, n_y, (p × n)_z].
            Jn = torch.stack(
                [nq[..., 0], nq[..., 1],
                 p[..., 0] * nq[..., 1] - p[..., 1] * nq[..., 0]], dim=-1)
            A = torch.einsum("bni,bnj,bn->bij", Jn, Jn, w)
            b = -torch.einsum("bni,bn,bn->bi", Jn, r_pl, w)
            delta = torch.linalg.solve(A + 1e-9 * torch.eye(3), b)
            dx, dy, dth = delta[:, 0], delta[:, 1], delta[:, 2]
            c, s = torch.cos(dth), torch.sin(dth)
            Td = torch.zeros_like(T)
            Td[:, 0, 0] = c
            Td[:, 0, 1] = -s
            Td[:, 1, 0] = s
            Td[:, 1, 1] = c
            Td[:, 2, 2] = 1.0
            Td[:, 3, 3] = 1.0
            Td[:, 0, 3] = dx
            Td[:, 1, 3] = dy
            T = Td @ T
            continue
        w = 1.0 / (1.0 + (dmin / k) ** 2)
        w = w * (dmin < trim) * weights
        # Planar GN (x, y, yaw).
        Jr = torch.stack([-p[..., 1], p[..., 0]], dim=-1)  # d r / d yaw (2D)
        ones = torch.ones_like(w)
        zeros = torch.zeros_like(w)
        # A (3x3), b (3,)
        A = torch.zeros(B, 3, 3)
        b = torch.zeros(B, 3)
        Jx = torch.stack([ones, zeros, Jr[..., 0]], dim=-1)
        Jy = torch.stack([zeros, ones, Jr[..., 1]], dim=-1)
        A = torch.einsum("bni,bnj,bn->bij", Jx, Jx, w) + torch.einsum(
            "bni,bnj,bn->bij", Jy, Jy, w
        )
        b = -(torch.einsum("bni,bn,bn->bi", Jx, r[..., 0], w)
              + torch.einsum("bni,bn,bn->bi", Jy, r[..., 1], w))
        delta = torch.linalg.solve(A + 1e-9 * torch.eye(3), b)
        dx, dy, dth = delta[:, 0], delta[:, 1], delta[:, 2]
        c, s = torch.cos(dth), torch.sin(dth)
        Td = torch.zeros_like(T)
        Td[:, 0, 0] = c
        Td[:, 0, 1] = -s
        Td[:, 1, 0] = s
        Td[:, 1, 1] = c
        Td[:, 2, 2] = 1.0
        Td[:, 3, 3] = 1.0
        Td[:, 0, 3] = dx
        Td[:, 1, 3] = dy
        T = Td @ T
    return T


def extract_weights_torch(mask, pc, cart_res=0.2384, width=640):
    u = -pc[:, :, 0] / cart_res
    v = pc[:, :, 1] / cart_res
    grid = torch.stack((v, u), dim=2) / (width - 1) * 2
    out = F.grid_sample(mask.unsqueeze(1), grid.unsqueeze(2), mode="bilinear",
                        padding_mode="zeros", align_corners=True)
    return out.squeeze(1).squeeze(-1)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true")
    ap.add_argument("--batch-train", type=int, default=16)
    ap.add_argument("--batch-eval", type=int, default=32)
    ap.add_argument("--n-scan", type=int, default=4096)
    ap.add_argument("--n-map", type=int, default=16384)
    args = ap.parse_args()

    import os
    torch.set_num_threads(os.cpu_count())
    torch.manual_seed(0)
    n_scan, n_map, width = args.n_scan, args.n_map, 640
    bt, be = args.batch_train, args.batch_eval

    net = TorchUNet()
    opt = torch.optim.Adam(net.parameters(), lr=1e-4)

    def make(B):
        return (
            torch.rand(B, 1, width, width),
            torch.randn(B, n_scan, 3) * 20,
            torch.randn(B, n_map, 3) * 20,
            torch.eye(4).expand(B, 4, 4).clone(),
        )

    # --- train step: UNet fwd -> weights -> K-iter ICP -> loss -> backward
    img, scan, mapp, T0 = make(bt)
    def train_step(icp_iters):
        opt.zero_grad()
        mask = net(img)
        w = extract_weights_torch(mask, scan)
        T = torch_icp(scan, mapp, T0, w, iters=icp_iters)
        xi = T - torch.eye(4)
        loss = xi[:, 0:2, 3].norm(dim=1).mean() + xi[:, 1, 0].abs().mean()
        loss = loss + F.binary_cross_entropy(mask, (img.squeeze(1) > 0.5).float())
        loss.backward()
        opt.step()

    # --- eval step: UNet fwd -> weights -> K-iter ICP (no grad)
    img_e, scan_e, map_e, T0_e = make(be)
    def eval_step(icp_iters):
        with torch.no_grad():
            mask = net(img_e)
            w = extract_weights_torch(mask, scan_e)
            torch_icp(scan_e, map_e, T0_e, w, iters=icp_iters)

    # A full 10-iter train step at reference scale (16×4096×16384 NN
    # association per iteration) takes hours on this host's single core, so
    # measure steps at icp_iters ∈ {1, 3} and extrapolate linearly over the
    # iteration count: slope = (t(3) − t(1)) / 2, t(K) = t(1) + (K−1)·slope.
    # The 2-iteration delta keeps the slope above the single-core noise floor
    # (ADVICE r2: an 0↔1 delta at reps=2 measured *negative* — the recorded
    # baseline then counted the entire ICP cost as zero, over-favoring the
    # baseline by construction).
    def timed(fn, reps):
        fn()  # warmup/alloc
        tic = time.perf_counter()
        for _ in range(reps):
            fn()
        return (time.perf_counter() - tic) / reps

    reps = 1 if args.quick else 2
    tr1 = timed(lambda: train_step(1), reps)
    tr3 = timed(lambda: train_step(3), reps)
    tr_slope = max((tr3 - tr1) / 2.0, 0.0)
    t_train = tr1 + 9 * tr_slope
    ev1 = timed(lambda: eval_step(1), reps)
    ev3 = timed(lambda: eval_step(3), reps)
    ev_slope = max((ev3 - ev1) / 2.0, 0.0)
    t_eval = ev1 + 49 * ev_slope

    train_sps = bt / t_train
    eval_sps = be / t_eval
    combined = 2.0 / (1.0 / train_sps + 1.0 / eval_sps)
    out = {
        "combined_scan_pairs_per_sec": round(combined, 4),
        "train_scan_pairs_per_sec": round(train_sps, 4),
        "eval_scan_pairs_per_sec": round(eval_sps, 4),
        "train_step_s": round(t_train, 3),
        "eval_step_s": round(t_eval, 3),
        "train_step_icp1_s": round(tr1, 3),
        "train_step_icp3_s": round(tr3, 3),
        "eval_step_icp1_s": round(ev1, 3),
        "eval_step_icp3_s": round(ev3, 3),
        "batch_train": bt,
        "batch_eval": be,
        "provenance": (
            "reference-equivalent PyTorch pipeline (documented UNet with "
            "decoder double-application, grid_sample weight lookup, unrolled "
            "pt2pt Cauchy trim ICP per dICP call surface) on this host's "
            f"torch {torch.__version__} build, device=cpu, "
            f"threads={torch.get_num_threads()} (host has "
            f"{os.cpu_count()} core(s) — all of them); shapes: cart 640, "
            f"batch {bt}/{be}, "
            f"n_scan {n_scan}, n_map {n_map}. Step times are measured at "
            "icp_iters 1 and 3 and extrapolated linearly to 10 (train) / 50 "
            "(eval) iterations (slope = (t3−t1)/2 — a 2-iteration delta "
            "keeps the slope above the single-core noise floor; the "
            "extrapolation still favors the baseline via warm caches). The "
            "reference "
            "repo publishes no throughput numbers (BASELINE.md) and its "
            "CUDA/dICP stack is not runnable in this image."
        ),
    }
    path = osp.join(osp.dirname(__file__), "..", "bench_baseline.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
