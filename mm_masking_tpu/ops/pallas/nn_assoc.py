"""Tiled brute-force nearest-neighbor association.

The inner loop of ICP: for every (transformed) scan point, the index of the
closest map point. The reference delegates this to dICP's torch `cdist`-style
association over ~O(10k) × O(10k) pairs per batch element
(`/root/reference/mm_masking/icp_weight_policy.py:277-288` calls
``ICP_alg.icp``). Materializing the (B, N, M) distance matrix in HBM at f32
costs GBs per batch; both implementations here keep it tiled:

* :func:`nn_argmin_blocked` — pure-JAX ``lax.scan`` over map chunks with a
  running (min, argmin). Works on any backend; the per-chunk (N, TM) tile is
  all XLA ever materializes.
* :func:`nn_argmin_pallas` — Pallas TPU kernel, grid ``(B, N/TN, M/TM)`` with
  the running min in VMEM scratch, distance tiles computed on the VPU via
  coordinate broadcasting (K=3 is too thin to feed the MXU usefully).

Both return first-occurrence argmin (torch/numpy tie-breaking). Distances are
not differentiated through (the association index is discrete); callers
recompute residuals from gathered coordinates.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def nn_argmin_blocked(
    p: jax.Array, q: jax.Array, chunk: int = 2048
) -> tuple[jax.Array, jax.Array]:
    """p: (B, N, 3), q: (B, M, 3) → (idx (B, N) int32, dist2 (B, N))."""
    B, N, _ = p.shape
    M = q.shape[1]
    n_chunks = -(-M // chunk)
    pad = n_chunks * chunk - M
    if pad:
        # Pad with +inf-distance sentinels (never selected).
        q = jnp.concatenate(
            [q, jnp.full((B, pad, 3), 1e30, q.dtype)], axis=1
        )
    q_chunks = q.reshape(B, n_chunks, chunk, 3)
    p_sq = jnp.sum(p * p, axis=-1)  # (B, N)

    def body(carry, qc):
        best_d2, best_idx, k = carry
        # qc: (B, chunk, 3)
        q_sq = jnp.sum(qc * qc, axis=-1)  # (B, chunk)
        cross = jnp.einsum(
            "bnd,bmd->bnm", p, qc, precision="highest"
        )  # (B, N, chunk)
        d2 = p_sq[:, :, None] - 2.0 * cross + q_sq[:, None, :]
        local = jnp.min(d2, axis=2)
        local_arg = jnp.argmin(d2, axis=2).astype(jnp.int32) + k * chunk
        better = local < best_d2
        return (
            jnp.where(better, local, best_d2),
            jnp.where(better, local_arg, best_idx),
            k + 1,
        ), None

    init = (
        jnp.full((B, N), jnp.inf, p.dtype),
        jnp.zeros((B, N), jnp.int32),
        jnp.int32(0),
    )
    (best_d2, best_idx, _), _ = jax.lax.scan(
        body, init, jnp.moveaxis(q_chunks, 1, 0)
    )
    return best_idx, best_d2


def _nn_kernel(p_ref, q_ref, idx_ref, d2_ref, mval, midx, *, tm: int, nk: int):
    """(TN, TM) distance tile on the VPU, transpose-free.

    Layouts are chosen so no relayout happens in the body: p is (TN, 8) with
    coordinates on lanes — a column slice ``p_ref[0][:, c:c+1]`` is (TN, 1)
    and broadcasts against q's (1, TM) row slices directly. The exact
    ``(p − q)^2`` subtraction form is also numerically superior to the
    |p|² − 2p·q + |q|² matmul expansion: an MXU formulation needs
    precision=HIGHEST to avoid bf16 operand rounding (measured: tens of m²
    distance error, 40% wrong correspondences) and is K=8-starved anyway.
    """
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _():
        mval[:] = jnp.full_like(mval[:], jnp.inf)
        midx[:] = jnp.zeros_like(midx[:])

    p = p_ref[0]  # (TN, 8): [x y z · · · · ·]
    q = q_ref[0]  # (8, TM): rows x, y, z
    dx = p[:, 0:1] - q[0:1, :]
    dy = p[:, 1:2] - q[1:2, :]
    dz = p[:, 2:3] - q[2:3, :]
    d = dx * dx + dy * dy + dz * dz  # (TN, TM)

    local_min = jnp.min(d, axis=1, keepdims=True)  # (TN, 1)
    local_arg = jnp.argmin(d, axis=1).reshape(-1, 1).astype(jnp.int32) + k * tm

    better = local_min < mval[:]
    mval[:] = jnp.where(better, local_min, mval[:])
    midx[:] = jnp.where(better, local_arg, midx[:])

    @pl.when(k == nk - 1)
    def _():
        idx_ref[0, 0, :] = midx[:, 0]
        d2_ref[0, 0, :] = mval[:, 0]


def nn_argmin_pallas(
    p: jax.Array, q: jax.Array, tn: int | None = None, tm: int | None = None,
    interpret: bool = False,
) -> tuple[jax.Array, jax.Array]:
    """Pallas-TPU tiled NN argmin with adaptive tiles. p: (B, N, 3), q: (B, M, 3).

    Tile choice (measured on v5e): wide map tiles win — (tn=256, tm=8192) runs
    ~25% faster than (512, 2048) at reference shapes; the (tn × tm) f32
    distance tile must stay ≲8 MB of VMEM.
    """
    N, M = p.shape[1], q.shape[1]
    if tm is None:
        tm = 512
        while tm < M and tm < 8192:
            tm *= 2
    if tn is None:
        tn = min(256, max(8, 1 << (max(N - 1, 1)).bit_length()))
        tn = min(tn, 8 * 1024 * 1024 // (4 * tm) or 8)
    return _nn_argmin_pallas(p, q, tn=tn, tm=tm, interpret=interpret)


def coord_major(q: jax.Array, m_pad: int = 0) -> jax.Array:
    """(B, M, 3) point-major → (B, 8, M+m_pad) coord-major kernel layout
    (rows x, y, z, then zero rows; m_pad columns of far sentinels). Build
    this ONCE for a map reused across solver iterations — re-transposing a
    loop-invariant 64 MB map every iteration is measurable."""
    B = q.shape[0]
    if m_pad:
        q = jnp.concatenate(
            [q, jnp.full((B, m_pad, 3), 1e30, q.dtype)], axis=1
        )
    return jnp.pad(jnp.swapaxes(q, -1, -2), ((0, 0), (0, 5), (0, 0)))


@functools.partial(jax.jit, static_argnames=("tn", "tm", "interpret"))
def _nn_argmin_pallas(
    p: jax.Array, q: jax.Array, tn: int, tm: int, interpret: bool = False,
) -> tuple[jax.Array, jax.Array]:
    M = q.shape[1]
    QT = coord_major(q, m_pad=-M % tm)  # (B, 8, Mp)
    return _nn_argmin_pallas_fmt(p, QT, tn=tn, tm=tm, interpret=interpret)


@functools.partial(jax.jit, static_argnames=("tn", "tm", "interpret"))
def _nn_argmin_pallas_fmt(
    p: jax.Array, QT: jax.Array, tn: int, tm: int, interpret: bool = False,
) -> tuple[jax.Array, jax.Array]:
    """Core kernel over a pre-formatted coord-major map (see coord_major)."""
    B, N, _ = p.shape
    n_pad = -N % tn
    # p stays point-major (N, 8) — coords on lanes.
    P = jnp.pad(p, ((0, 0), (0, n_pad), (0, 5)))  # (B, Np, 8)

    Np, Mp = P.shape[1], QT.shape[2]
    assert Mp % tm == 0, (Mp, tm)
    nk = Mp // tm

    idx, d2 = pl.pallas_call(
        functools.partial(_nn_kernel, tm=tm, nk=nk),
        grid=(B, Np // tn, nk),
        in_specs=[
            pl.BlockSpec((1, tn, 8), lambda b, i, k: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, tm), lambda b, i, k: (b, 0, k),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            # (1, 1, tn) blocks of (B, 1, Np) outputs: the singleton sublane dim
            # equals the array dim, satisfying the (8, 128) tiling rule.
            pl.BlockSpec((1, 1, tn), lambda b, i, k: (b, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, tn), lambda b, i, k: (b, 0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, 1, Np), jnp.int32),
            jax.ShapeDtypeStruct((B, 1, Np), p.dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((tn, 1), p.dtype),
            pltpu.VMEM((tn, 1), jnp.int32),
        ],
        interpret=interpret,
    )(P, QT)
    return idx[:, 0, :N], d2[:, 0, :N]


def nn_argmin(
    p: jax.Array, q: jax.Array, use_pallas: bool | None = None,
    tm: int | None = None,
) -> tuple[jax.Array, jax.Array]:
    """Dispatch: Pallas kernel on TPU, blocked XLA elsewhere."""
    if use_pallas is None:
        use_pallas = jax.default_backend() == "tpu"
    if use_pallas:
        return nn_argmin_pallas(p, q, tm=tm)
    return nn_argmin_blocked(p, q, chunk=tm or 2048)


# ---------------------------------------------------------------------------
# Sorted-stripe NN: exact brute force over a provably sufficient map window.
#
# The dense kernels above touch all N·M pairs every ICP iteration; at
# reference scale (4096 × 16384, 50 eval iterations) that association is the
# eval-step bottleneck. ICP only needs the nearest neighbor when it lies
# within `trim_dist` (farther points get weight 0 in the GN step), which
# bounds the search geometrically: sort the map along its widest planar axis
# once per solve, sort the scan points by the same key each iteration, and a
# tile of TN consecutive sorted scan points only ever needs the contiguous
# run of map points whose key lies within [tile_min − trim, tile_max + trim].
# A fixed window of W map points starting at searchsorted(tile_min − trim)
# covers that run whenever the run's length ≤ W; the kernel checks this per
# tile and falls back to the dense path for the whole call if ANY tile
# overflows (lax.cond). Within trim the result is therefore exact (same
# neighbor as dense, first-occurrence-in-sorted-order index); a point whose
# true NN lies BEYOND trim may get a different — also beyond-trim —
# candidate, which the GN step weights to zero either way.
#
# Work drops from N·M to N·W pairs per iteration (4× at the default
# W = M/4), at the cost of one (B, N) sort + (B, T, W) gather per iteration
# and one (B, M) map sort per solve.
# ---------------------------------------------------------------------------


def stripe_sort_target(
    q_full: jax.Array, pad_val: float = 1000.0
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Sort map rows by their widest-spread planar coordinate.

    q_full: (B, M, C≥3) points (+normals etc.); rows are permuted jointly.
    Returns (q_sorted (B, M, C), key_sorted (B, M), use_x (B,) bool).
    Pad rows (`target_pad_val` sentinels, +1000) sort to the top end and are
    never within trim of a real point. NaN keys sort last.

    Gradient note: the sort KEYS and permutation are discrete/stop-gradient,
    but ``q_sorted``'s VALUES keep ``q_full``'s gradient (take_along_axis is
    differentiable w.r.t. the gathered operand) — callers that gather
    residual coordinates from ``q_sorted`` see the same target gradients as
    the dense path.
    """
    q_sg = jax.lax.stop_gradient(q_full)
    # Span over REAL rows only: including the +pad_val sentinels would turn
    # "widest-spread axis" into "axis with the smaller minimum" and can pick
    # the narrow axis — every tile then overflows its window and the call
    # silently runs the dense fallback each iteration.
    real = ~(
        (q_sg[..., 0] == pad_val) & (q_sg[..., 1] == pad_val)
    )  # (B, M)
    masked = jnp.where(real[..., None], q_sg[..., :2], jnp.nan)
    span = jnp.nanmax(masked, axis=1) - jnp.nanmin(masked, axis=1)  # (B, 2)
    span = jnp.where(jnp.isnan(span), 0.0, span)
    use_x = span[:, 0] >= span[:, 1]
    key = jnp.where(use_x[:, None], q_sg[..., 0], q_sg[..., 1])
    order = jnp.argsort(key, axis=1)
    q_sorted = jnp.take_along_axis(q_full, order[..., None], axis=1)
    key_sorted = jnp.take_along_axis(key, order, axis=1)
    return q_sorted, key_sorted, use_x


def _nn_stripe_kernel(start_blk_ref, nblk_ref, p_ref, q_ref, idx_ref, d2_ref,
                      mval, midx, *, tm: int, nk: int):
    """Stripe tile kernel: map blocks arrive at DYNAMIC offsets via
    scalar-prefetched block indices (the BlockSpec index map reads
    start_blk[b, t]) — no host-side window materialization at all.

    Per-tile ADAPTIVE depth: tile (b, t) only needs ``nblk[b, t]`` blocks to
    cover its key span ±trim; for k ≥ nblk the index map aliases to the last
    needed block (Mosaic elides the copy when the block index repeats) and
    the distance compute is skipped entirely — on real map distributions the
    average needed run is well below the worst tile's, so this saves VPU
    time the fixed-window path spends on every tile."""
    b = pl.program_id(0)
    t = pl.program_id(1)
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _():
        mval[:] = jnp.full_like(mval[:], jnp.inf)
        midx[:] = jnp.zeros_like(midx[:])

    @pl.when(k < nblk_ref[b, t])
    def _():
        p = p_ref[0]  # (tn, 8)
        q = q_ref[0]  # (8, tm)
        dx = p[:, 0:1] - q[0:1, :]
        dy = p[:, 1:2] - q[1:2, :]
        dz = p[:, 2:3] - q[2:3, :]
        d = dx * dx + dy * dy + dz * dz

        base = (start_blk_ref[b, t] + k) * tm  # global column of this block
        local_min = jnp.min(d, axis=1, keepdims=True)
        local_arg = (
            jnp.argmin(d, axis=1).reshape(-1, 1).astype(jnp.int32) + base
        )

        better = local_min < mval[:]
        mval[:] = jnp.where(better, local_min, mval[:])
        midx[:] = jnp.where(better, local_arg, midx[:])

    @pl.when(k == nk - 1)
    def _():
        idx_ref[0, 0, :] = midx[:, 0]
        d2_ref[0, 0, :] = mval[:, 0]


@functools.partial(jax.jit, static_argnames=("tn", "tm", "nk", "interpret"))
def _nn_stripe_pallas(
    p: jax.Array,       # (B, T*tn, 8) point-major, coords on lanes
    QT: jax.Array,      # (B, 8, M) coord-major map, M % tm == 0
    start_blk: jax.Array,  # (B, T) int32 first map-block index per tile
    tn: int, tm: int, nk: int, interpret: bool = False,
    nblk: jax.Array | None = None,  # (B, T) int32 blocks needed per tile
) -> tuple[jax.Array, jax.Array]:
    B, N, _ = p.shape
    T = N // tn
    if nblk is None:
        nblk = jnp.full((B, T), nk, jnp.int32)

    def qmap(b, t, k, sb, nb):
        # Alias beyond-need steps to the last needed block: the repeated
        # index elides the DMA and @pl.when skips the compute. The outer
        # max keeps the index valid for fully-skipped tiles (nb == 0, the
        # per-item refresh gate) — their compute is skipped entirely and
        # the caller discards their outputs.
        return (b, 0, sb[b, t] + jnp.maximum(jnp.minimum(k, nb[b, t] - 1), 0))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(B, T, nk),
        in_specs=[
            pl.BlockSpec((1, tn, 8), lambda b, t, k, sb, nb: (b, t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, tm), qmap, memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, tn), lambda b, t, k, sb, nb: (b, 0, t),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, tn), lambda b, t, k, sb, nb: (b, 0, t),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((tn, 1), p.dtype),
            pltpu.VMEM((tn, 1), jnp.int32),
        ],
    )
    idx, d2 = pl.pallas_call(
        functools.partial(_nn_stripe_kernel, tm=tm, nk=nk),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((B, 1, N), jnp.int32),
            jax.ShapeDtypeStruct((B, 1, N), p.dtype),
        ],
        interpret=interpret,
    )(start_blk, nblk, p, QT)
    return idx[:, 0], d2[:, 0]


def nn_argmin_stripe_presorted(
    p: jax.Array,
    q_sorted: jax.Array,
    key_sorted: jax.Array,
    use_x: jax.Array,
    trim_dist: float,
    window: int | None = None,
    tn: int = 256,
    use_pallas: bool | None = None,
    qt_sorted: jax.Array | None = None,
    refresh: jax.Array | None = None,
) -> tuple[jax.Array, jax.Array]:
    """Stripe NN for scan rows already GROUPED by key (see module comment).

    refresh: optional (B,) bool — per-item association gate (the solver's
    motion-gated refresh). Items with ``refresh == False`` have their ENTIRE
    association skipped in the adaptive kernel (nblk forced to 0: every grid
    step's DMA aliases and the compute is predicated off), and their
    returned idx/d2 are GARBAGE — the caller must keep its cached values
    for them. Non-adaptive fallback paths ignore the gate (full recompute;
    the caller's select still yields the same result).

    Exactness does not require p to be sorted: each tile's window is derived
    from the min/max of that tile's CURRENT keys, so any fixed row grouping
    is correct — a grouping by initial key just keeps the windows tight. This
    lets an ICP solve sort its source once (row order is invariant for the
    GN sums) instead of per iteration; sorting (B, N) every iteration costs
    more than the window saves (measured 2× slower overall on v5e).

    p: (B, N, 3); q_sorted/key_sorted/use_x from :func:`stripe_sort_target`.
    qt_sorted: optional pre-formatted coord-major map (:func:`coord_major`
    of q_sorted, no tail pad) — lets an iterative caller hoist the (B, 8, M)
    relayout out of its loop (re-materializing it per iteration is a
    measurable fraction of the stripe win).
    Returns (idx (B, N) into the SORTED map, d2 (B, N)) in p's row order.
    """
    B, N, _ = p.shape
    M = q_sorted.shape[1]
    if window is None:
        window = max(512, M // 4)
    window = min(window, M)
    tn = min(tn, N)
    n_pad = -N % tn

    dense = functools.partial(nn_argmin, use_pallas=use_pallas)
    if window >= M or N + n_pad <= tn:
        return dense(p, q_sorted[..., :3])
    if n_pad:
        # Pad by REPEATING the last row: its key matches the last tile's, so
        # the window is unaffected. Zero rows would inject key 0 into the
        # last tile — for scans far from the key origin that tile's needed
        # run then exceeds the window and the whole call silently falls back
        # to dense every iteration.
        p = jnp.concatenate(
            [p, jnp.broadcast_to(p[:, -1:], (B, n_pad, 3))], axis=1
        )
    T = (N + n_pad) // tn

    p_key = jnp.where(use_x[:, None], p[..., 0], p[..., 1])
    key_t = p_key.reshape(B, T, tn)
    finite = jnp.isfinite(key_t)
    lo = jnp.min(jnp.where(finite, key_t, jnp.inf), axis=2) - trim_dist
    hi = jnp.max(jnp.where(finite, key_t, -jnp.inf), axis=2) + trim_dist
    find = jax.vmap(functools.partial(jnp.searchsorted, side="left"))
    start_needed = find(key_sorted, lo)  # (B, T)
    end_needed = find(key_sorted, hi)
    max_run = jnp.max(jnp.where(lo <= hi, end_needed - start_needed, 0))

    if use_pallas is None:
        use_pallas = jax.default_backend() == "tpu"

    # Preferred TPU path: the scalar-prefetch kernel with PER-TILE adaptive
    # depth. Each tile fetches only the ceil(run/tm) map blocks its key span
    # ±trim actually needs (block-aligned cover of [start, end) — exactness
    # within trim unchanged); beyond-need grid steps alias the previous
    # block (DMA elided) and skip the distance compute. The fixed-window
    # variant pays the worst tile's window on EVERY tile; on smooth
    # real-world distributions the mean needed run is well under the max, so
    # the VPU (the bottleneck at these shapes) does proportionally less
    # work. Fallback to dense if any tile's need exceeds the static budget.
    if use_pallas and qt_sorted is not None:
        tm_a = next(
            (tt for tt in (1024, 512, 256, 128)
             if M % tt == 0 and window % tt == 0), None)
        if tm_a is not None:
            # +1: a block-ALIGNED cover of a run of length w spans up to
            # ceil(w/tm)+1 blocks (the run can straddle a block boundary on
            # both ends), so the static budget needs one block beyond
            # window/tm — otherwise any max-window tile trips the dense
            # fallback and the whole solve silently runs O(N·M) every
            # search (measured: eval step 567 ms vs 370 ms at bench shapes,
            # where max run 3353 needs 5 blocks of 1024 against a budget
            # of 4).
            nk_a = window // tm_a + 1
            # clamp: a tile whose span lies beyond every key would index
            # block M/tm (searchsorted returns M) — keep it in range.
            start_blk = jnp.clip(
                start_needed // tm_a, 0, M // tm_a - 1).astype(jnp.int32)
            end_blk = ((end_needed + tm_a - 1) // tm_a).astype(jnp.int32)
            nblk = jnp.where(lo <= hi, end_blk - start_blk, 1)
            nblk = jnp.clip(nblk, 1, None).astype(jnp.int32)
            if refresh is not None:
                # Per-item gate: skipped items do no association at all.
                nblk = jnp.where(refresh[:, None], nblk, 0)
            max_nblk = jnp.max(nblk)
            P8 = jnp.pad(p, ((0, 0), (0, 0), (0, 5)))

            def adaptive_path(args):
                P8, qt, q3, sb, nb = args
                return _nn_stripe_pallas(
                    P8, qt, sb, tn=tn, tm=tm_a, nk=nk_a, nblk=nb)

            def dense_path_a(args):
                P8, qt, q3, sb, nb = args
                return dense(P8[..., :3], q3)

            idx, d2 = jax.lax.cond(
                max_nblk <= nk_a, adaptive_path, dense_path_a,
                (P8, qt_sorted, q_sorted[..., :3], start_blk, nblk),
            )
            return idx[:, :N].astype(jnp.int32), d2[:, :N]

    # NOTE: an earlier fixed-depth scalar-prefetch variant (every tile
    # walking the full static window at a dynamic offset) measured
    # association-exact but NO faster than the window-copy path on v5e
    # (380 vs 355 ms on the 50-iter eval solve: the vmapped dynamic_slice
    # window copy was never the bottleneck — the VPU compute is). The
    # adaptive-depth path above is the version that actually cuts compute.

    # Density-adaptive window tiers: the needed run per tile is
    # ≈ M · (tile key span + 2·trim) / map span — usually far below the
    # worst-case `window`. Compile a small ladder of window sizes and
    # lax.switch to the tightest one that provably covers every tile's run
    # this iteration (still exact-within-trim); dense is the final rung.
    tiers = sorted(
        {window} | {w for w in (window // 2, window // 4) if w >= 512}
    )

    def make_stripe_path(win: int):
        def stripe_path(args):
            p, q_sorted, start_needed = args
            start = jnp.clip(start_needed, 0, M - win)
            p_tiles = p.reshape(B * T, tn, 3)
            # Contiguous window per (b, t): a vmapped dynamic_slice is a
            # plain block copy; a take_along_axis gather is ~10× slower.
            if use_pallas and qt_sorted is not None and win % 512 == 0:
                # Slice the pre-formatted coord-major map directly — no
                # per-iteration (B·T, 8, W) transpose.
                slice_w = functools.partial(
                    jax.lax.dynamic_slice_in_dim, slice_size=win, axis=1
                )
                qt_win = jax.vmap(
                    jax.vmap(slice_w, in_axes=(None, 0)), in_axes=(0, 0)
                )(qt_sorted, start)  # (B, T, 8, W)
                local_idx, d2 = _nn_argmin_pallas_fmt(
                    p_tiles, qt_win.reshape(B * T, 8, win),
                    tn=min(256, tn), tm=win,
                )
            else:
                slice_w = functools.partial(
                    jax.lax.dynamic_slice_in_dim, slice_size=win, axis=0
                )
                q_win = jax.vmap(  # over B
                    jax.vmap(slice_w, in_axes=(None, 0)), in_axes=(0, 0)
                )(q_sorted[..., :3], start)  # (B, T, W, 3)
                local_idx, d2 = dense(p_tiles, q_win.reshape(B * T, win, 3))
            idx = local_idx.reshape(B, T, tn) + start[..., None]
            return idx.reshape(B, T * tn), d2.reshape(B, T * tn)

        return stripe_path

    def dense_path(args):
        p, q_sorted, _ = args
        return dense(p, q_sorted[..., :3])

    branches = [make_stripe_path(w) for w in tiers] + [dense_path]
    # Branch index: first tier whose window covers the largest needed run.
    which = sum((max_run > w).astype(jnp.int32) for w in tiers)
    idx, d2 = jax.lax.switch(
        which, branches, (p, q_sorted, start_needed)
    )
    return idx[:, :N].astype(jnp.int32), d2[:, :N]


def nn_argmin_stripe(
    p: jax.Array,
    q_sorted: jax.Array,
    key_sorted: jax.Array,
    use_x: jax.Array,
    trim_dist: float,
    window: int | None = None,
    tn: int = 256,
    use_pallas: bool | None = None,
) -> tuple[jax.Array, jax.Array]:
    """Standalone stripe NN: sorts p by key internally, returns results in
    p's original row order. Prefer :func:`nn_argmin_stripe_presorted` inside
    iterative solvers (sort once, not per call)."""
    p_key = jnp.where(use_x[:, None], p[..., 0], p[..., 1])
    order = jnp.argsort(p_key, axis=1)
    p_s = jnp.take_along_axis(p, order[..., None], axis=1)
    idx_s, d2_s = nn_argmin_stripe_presorted(
        p_s, q_sorted, key_sorted, use_x, trim_dist,
        window=window, tn=tn, use_pallas=use_pallas,
    )
    inv = jnp.argsort(order, axis=1)
    idx = jnp.take_along_axis(idx_s, inv, axis=1)
    d2 = jnp.take_along_axis(d2_s, inv, axis=1)
    return idx, d2
