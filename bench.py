"""Benchmark: end-to-end scan-pairs/sec on the flagship configuration.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Measures the jitted inference step (UNet mask → weight lookup → 50-iteration
ICP localization) and the jitted training step (10-iter unrolled ICP + 6-term
loss + backprop + optimizer) at reference operating shapes — 640×640
cartesian input, batch 16 train / 32 eval, and the repo's own DataConfig
cloud sizes n_scan=4096 / n_map=16384 (BASELINE.md; SURVEY §3.2 puts real
clouds at O(10k)) — then reports combined scan-pairs/sec/chip plus an
analytic MFU estimate. ``vs_baseline`` compares against the reference
PyTorch pipeline measured on this host at the SAME shapes and batch sizes
(bench_baseline.json, with provenance; the reference repo ships no numbers of
its own — BASELINE.md).

The default run measures the headline (two reference-shape steps) FIRST,
then all five BASELINE.json configs, the trained-checkpoint eval row, the
exact-semantics (refresh-0) eval row, and the batch-128 production point
LAST — with a persistent compile cache the whole sweep fits the budget,
and the official record carries config-level perf (VERDICT r3 #5 / r4 #2).
Set BENCH_LEAN=1 to stop after the headline. BENCH_FULL=1 is accepted as a
no-op alias for the default.

Budget discipline (round-4 lesson: the driver record truncated inside the
b128 production compile because that config changed AFTER the last full
self-run, so its cache entries were cold): phases are ordered
must-have → nice-to-have, every entry lands in RESULT the moment it is
measured, and each expensive phase first checks the remaining wall budget
against a cold-compile estimate — skipping with an explicit marker instead
of letting SIGALRM kill it mid-compile. A wall-clock budget guard
(BENCH_BUDGET_S, default 1320 s) emits the JSON with whatever phases
completed if measurement overruns; the official record must never be an
empty timeout (round-2 lesson: BENCH_r02 rc=124/parsed null).
"""
from __future__ import annotations

import json
import os
import signal
import sys
import time

import jax
import jax.numpy as jnp

from mm_masking_tpu.utils.cache import enable_compile_cache

enable_compile_cache()

# Mutable result skeleton: phases fill it in as they complete so the budget
# guard can always emit a parseable (if partial) record.
RESULT = {
    "metric": "scan_pairs_per_sec_per_chip",
    "value": 0.0,
    "unit": "scan-pairs/s",
    "vs_baseline": 0.0,
    "detail": {"status": "incomplete"},
}
_EMITTED = False


def emit():
    global _EMITTED
    if not _EMITTED:
        _EMITTED = True
        print(json.dumps(RESULT), flush=True)


def _on_budget(signum, frame):  # pragma: no cover - timing dependent
    if RESULT["detail"].get("status") == "ok":
        # Headline complete — only the config sweep was cut short.
        RESULT["detail"]["full_phase"] = "budget_truncated"
    else:
        RESULT["detail"]["status"] = "budget_exceeded_partial"
    emit()
    os._exit(0)


signal.signal(signal.SIGALRM, _on_budget)
_BUDGET_S = int(os.environ.get("BENCH_BUDGET_S", "1320"))
signal.alarm(_BUDGET_S)
_T0 = time.time()


def _time_left() -> float:
    return _BUDGET_S - (time.time() - _T0)

# TPU v5e (v5 lite) peak: 197 TFLOP/s bf16. The geometry/ICP path runs f32
# (precision=highest), so bf16-peak-relative MFU is a conservative bound.
PEAK_BF16 = 197e12


def _force(out):
    """Force completion with a scalar host readback.

    `block_until_ready` on the tunneled `axon` platform returns before remote
    execution finishes; pulling a value derived from the outputs is the only
    honest completion barrier.
    """
    leaf = jax.tree_util.tree_leaves(out)[0]
    return float(jnp.sum(leaf.astype(jnp.float32)))


@jax.jit
def _combine(leaves):
    """One scalar depending on every iteration's output — the completion
    barrier for pipelined timing."""
    return sum(jnp.sum(l.astype(jnp.float32)) for l in leaves)


def time_fn(fn, *args, iters=8, warmup=2):
    """Steady-state step timing: dispatch all iterations back-to-back and
    force completion ONCE through a combining scalar that consumes one leaf
    of every output.

    A per-iteration readback (the previous scheme) adds one full
    host↔device tunnel round trip to every step; that RTT is measured at
    3–30 ms depending on the session — larger than some of the effects
    being measured, and not part of step throughput (the training loop
    reads back once per epoch, `trainer.py::train_epoch`). The device
    executes the queued programs in dispatch order, so the barrier's
    completion implies every step ran; `tunnel_rtt_ms` in the bench detail
    records the per-readback RTT separately."""
    outs = [fn(*args) for _ in range(max(warmup, 1))]
    # Warm the barrier at the exact (iters,)-leaf signature so its compile
    # never lands inside the timed region (repeating the last leaf pads the
    # list to length without extra fn calls).
    leaves = [jax.tree_util.tree_leaves(o)[0] for o in outs]
    leaves = (leaves + [leaves[-1]] * iters)[:iters]
    float(_combine(leaves))
    tic = time.perf_counter()
    outs = [fn(*args) for _ in range(iters)]
    float(_combine([jax.tree_util.tree_leaves(o)[0] for o in outs]))
    return (time.perf_counter() - tic) / iters


def measure_rtt(iters=5):
    """Per-readback host↔device round trip through the tunnel (diagnostic;
    session-dependent, previously silently folded into every step time)."""
    x = jnp.zeros(())
    _force(x + 1.0)
    tic = time.perf_counter()
    for _ in range(iters):
        _force(x + 1.0)
    return (time.perf_counter() - tic) / iters


def unet_fwd_flops(width: int, enc=(8, 16, 32, 64, 128, 256), cin=1) -> float:
    """Analytic UNet forward FLOPs (2·9·Cin·Cout per conv output element),
    mirroring models/unet.py: pool after every encoder block except the
    first; each decoder block applied twice (weight sharing)."""
    total = 0.0
    chans = [cin] + list(enc)
    sizes = []  # spatial size each encoder block runs at
    s = width
    for i in range(len(enc)):
        sizes.append(s)
        total += 2 * 9 * (chans[i] * chans[i + 1] + chans[i + 1] ** 2) * s * s
        if i > 0:
            s //= 2
    dec = list(reversed(enc))
    skip_sizes = list(reversed(sizes))  # decoder stage i runs at skips[i] size
    for i in range(len(dec) - 1):
        s = skip_sizes[i]
        cin_i, cout = dec[i], dec[i + 1]
        # first application on upsampled features, second on the concat —
        # both are conv(2*cout→cout)+conv(cout→cout) since cin_i = 2*cout.
        total += 2 * (2 * 9 * (cin_i * cout + cout**2) * s * s)
    total += 2 * enc[0] * width * width  # final 1×1 conv
    return total


def icp_iter_flops(B: int, N: int, M: int) -> float:
    """One NN-association + GN step: the O(N·M) distance matrix dominates
    (~8 FLOPs per pair: 3-dim matmul + norm terms)."""
    return 8.0 * B * N * M


def _backend_reachable(timeout_s: float = 300.0) -> bool:
    """Probe device init in a subprocess with a hard timeout.

    The axon tunnel can wedge such that ``jax.devices()`` blocks forever
    inside a C call (observed when an earlier client was SIGTERM'd mid-init:
    the pool keeps its grant). A blocked C call never returns control to the
    interpreter, so even the SIGALRM budget guard cannot fire — the only
    robust guard is a separate process the parent can abandon. The driver's
    bench record must always be one parseable JSON line, never a hang."""
    import subprocess

    try:
        r = subprocess.run(
            [sys.executable, "-c", "import jax; print(len(jax.devices()))"],
            timeout=timeout_s, capture_output=True,
        )
        return r.returncode == 0
    except subprocess.TimeoutExpired:
        return False


def main():
    from mm_masking_tpu.config import Config, ModelConfig, TrainConfig
    from mm_masking_tpu.data.synthetic import SyntheticSpec, synthetic_batch
    from mm_masking_tpu.parallel import make_mesh, shard_batch
    from mm_masking_tpu.train import Trainer

    if not os.environ.get("BENCH_SKIP_PROBE") and not _backend_reachable():
        RESULT["detail"]["status"] = "backend_unreachable"
        RESULT["detail"]["note"] = (
            "jax device init did not complete within the probe timeout — "
            "tunnel/backend wedged; no measurement possible this run"
        )
        emit()
        return

    n_scan, n_map = 4096, 16384  # DataConfig defaults = reference cloud scale
    spec = SyntheticSpec(n_scan=n_scan, n_map=n_map)
    batch_train = 16
    batch_eval = 32
    # Production config: bf16 UNet activations (geometry stays f32 highest).
    # Measured bf16-vs-f32 deviation at these shapes: max 6.3e-6 m / 2.7e-7
    # sin-rot — five orders of magnitude inside the 1 cm / 0.05° parity budget.
    cfg = Config(
        model=ModelConfig(dropout=0.05, max_iter=10, inference_max_iter=50,
                          nn_refresh_dist=0.05,  # speed knob: bench opts in
                          # Pallas NHCW conv lowering: same params/numerics,
                          # UNet fwd+bwd 229->141 ms (docs/BENCH_DETAIL.md)
                          conv_impl="pallas_nhcw",
                          dtype="bfloat16"),
        train=TrainConfig(batch_size_train=batch_train,
                          batch_size_test=batch_eval),
    )
    trainer = Trainer(cfg, mesh=make_mesh())
    state = trainer.init_state()

    train_batch = shard_batch(
        synthetic_batch(0, batch=batch_train, spec=spec), trainer.mesh
    )
    eval_batch = shard_batch(
        synthetic_batch(1, batch=batch_eval, spec=spec), trainer.mesh
    )

    def train_step(state, batch):
        return trainer._train_step(state, batch, mask_losses_active=True)

    def eval_step(state, batch):
        return trainer._eval_step(state, batch, binary=False)

    detail = RESULT["detail"]
    detail["device"] = str(jax.devices()[0])
    # Session tunnel RTT: timing is pipelined (one completion barrier per
    # time_fn call), so this no longer inflates step times; recorded for
    # cross-session comparability (r1-r3 numbers include ~1 RTT per step).
    detail["tunnel_rtt_ms"] = round(measure_rtt() * 1e3, 2)
    print(f"[bench] tunnel rtt {detail['tunnel_rtt_ms']} ms",
          file=sys.stderr, flush=True)
    detail["shapes"] = {
        "cart": 640, "polar": [400, 3360],
        "n_scan": n_scan, "n_map": n_map,
        "batch_train": batch_train, "batch_eval": batch_eval,
    }

    t_train = time_fn(lambda: train_step(state, train_batch), iters=6)
    train_sps = batch_train / t_train
    detail["train_scan_pairs_per_sec"] = round(train_sps, 3)
    detail["train_step_ms"] = round(t_train * 1e3, 2)
    print(f"[bench] train step {t_train*1e3:.1f} ms", file=sys.stderr, flush=True)

    t_eval = time_fn(lambda: eval_step(state, eval_batch), iters=6)
    eval_sps = batch_eval / t_eval
    detail["eval_scan_pairs_per_sec"] = round(eval_sps, 3)
    detail["eval_step_ms"] = round(t_eval * 1e3, 2)
    print(f"[bench] eval step {t_eval*1e3:.1f} ms", file=sys.stderr, flush=True)

    # Combined metric: harmonic-style aggregate over the two phases (one train
    # scan-pair + one eval scan-pair processed back to back).
    combined = 2.0 / (1.0 / train_sps + 1.0 / eval_sps)
    RESULT["value"] = round(combined, 3)

    # Analytic MFU: fwd+bwd ≈ 3× fwd for the UNet; unrolled-ICP backward ≈ 2×
    # its forward. Eval runs the while-loop solver — tolerance-terminated, so
    # 50 iterations is the upper bound (reported MFU is a lower bound there).
    unet_f = unet_fwd_flops(cfg.model.cart_pixel_width)
    train_flops = (
        3 * unet_f * batch_train
        + 3 * 10 * icp_iter_flops(batch_train, n_scan, n_map)
    )
    eval_flops = (
        unet_f * batch_eval + 50 * icp_iter_flops(batch_eval, n_scan, n_map)
    )
    detail["mfu_train"] = round(train_flops / t_train / PEAK_BF16, 4)
    detail["mfu_eval"] = round(eval_flops / t_eval / PEAK_BF16, 4)
    # Honest normalization: this chip's demonstrated dense-op ceiling is
    # ~3 TF/s-eff (docs/BENCH_DETAIL.md probe sweep), far under nominal bf16
    # peak, so pairs/s per demonstrated-TF/s is the comparable figure.
    CEIL_TFS = 3.0
    detail["pairs_per_sec_per_demonstrated_tfs"] = round(combined / CEIL_TFS, 3)
    detail["comparison_note"] = (
        "vs_baseline divides by a 1-core torch-CPU stand-in measured on this "
        "host at identical shapes (bench_baseline.json, provenance inside) — "
        "the reference repo publishes no numbers and its GPU cannot run here; "
        "treat vs_baseline as a lower-bound sanity anchor, not a GPU claim."
    )

    baseline_path = os.path.join(os.path.dirname(__file__), "bench_baseline.json")
    if os.path.exists(baseline_path):
        ref = json.load(open(baseline_path))
        ref_combined = ref.get("combined_scan_pairs_per_sec")
        if ref_combined:
            RESULT["vs_baseline"] = round(combined / ref_combined, 3)

    detail["status"] = "ok"
    if os.environ.get("BENCH_LEAN"):
        # Headline-only mode: print now, exit clean.
        emit()
        return
    detail["full_phase"] = "incomplete"

    # --- the five BASELINE.json configs (must-have: VERDICT r3 #5 / r4 #2) --
    from mm_masking_tpu.evaluation import baselines as bl

    detail["configs"] = {}
    # 1: unweighted pt2pl ICP on scan pairs.
    t = time_fn(lambda: bl.config1_unweighted_pt2pl(cfg, eval_batch),
                iters=4)
    detail["configs"]["1_unweighted_pt2pl"] = {
        "ms": round(t * 1e3, 2), "pairs_per_sec": round(batch_eval / t, 2)}
    # 2: CACFAR extraction + constant-weight ICP (raw polar input).
    polar_spec = SyntheticSpec(n_scan=n_scan, n_map=n_map,
                               network_input_type="polar")
    polar_batch = shard_batch(
        synthetic_batch(2, batch=batch_eval, spec=polar_spec), trainer.mesh
    )
    t = time_fn(lambda: bl.config2_cacfar_constant_icp(cfg, polar_batch),
                iters=4)
    detail["configs"]["2_cacfar_constant_icp"] = {
        "ms": round(t * 1e3, 2), "pairs_per_sec": round(batch_eval / t, 2)}
    del polar_batch
    # 3: learned mask + weighted ICP end to end (== eval step sans stats).
    t = time_fn(
        lambda: bl.config3_learned_mask_icp(
            trainer.policy, state.variables, eval_batch),
        iters=4)
    detail["configs"]["3_learned_mask_icp"] = {
        "ms": round(t * 1e3, 2), "pairs_per_sec": round(batch_eval / t, 2)}
    # 4: batched backprop-through-ICP training step (== headline train).
    detail["configs"]["4_train_step"] = {
        "ms": round(t_train * 1e3, 2),
        "pairs_per_sec": round(train_sps, 2)}
    # 5: multi-sequence localization: batched jitted localize_frame over
    # 64 frames (detector → extraction → two-phase ICP).
    from mm_masking_tpu.localization import (
        LocalizationConfig,
        localize_sequence,
    )

    loc = synthetic_batch(3, batch=64, spec=polar_spec)
    frames = {
        "fft": loc["loc_data"]["fft_data"],
        "azimuths": loc["loc_data"]["azimuths"],
        "az_times": loc["loc_data"]["az_times"],
    }
    map_pc = loc["map_data"]["pc"][:1]
    loc_cfg = LocalizationConfig(max_points=n_scan, nn_refresh_dist=0.05)
    t = time_fn(
        lambda: localize_sequence(frames, map_pc, cfg=loc_cfg,
                                  batch_size=batch_eval),
        iters=2,
    )
    detail["configs"]["5_multi_sequence_loc"] = {
        "ms_per_64_frames": round(t * 1e3, 2),
        "frames_per_sec": round(64 / t, 2)}
    del loc, frames, map_pc
    detail["full_phase"] = "ok"  # configs 1-5 are in; the rest is bonus.

    # --- trained-checkpoint eval row (VERDICT r4 #8): the official eval
    # regime with CONVERGED weights, not random-init jitter. Same compiled
    # program (weights are data), so this row is nearly free.
    ckpt_dir = os.path.join(os.path.dirname(__file__), "results",
                            "checkpoints")
    tstate = None
    for run in ("e2e_product_r5", "e2e_product_r4"):
        run_dir = os.path.join(ckpt_dir, run)
        if not os.path.isdir(os.path.join(run_dir, "best_policy")):
            continue
        try:
            from mm_masking_tpu.train.checkpoint import load_policy_variables

            tvars = load_policy_variables(run_dir)
            tstate = state._replace(variables=tvars)
            t = time_fn(lambda: eval_step(tstate, eval_batch), iters=4)
            detail["eval_trained_checkpoint"] = {
                "checkpoint": run, "ms": round(t * 1e3, 2),
                "pairs_per_sec": round(batch_eval / t, 2),
                "note": "eval step with the trained product-run weights — "
                        "converged-mask solve behavior (few refreshes, "
                        "early tolerance exits), the regime a deployed "
                        "user sees; random-init headline is the "
                        "conservative bound"}
        except Exception as e:  # arch mismatch etc. — report, don't die
            detail["eval_trained_checkpoint"] = {"checkpoint": run,
                                                 "error": repr(e)}
        break

    # --- exact-semantics eval row (VERDICT r4 #3): nn_refresh_dist=0 —
    # associate every iteration, dICP reference semantics. Reported
    # alongside the gated headline so both regimes are in the official
    # record. New program → cold-compile risk: budget-gate it.
    if _time_left() > 240:
        exact_cfg = Config(
            model=ModelConfig(dropout=0.05, max_iter=10,
                              inference_max_iter=50,
                              nn_refresh_dist=0.0,
                              conv_impl="pallas_nhcw", dtype="bfloat16"),
            train=TrainConfig(batch_size_train=batch_train,
                              batch_size_test=batch_eval),
        )
        exact_trainer = Trainer(exact_cfg, mesh=trainer.mesh,
                                logger=trainer.logger)
        t = time_fn(
            lambda: exact_trainer._eval_step(state, eval_batch, binary=False),
            iters=4)
        detail["eval_exact_refresh0"] = {
            "ms": round(t * 1e3, 2),
            "pairs_per_sec": round(batch_eval / t, 2),
            "note": "nn_refresh_dist=0 (re-associate every iteration = "
                    "reference dICP semantics, exact); the headline eval "
                    "uses the 0.05 motion-gated refresh (bounded-deviation "
                    "approximation, docs/BENCH_DETAIL.md). Random-init "
                    "weights = jittery solves that never hit tolerance — "
                    "the conservative bound for exact semantics"}
        if tstate is not None:
            # Exact semantics + trained weights: converged solves hit the
            # per-item ‖δ‖<1e-5 freeze (dICP's own stop), so stopped items'
            # association tiles are skipped EXACTLY — the representative
            # deployed-eval cost of the reference-semantics path
            # (VERDICT r4 #3). Same compiled program as the row above.
            t = time_fn(
                lambda: exact_trainer._eval_step(tstate, eval_batch,
                                                 binary=False),
                iters=4)
            detail["eval_trained_exact_refresh0"] = {
                "ms": round(t * 1e3, 2),
                "pairs_per_sec": round(batch_eval / t, 2),
                "note": "exact refresh-0 semantics with the trained "
                        "product weights — converged items freeze at "
                        "tolerance and stop paying the O(N*M) search"}
        del exact_trainer
    else:
        detail["eval_exact_refresh0"] = {"status": "skipped_budget"}

    # --- large-batch production point (continuity row, most expensive
    # compile → last + budget-gated). The headline keeps the reference's
    # batch sizes (16/32); this shows the SAME model at b128 (remat'd conv
    # blocks — b128 640² activations need it for HBM). With the pallas_nhcw
    # layout ceiling gone, b16/b32 is throughput-optimal; kept for
    # round-to-round continuity (docs/BENCH_DETAIL.md).
    if _time_left() > 420:
        prod_cfg = Config(
            model=ModelConfig(dropout=0.05, max_iter=10,
                              inference_max_iter=50,
                              nn_refresh_dist=0.05,  # speed knob: bench opts in
                              conv_impl="pallas_nhcw",
                              dtype="bfloat16", remat=True),
            train=TrainConfig(batch_size_train=128, batch_size_test=64),
        )
        prod_trainer = Trainer(prod_cfg, mesh=trainer.mesh,
                               logger=trainer.logger)
        prod_state = prod_trainer.init_state()
        tb128 = shard_batch(synthetic_batch(2, batch=128, spec=spec),
                            trainer.mesh)
        eb64 = shard_batch(synthetic_batch(3, batch=64, spec=spec),
                           trainer.mesh)
        t_train_p = time_fn(
            lambda: prod_trainer._train_step(prod_state, tb128,
                                             mask_losses_active=True),
            iters=4,
        )
        t_eval_p = time_fn(
            lambda: prod_trainer._eval_step(prod_state, eb64, binary=False),
            iters=4,
        )
        prod_train_sps = 128 / t_train_p
        prod_eval_sps = 64 / t_eval_p
        detail["production_point"] = {
            "train_b128_remat_pairs_per_sec": round(prod_train_sps, 2),
            "eval_b64_pairs_per_sec": round(prod_eval_sps, 2),
            "combined_pairs_per_sec": round(
                2.0 / (1.0 / prod_train_sps + 1.0 / prod_eval_sps), 2),
            "note": "same model at large batch (b128 needs remat for HBM); "
                    "with the pallas_nhcw UNet the b16/b32 headline is the "
                    "throughput-optimal point — this row is kept for "
                    "continuity",
        }
        del prod_trainer, prod_state, tb128, eb64
    else:
        detail["production_point"] = {"status": "skipped_budget"}

    emit()


if __name__ == "__main__":
    main()
