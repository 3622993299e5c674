"""Typed configuration for the whole framework.

One dataclass tree replacing the reference's in-code ``params`` dict
(`/root/reference/mm_masking/train_icp_weights.py:354-410`), its loss-weight
dict (`:414-417`), and the hard-coded sequence-pair lists (`:420-432`). Field
names mirror the reference's param keys so a user of the reference can map
their configuration 1:1.
"""
from __future__ import annotations

import dataclasses
from typing import Sequence

import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class LossWeights:
    """Multi-term loss weights (reference `train_icp_weights.py:414-417`)."""

    icp_rot: float = 1.0
    icp_trans: float = 1.0
    fft: float = 0.0
    mask_pts: float = 1.0
    cfar: float = 0.0
    num_pts: float = 0.0
    # Hinge threshold for the num_pts term, as a fraction of the real point
    # count. 0 = the reference's always-on linear penalty
    # (`train_icp_weights.py:230-231`). > 0 = the penalty only activates when
    # the differentiable point count drops below `num_pts_floor ·
    # mean_all_pts` — an anti-collapse floor that is exactly zero (no
    # gradient, no accuracy cost) at a healthy operating point. Rationale:
    # the pure-ICP loss is scale-invariant in the weights (GN normal
    # equations scale out), so nothing opposes uniform mask shrinkage until
    # the solve goes singular; the hinge restores a finite opposing gradient
    # BEFORE that regime (see docs/STATUS.md round-3 collapse diagnosis).
    num_pts_floor: float = 0.0


@dataclasses.dataclass(frozen=True)
class ModelConfig:
    """UNet + ICP policy knobs (reference `icp_weight_policy.py:24-102`)."""

    icp_type: str = "pt2pt"  # "pt2pt" | "pt2pl"
    fft_input: bool = True
    cfar_input: bool = False
    range_input: bool = False
    network_input_type: str = "cartesian"  # "cartesian" | "polar"
    network_output_type: str = "cartesian"
    leaky: bool = False
    dropout: float = 0.05
    batch_norm: bool = False
    init_weights: bool = True  # Xavier-uniform convs, zero bias
    log_transform: bool = False
    normalize: str = "minmax"  # "minmax" | "standardize" | "none"
    norm_weights: bool = True  # scale mask by per-image max
    binary_inference: bool = False
    a_thresh: float = 1.0
    b_thresh: float = 0.09
    max_iter: int = 10  # differentiable ICP iterations (training)
    inference_max_iter: int = 50
    # Motion-gated NN refresh for the 50-iter inference solver (m). The
    # association is recomputed whenever the pose has moved more than this
    # since the last search (rotation at an 80 m lever arm), so
    # tolerance-limited late iterations skip the O(N·M) search entirely.
    # 0 (default) = search every iteration — reference semantics (dICP
    # associates every iteration, `icp_weight_policy.py:277-288`). 0.05 is
    # the measured speed knob used by bench/profile paths; pose deviation vs
    # always-search is bounded by tests at ≤1 mm on converging scenes.
    nn_refresh_dist: float = 0.0
    # 'unroll' backprops through every GN iteration (reference fidelity);
    # 'implicit' runs the fast while-loop solver and applies the implicit
    # function theorem at convergence (O(1)-memory backward, approximate
    # gradients — direction-verified vs unroll in tests).
    icp_diff_mode: str = "unroll"
    gt_eye: bool = True
    res: float = 0.0596  # polar range resolution (m/bin)
    cart_resolution: float = 0.2384
    cart_pixel_width: int = 640
    polar_shape: tuple[int, int] = (400, 3360)
    enc_channels: tuple[int, ...] = (8, 16, 32, 64, 128, 256)
    dtype: str = "float32"  # activations dtype ("bfloat16" for MXU-friendly)
    # Execute low-channel conv stages in the space-to-depth layout (exact
    # numerics, MXU-dense; see models/s2d.py). Layout choice only — safe to
    # toggle on existing checkpoints. Measured SLOWER on v5e (docs/BENCH_DETAIL.md).
    s2d_convs: bool = False
    # Conv lowering: "xla" (lax.conv), "tapsum" (nine shifted matmuls), or
    # "pallas_nhcw" (whole UNet in (B,H,C,W) layout with Pallas MXU conv
    # kernels + custom VJP — avoids XLA's 8-16× low-channel NHWC layout
    # padding; ops/pallas/conv2d.py, docs/BENCH_DETAIL.md).
    # Checkpoint-compatible lowering choice; tapsum measured slower in-net.
    conv_impl: str = "xla"
    # Rematerialize UNet conv blocks on the backward pass (jax.checkpoint):
    # required to fit train batches ≥ 64 in HBM, where XLA's 8× low-channel
    # layout padding amortizes (docs/BENCH_DETAIL.md). Numerics exact.
    remat: bool = False
    # Rematerialize each unrolled training-ICP iteration on the backward
    # pass (ICPConfig.remat_iters): numerics exact, trades the stored
    # per-iteration residuals for recompute. Measured knob, off by default.
    icp_remat: bool = False
    # Trust-region clamp on each GN update's translation (m), train AND
    # inference solvers (ICPConfig.max_step_m). 0 = off (reference
    # semantics); > 0 prevents near-dead systems from death-spiraling tens
    # of meters on hard frames.
    icp_max_step_m: float = 0.0
    # Raw ICPConfig field overrides applied to BOTH the train and inference
    # solver configs, as ("field=value", ...) strings — the escape hatch the
    # dICP assumption-sensitivity study (docs/STATUS.md r5) uses to flip
    # reconstruction free choices (robust_on, stop_metric,
    # planar_retraction, damping_rel, loss_name, ...) through the full
    # policy chain without widening ModelConfig per knob. Values are coerced
    # to the ICPConfig field's default type. Empty = reference semantics.
    icp_overrides: tuple = ()

    @property
    def in_channels(self) -> int:
        return int(self.fft_input) + int(self.cfar_input) + int(self.range_input)

    @property
    def jax_dtype(self):
        return jnp.bfloat16 if self.dtype == "bfloat16" else jnp.float32


@dataclasses.dataclass(frozen=True)
class DataConfig:
    """Dataset construction knobs (reference `icp_weight_dataset.py:29-65`)."""

    map_sensor: str = "lidar"
    loc_sensor: str = "radar"
    num_train: int = -1  # -1 = all
    num_val: int = -1
    augment: bool = True
    random: bool = False  # False -> seed 99, reference determinism switch
    use_gt: bool = False
    pos_std: float = 2.0
    rot_std: float = 0.6
    gt_eye: bool = True
    float_type: str = "float32"
    # Static pad sizes (compile-time constants; reference derives them from a
    # metadata.csv scan of the pose graphs).
    max_loc_pts: int = 4096
    max_map_pts: int = 16384
    elevation_threshold: float = 0.05
    z_normal_threshold: float = 0.9
    data_dir: str = "data"


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    """Trainer knobs (reference `train_icp_weights.py:354-410`)."""

    batch_size_train: int = 16
    batch_size_test: int = 32
    shuffle: bool = True
    num_epochs: int = 30
    learning_rate: float = 1e-4
    optimizer: str = "adam"  # "adam" | "sgd"
    # LR schedule. "constant" = reference semantics (fixed Adam,
    # train_icp_weights.py:419). "cosine" decays to 0 over lr_decay_steps
    # optimizer STEPS (set it to num_epochs * ceil(samples / batch); the
    # training CLI and e2e driver compute it for you) with lr_warmup_steps
    # of linear warmup — an opt-in stabilizer for long runs whose val error
    # regresses late under a fixed lr.
    lr_schedule: str = "constant"  # "constant" | "cosine"
    lr_decay_steps: int = 0
    lr_warmup_steps: int = 0
    clip_value: float = 0.0
    icp_loss_only_iter: int = -1
    seed: int = 99
    checkpoint_dir: str = "results/checkpoints"
    checkpoint_every: int = 1
    # Mesh: data-parallel axis size; -1 = all local devices.
    num_devices: int = -1
    mesh_axis: str = "data"


@dataclasses.dataclass(frozen=True)
class Config:
    model: ModelConfig = ModelConfig()
    data: DataConfig = DataConfig()
    train: TrainConfig = TrainConfig()
    loss: LossWeights = LossWeights()
    train_loc_pairs: Sequence[tuple[str, str]] = (
        ("boreas-2020-11-26-13-58", "boreas-2020-12-01-13-26"),
        ("boreas-2020-11-26-13-58", "boreas-2020-12-18-13-44"),
        ("boreas-2020-11-26-13-58", "boreas-2021-02-02-14-07"),
        ("boreas-2020-11-26-13-58", "boreas-2021-03-02-13-38"),
        ("boreas-2020-11-26-13-58", "boreas-2021-03-30-14-23"),
        ("boreas-2020-11-26-13-58", "boreas-2021-04-20-14-11"),
        ("boreas-2020-11-26-13-58", "boreas-2021-04-08-12-44"),
        ("boreas-2020-11-26-13-58", "boreas-2021-04-29-15-55"),
        ("boreas-2020-11-26-13-58", "boreas-2021-05-06-13-19"),
        ("boreas-2020-11-26-13-58", "boreas-2021-06-17-17-52"),
        ("boreas-2020-11-26-13-58", "boreas-2021-08-05-13-34"),
        ("boreas-2020-11-26-13-58", "boreas-2021-09-07-09-35"),
    )
    val_loc_pairs: Sequence[tuple[str, str]] = (
        ("boreas-2020-11-26-13-58", "boreas-2021-04-13-14-49"),
    )

    @property
    def use_icp_4_train(self) -> bool:
        # Reference `icp_weight_policy.py:48-51`.
        return self.loss.icp_rot > 0.0 and self.loss.icp_trans > 0.0

    @staticmethod
    def from_dict(d: dict) -> "Config":
        """Inverse of ``dataclasses.asdict`` (the form ``Trainer.fit`` writes
        to ``<checkpoint_dir>/config.json``): rebuild the typed tree so a
        trained run's exact configuration can be reloaded — e.g. by the
        localization CLI's ``--checkpoint`` mask-in-the-loop mode."""

        def tup(x):
            return tuple(x) if isinstance(x, list) else x

        model = {k: tup(v) for k, v in d.get("model", {}).items()}
        pairs = lambda ps: tuple(tuple(p) for p in ps)  # noqa: E731
        return Config(
            model=ModelConfig(**model),
            data=DataConfig(**d.get("data", {})),
            train=TrainConfig(**d.get("train", {})),
            loss=LossWeights(**d.get("loss", {})),
            train_loc_pairs=pairs(d.get("train_loc_pairs", ())),
            val_loc_pairs=pairs(d.get("val_loc_pairs", ())),
        )

    @staticmethod
    def from_reference_params(params: dict, **extra) -> "Config":
        """Build a Config from the reference's ``params`` dict
        (`train_icp_weights.py:354-410`) — 1:1 key mapping for users migrating
        from the PyTorch pipeline. Unknown keys are ignored; ``extra`` kwargs
        override whole sections.
        """
        g = params.get
        normalize = g("normalize", ["minmax"])
        if isinstance(normalize, (list, tuple)):
            normalize = normalize[0] if normalize else "none"
        model = ModelConfig(
            icp_type=g("icp_type", "pt2pt"),
            fft_input=g("fft_input", True),
            cfar_input=g("cfar_input", False),
            range_input=g("range_input", False),
            network_input_type=g("network_input_type", "cartesian"),
            network_output_type=g("network_output_type", "cartesian"),
            leaky=g("leaky", False),
            dropout=g("dropout", 0.05),
            batch_norm=g("batch_norm", False),
            init_weights=g("init_weights", True),
            log_transform=g("log_transform", False),
            normalize=normalize,
            norm_weights=g("norm_weights", True),
            binary_inference=g("binary_inference", False),
            a_thresh=g("a_thresh", 1.0),
            b_thresh=g("b_thresh", 0.09),
            max_iter=g("max_iter", 10),
            gt_eye=g("gt_eye", True),
        )
        data = DataConfig(
            map_sensor=g("map_sensor", "lidar"),
            loc_sensor=g("loc_sensor", "radar"),
            num_train=g("num_train", -1),
            num_val=g("num_val", -1),
            augment=g("augment", True),
            random=g("random", False),
            use_gt=g("use_gt", False),
            pos_std=g("pos_std", 2.0),
            rot_std=g("rot_std", 0.6),
            gt_eye=g("gt_eye", True),
        )
        train = TrainConfig(
            batch_size_train=g("batch_size_train", 16),
            batch_size_test=g("batch_size_test", 32),
            shuffle=g("shuffle", True),
            num_epochs=g("num_epochs", 30),
            learning_rate=g("learning_rate", 1e-4),
            optimizer=g("optimizer", "adam"),
            clip_value=g("clip_value", 0.0),
            icp_loss_only_iter=g("icp_loss_only_iter", -1),
        )
        loss = LossWeights(
            icp_rot=g("loss_icp_rot_weight", 1.0),
            icp_trans=g("loss_icp_trans_weight", 1.0),
            fft=g("loss_fft_mask_weight", 0.0),
            mask_pts=g("loss_map_pts_mask_weight", 1.0),
            cfar=g("loss_cfar_mask_weight", 0.0),
            num_pts=g("num_pts_weight", 0.0),
        )
        kw = dict(model=model, data=data, train=train, loss=loss)
        kw.update(extra)
        return Config(**kw)
