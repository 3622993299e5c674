"""Training entry point: `python -m mm_masking_tpu.train.train_icp_weights`.

Mirrors `main()` of `/root/reference/mm_masking/train_icp_weights.py:346-587`
(which hard-codes its params dict and never wires its argparse import); here
every config field is CLI-overridable as `--section.field value`, plus
`--synthetic` to run the full loop on generated data when the Boreas pose
graphs aren't mounted.
"""
from __future__ import annotations

import argparse
import dataclasses

from mm_masking_tpu.config import Config


def _apply_overrides(cfg: Config, overrides: list[str]) -> Config:
    sections = {
        "model": cfg.model,
        "data": cfg.data,
        "train": cfg.train,
        "loss": cfg.loss,
    }
    updates: dict[str, dict] = {k: {} for k in sections}
    for item in overrides:
        key, _, val = item.partition("=")
        section, _, field = key.strip("-").partition(".")
        if section not in sections:
            raise SystemExit(f"unknown config section '{section}' in {item}")
        current = getattr(sections[section], field)
        if isinstance(current, bool):
            parsed = val.lower() in ("1", "true", "yes")
        elif isinstance(current, int):
            parsed = int(val)
        elif isinstance(current, float):
            parsed = float(val)
        elif isinstance(current, tuple):
            parsed = tuple(int(x) for x in val.split(","))
        else:
            parsed = val
        updates[section][field] = parsed
    return dataclasses.replace(
        cfg,
        model=dataclasses.replace(cfg.model, **updates["model"]),
        data=dataclasses.replace(cfg.data, **updates["data"]),
        train=dataclasses.replace(cfg.train, **updates["train"]),
        loss=dataclasses.replace(cfg.loss, **updates["loss"]),
    )


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--synthetic", action="store_true",
                    help="train on generated data (no Boreas tree needed)")
    ap.add_argument("--synthetic-frames", type=int, default=64)
    ap.add_argument("--synthetic-fixed", action="store_true",
                    help="pre-generate one fixed synthetic dataset and reuse "
                         "it every epoch (host generation is ~3.5 s per "
                         "batch-16 on this 1-core host — regenerating per "
                         "epoch starves the device; the reference trains on "
                         "a fixed dataset per epoch too)")
    ap.add_argument("--scene", default="scatter", choices=["scatter", "walls"],
                    help="synthetic scene family (walls = multipath-ghost "
                         "learning-demo regime)")
    ap.add_argument("--clutter-frac", type=float, default=0.0,
                    help="fraction of scan returns that are clutter/ghosts")
    ap.add_argument("--scene-noise", type=float, default=0.02,
                    help="scan point noise std (m)")
    ap.add_argument("--set", action="append", default=[], metavar="SEC.FIELD=V",
                    help="config override, e.g. --set train.num_epochs=5")
    args = ap.parse_args(argv)

    cfg = _apply_overrides(Config(), args.set)

    def _autofill_decay_steps(cfg, samples_per_epoch):
        """cosine without explicit lr_decay_steps: decay over the whole run."""
        import dataclasses
        import math

        t = cfg.train
        if t.lr_schedule == "cosine" and t.lr_decay_steps <= 0:
            steps = t.num_epochs * max(
                1, math.ceil(samples_per_epoch / t.batch_size_train))
            print(f"lr_schedule=cosine: lr_decay_steps auto-set to {steps}")
            return dataclasses.replace(
                cfg, train=dataclasses.replace(t, lr_decay_steps=steps))
        return cfg

    if args.synthetic:
        from mm_masking_tpu.data.synthetic import SyntheticSpec, synthetic_batch

        spec = SyntheticSpec(
            n_scan=cfg.data.max_loc_pts, n_map=cfg.data.max_map_pts,
            polar_shape=cfg.model.polar_shape,
            cart_pixel_width=cfg.model.cart_pixel_width,
            res=cfg.model.res, cart_resolution=cfg.model.cart_resolution,
            pos_std=cfg.data.pos_std, rot_std=cfg.data.rot_std,
            network_input_type=cfg.model.network_input_type,
            scene=args.scene, clutter_frac=args.clutter_frac,
            noise=args.scene_noise,
        )
        bt = cfg.train.batch_size_train
        bv = cfg.train.batch_size_test
        n_train = max(1, args.synthetic_frames // bt)
        cfg = _autofill_decay_steps(cfg, n_train * bt)

        if args.synthetic_fixed:
            import jax

            # Cache on host — keeping every batch resident on the device
            # pins ~1 GB of HBM on top of the train step's working set and
            # OOMs the chip; shard_batch re-transfers per step.
            fixed_train = [jax.device_get(synthetic_batch(i, batch=bt, spec=spec))
                           for i in range(n_train)]
            fixed_val = [jax.device_get(
                             synthetic_batch(10_000_000 + i, batch=bv, spec=spec))
                         for i in range(2)]

            def train_batches(epoch):
                return iter(fixed_train)

            def val_batches():
                return iter(fixed_val)
        else:
            def train_batches(epoch):
                return (synthetic_batch(1000 * epoch + i, batch=bt, spec=spec)
                        for i in range(n_train))

            def val_batches():
                return (synthetic_batch(10_000_000 + i, batch=bv, spec=spec)
                        for i in range(2))
    else:
        from mm_masking_tpu.data import ICPWeightDataset, epoch_batches

        train_ds = ICPWeightDataset(list(cfg.train_loc_pairs), cfg, "train")
        val_ds = ICPWeightDataset(list(cfg.val_loc_pairs), cfg, "test")
        print(f"train samples: {len(train_ds)}, val samples: {len(val_ds)}")
        cfg = _autofill_decay_steps(cfg, len(train_ds))

        def train_batches(epoch):
            return epoch_batches(train_ds, cfg.train.batch_size_train, cfg,
                                 shuffle=cfg.train.shuffle, seed=epoch)

        def val_batches():
            return epoch_batches(val_ds, cfg.train.batch_size_test, cfg,
                                 shuffle=False, drop_last=False)

    from mm_masking_tpu.train.trainer import Trainer

    trainer = Trainer(cfg)
    trainer.fit(train_batches, val_batches)


if __name__ == "__main__":
    main()
