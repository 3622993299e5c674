"""Batch assembly + on-device preprocessing.

Replaces the reference's `torch.utils.data.DataLoader(num_workers=4)`
(`/root/reference/mm_masking/train_icp_weights.py:454-455`) with host-side
numpy collation and a single jitted, batched polar→cartesian warp on device —
the per-item cv2/grid_sample work the reference does in 4 worker processes
becomes one fused XLA program over the whole batch.
"""
from __future__ import annotations

import functools
from typing import Iterator

import jax
import jax.numpy as jnp
import numpy as np

from mm_masking_tpu.config import Config
from mm_masking_tpu.ops import radar_polar_to_cartesian


def _collate(items: list[dict]) -> dict:
    """Stack a list of sample dicts into one batch dict of arrays."""
    return jax.tree_util.tree_map(lambda *v: np.stack(v, axis=0), *items)


@functools.partial(jax.jit, static_argnames=("res", "cart_resolution",
                                             "cart_pixel_width"))
def _warp_batch(fft, cfar, azimuths, res, cart_resolution, cart_pixel_width):
    fft_c = radar_polar_to_cartesian(fft, azimuths, res, cart_resolution,
                                     cart_pixel_width)
    cfar_c = radar_polar_to_cartesian(cfar, azimuths, res, cart_resolution,
                                      cart_pixel_width)
    return fft_c, cfar_c


def preprocess_batch(batch: dict, config: Config) -> dict:
    """Device-side network-input preparation (polar→cartesian when configured)."""
    m = config.model
    if m.network_input_type == "cartesian":
        loc = dict(batch["loc_data"])
        fft_c, cfar_c = _warp_batch(
            jnp.asarray(loc["fft_data"]),
            jnp.asarray(loc["fft_cfar"]),
            jnp.asarray(loc["azimuths"]),
            m.res, m.cart_resolution, m.cart_pixel_width,
        )
        loc["fft_data"] = fft_c
        loc["fft_cfar"] = cfar_c
        batch = dict(batch)
        batch["loc_data"] = loc
    return batch


def epoch_batches(
    dataset,
    batch_size: int,
    config: Config,
    *,
    shuffle: bool = True,
    drop_last: bool = True,
    seed: int = 0,
) -> Iterator[dict]:
    """Yield preprocessed batches for one epoch."""
    n = len(dataset)
    order = np.arange(n)
    if shuffle:
        np.random.default_rng(seed).shuffle(order)
    end = n - (n % batch_size) if drop_last and n >= batch_size else n
    for start in range(0, end, batch_size):
        idx = order[start : start + batch_size]
        items = [dataset[int(i)] for i in idx]
        batch = _collate(items)
        yield preprocess_batch(batch, config)
