"""Batch assembly + on-device preprocessing.

Replaces the reference's `torch.utils.data.DataLoader(num_workers=4)`
(`/root/reference/mm_masking/train_icp_weights.py:454-455`) with host-side
numpy collation and a single jitted, batched polar→cartesian warp on device —
the per-item cv2/grid_sample work the reference does in 4 worker processes
becomes one fused XLA program over the whole batch.

The polar image planes travel uint8 from disk to device (fft raw power, cfar
{0, 1} — exactly the reference's on-disk formats, radar PNG and CFAR PNG) and
are normalized to the model's f32 contract here, on device: at reference scale
that is 43 MB/batch over the host↔device link instead of 172, and the host
stacks a quarter of the bytes.
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


def _norm_images(fft: jax.Array, cfar: jax.Array):
    """uint8-on-the-wire → the model's f32 contract, on device.

    The dataset ships the polar planes as the on-disk uint8 (fft raw power,
    cfar {0, 1}); u8/255 in f32 here matches the reference's numpy f32 divide
    (`radar_utils.py:26`) to within one f32 ulp (XLA lowers the constant
    divide to a reciprocal multiply — measured max deviation 6e-8, far below
    the image's own 1/255 quantization). Already-f32 inputs (synthetic
    batches, legacy callers) pass through unchanged — dtype is static under
    jit, so each variant compiles its own trivial program.
    """
    if fft.dtype == jnp.uint8:
        fft = fft.astype(jnp.float32) / 255.0
    if cfar.dtype == jnp.uint8:
        cfar = cfar.astype(jnp.float32)
    return fft, cfar


@functools.partial(jax.jit, static_argnames=("res", "cart_resolution",
                                             "cart_pixel_width"))
def _warp_batch(fft, cfar, azimuths, res, cart_resolution, cart_pixel_width):
    fft, cfar = _norm_images(fft, cfar)
    fft_c = radar_polar_to_cartesian(fft, azimuths, res, cart_resolution,
                                     cart_pixel_width)
    cfar_c = radar_polar_to_cartesian(cfar, azimuths, res, cart_resolution,
                                      cart_pixel_width)
    return fft_c, cfar_c


_norm_polar = jax.jit(_norm_images)


def preprocess_batch(batch: dict, config: Config) -> dict:
    """Device-side network-input preparation: u8→f32 normalization, plus the
    polar→cartesian warp when configured. Downstream (trainer/policy/loss)
    always sees f32-normalized images regardless of input type."""
    m = config.model
    loc = dict(batch["loc_data"])
    if m.network_input_type == "cartesian":
        fft_c, cfar_c = _warp_batch(
            jnp.asarray(loc["fft_data"]),
            jnp.asarray(loc["fft_cfar"]),
            jnp.asarray(loc["azimuths"]),
            m.res, m.cart_resolution, m.cart_pixel_width,
        )
        loc["fft_data"] = fft_c
        loc["fft_cfar"] = cfar_c
    else:
        loc["fft_data"], loc["fft_cfar"] = _norm_polar(
            jnp.asarray(loc["fft_data"]), jnp.asarray(loc["fft_cfar"])
        )
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
    prefetch: int = 1,
) -> Iterator[dict]:
    """Yield preprocessed batches for one epoch.

    With ``prefetch > 0`` (default 1) a single worker thread loads, collates
    and stages batch k+1 while the caller's device step k runs — the overlap
    the reference buys with ``DataLoader(num_workers=4)``. Exactly ONE worker,
    so item order and the dataset's augmentation-RNG consumption sequence are
    identical to the inline path (determinism-tested). ``prefetch=0`` runs
    fully inline.
    """
    n = len(dataset)
    order = np.arange(n)
    if shuffle:
        np.random.default_rng(seed).shuffle(order)
    end = n - (n % batch_size) if drop_last and n >= batch_size else n

    def produce() -> Iterator[dict]:
        for start in range(0, end, batch_size):
            idx = order[start : start + batch_size]
            items = [dataset[int(i)] for i in idx]
            batch = _collate(items)
            yield preprocess_batch(batch, config)

    if prefetch <= 0:
        yield from produce()
        return

    import queue
    import threading

    q: queue.Queue = queue.Queue(maxsize=prefetch)
    stop = threading.Event()
    _END = object()

    def worker():
        it = produce()
        while not stop.is_set():
            try:
                item = next(it)
            except StopIteration:
                item = _END
            except BaseException as e:  # surface errors to the consumer
                item = e
            while not stop.is_set():
                try:
                    q.put(item, timeout=0.1)
                    break
                except queue.Full:
                    continue
            if item is _END or isinstance(item, BaseException):
                return

    t = threading.Thread(target=worker, name="epoch_batches_prefetch",
                         daemon=True)
    t.start()
    try:
        while True:
            item = q.get()
            if item is _END:
                break
            if isinstance(item, BaseException):
                raise item
            yield item
    finally:
        # Stop AND join: an abandoned generator must not leave the worker
        # mid-item, racing a new epoch's iteration on the same dataset (the
        # augmentation np.random.Generator is not thread-safe). The worker
        # only does bounded host work per item and re-checks `stop` around
        # every queue put, so the join terminates.
        stop.set()
        t.join()
