"""Shared pipelined timing for the on-chip probes.

Per-iteration forced readbacks (the pre-round-4 scheme) add one full
host↔device tunnel round trip to every measured step — 3-30 ms depending on
the session, larger than many effects under measurement. Here all
iterations are dispatched back-to-back and completion is forced ONCE via a
jitted barrier that consumes one leaf of every output (the device runs
queued programs in dispatch order, so the barrier completing implies every
step ran). `bench.py` carries the same scheme inline (it must stay
self-contained for the driver) and records the session RTT as
`tunnel_rtt_ms`.
"""
from __future__ import annotations

import time

import jax
import jax.numpy as jnp


@jax.jit
def _combine(leaves):
    return sum(jnp.sum(l.astype(jnp.float32)) for l in leaves)


def _force(out):
    leaf = jax.tree_util.tree_leaves(out)[0]
    return float(jnp.sum(leaf.astype(jnp.float32)))


def timeit(fn, *args, n=6, warmup=2):
    outs = [fn(*args) for _ in range(max(warmup, 1))]
    leaves = [jax.tree_util.tree_leaves(o)[0] for o in outs]
    leaves = (leaves + [leaves[-1]] * n)[:n]
    float(_combine(leaves))  # warm the barrier at the exact signature
    tic = time.perf_counter()
    outs = [fn(*args) for _ in range(n)]
    float(_combine([jax.tree_util.tree_leaves(o)[0] for o in outs]))
    return (time.perf_counter() - tic) / n * 1e3


def measure_rtt(iters=5):
    x = jnp.zeros(())
    _force(x + 1.0)
    tic = time.perf_counter()
    for _ in range(iters):
        _force(x + 1.0)
    return (time.perf_counter() - tic) / iters * 1e3
