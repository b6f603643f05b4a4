"""Sentinel-safe scatters.

Class gather lists and patch index arrays are padded to static shapes
with an out-of-range sentinel (one past the last valid index). The
obvious formulation `canvas.at[idx].set(vals, mode="drop")` relies on
XLA dropping the out-of-bounds updates — but XLA:CPU miscompiles that
at some geometries: with a [2, 256] canvas and 128 update rows
(jaxlib 0.9.0), OOB row indices WRAP to row 0 and clobber real output
(single-frame pack2 chunks decoded channel 1 into channel 0).

These helpers never present an out-of-bounds index to XLA: the canvas
gets one extra dead slot, sentinels are clamped onto it, the scatter
runs with mode="promise_in_bounds", and the dead slot is dropped. The
regression geometry is pinned by
tests/test_device_decode.py::test_scatter_rows_sentinel_geometry.
"""

from __future__ import annotations

import jax.numpy as jnp


def scatter_rows(canvas, idx, updates):
    """canvas.at[idx].set(updates) where idx entries >= canvas.shape[0]
    are sentinels whose updates must be discarded."""
    n = canvas.shape[0]
    dead = jnp.zeros((1,) + canvas.shape[1:], canvas.dtype)
    padded = jnp.concatenate([canvas, dead], axis=0)
    safe = jnp.minimum(idx, jnp.asarray(n, idx.dtype))
    return padded.at[safe].set(updates, mode="promise_in_bounds")[:n]


def scatter_flat(flat, idx, vals):
    """1-D variant: flat.at[idx].set(vals) with sentinel idx == len or
    beyond discarded."""
    n = flat.shape[0]
    padded = jnp.concatenate([flat, jnp.zeros((1,), flat.dtype)])
    safe = jnp.minimum(idx, jnp.asarray(n, idx.dtype))
    return padded.at[safe].set(vals, mode="promise_in_bounds")[:n]
