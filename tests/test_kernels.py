"""Kernel unit tests: the Pallas LPC kernel (interpret mode on CPU)
against the XLA scan implementation and numpy, over randomized orders,
shifts, and coefficients."""

import numpy as np
import pytest

import jax.numpy as jnp

from zflac_tpu.ops.lpc import lpc_reconstruct_tpu
from zflac_tpu.runtime.reconstruct import _lpc_scan


def _random_case(rng, S, B, max_order=32):
    order = rng.integers(1, max_order + 1, size=S).astype(np.int32)
    shift = rng.integers(0, 16, size=S).astype(np.int32)
    coeffs_rev = np.zeros((S, 32), np.int32)
    for s in range(S):
        o = order[s]
        coeffs_rev[s, 32 - o:] = rng.integers(-2**13, 2**13, size=o)
    rows = rng.integers(-2**14, 2**14, size=(S, B)).astype(np.int32)
    return order, shift, coeffs_rev, rows


def _numpy_lpc(rows, coeffs_rev, shift, order):
    S, B = rows.shape
    X = np.zeros((S, 32 + B), np.int64)
    out = np.zeros((S, B), np.int32)
    for t in range(B):
        pred = (X[:, t:t + 32] * coeffs_rev).sum(1)
        pred = pred.astype(np.int32) >> shift
        o = np.where(t >= order, rows[:, t] + pred,
                     rows[:, t]).astype(np.int32)
        X[:, 32 + t] = o
        out[:, t] = o
    return out


@pytest.mark.parametrize("seed", [0, 1])
def test_scan_matches_numpy(seed):
    rng = np.random.default_rng(seed)
    order, shift, coeffs_rev, rows = _random_case(rng, 64, 256)
    ref = _numpy_lpc(rows, coeffs_rev, shift, order)
    out = np.asarray(_lpc_scan(jnp.array(rows), jnp.array(coeffs_rev),
                               jnp.array(shift), jnp.array(order)))
    np.testing.assert_array_equal(out, ref)


@pytest.mark.parametrize("lanes,hist", [(128, 32), (128, 16)])
def test_pallas_interpret_matches_numpy(lanes, hist):
    rng = np.random.default_rng(2)
    order, shift, coeffs_rev, rows = _random_case(
        rng, lanes, 64, max_order=hist)
    ref = _numpy_lpc(rows, coeffs_rev, shift, order)
    out = lpc_reconstruct_tpu(
        jnp.array(np.ascontiguousarray(rows.T)),
        jnp.array(np.ascontiguousarray(coeffs_rev[:, 32 - hist:].T)),
        jnp.array(shift[None, :]), jnp.array(order[None, :]),
        lanes=lanes, hist=hist, unroll=8, interpret=True)
    np.testing.assert_array_equal(np.asarray(out).T, ref)


def test_fixed_integrate_matches_scalar():
    from zflac_tpu.plan import fixed_seeds_from_warmup
    from zflac_tpu.runtime.reconstruct import _fixed_integrate
    from zflac_tpu import format as fmt

    rng = np.random.default_rng(3)
    B, n = 128, 16
    orders = rng.integers(0, 5, size=n).astype(np.int32)
    rows = np.zeros((n, B), np.int32)
    seeds = np.zeros((n, 4), np.int32)
    expected = np.zeros((n, B), np.int64)
    for i, k in enumerate(orders):
        warm = rng.integers(-1000, 1000, size=k)
        res = rng.integers(-50, 50, size=B - k)
        rows[i, :k] = warm
        rows[i, k:] = res
        seeds[i] = fixed_seeds_from_warmup(warm, k, np.int32)
        # scalar reference (zflac.zig:481-490)
        sig = list(warm) + list(res)
        coeffs = fmt.FIXED_COEFFS[int(k)]
        for t in range(k, B):
            sig[t] += sum(c * sig[t - 1 - j]
                          for j, c in enumerate(coeffs))
        expected[i] = sig
    out = np.asarray(_fixed_integrate(jnp.array(rows),
                                      jnp.array(orders),
                                      jnp.array(seeds)))
    np.testing.assert_array_equal(out.astype(np.int64), expected)
