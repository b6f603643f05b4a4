"""Pallas TPU kernel for the batched LPC recurrence, v2.

The LPC time loop is inherently sequential (the `>> shift` inside the
recurrence is nonlinear — /root/reference/src/zflac.zig:526-533;
SURVEY.md §7 fact 3). The v1 kernel (ops/lpc.py) recomputed the full
32-tap dot product every step: a cross-sublane reduction tree sits on
the loop-carried dependency path, ~40+ cycles per sample.

v2 uses the *transposed direct form*: keep a running partial-sum
pipeline P[hist, L] where P[r] holds the partial prediction for time
t+1+r accumulated from all samples produced so far. Per step:

    pred_t   = P[0]                       (ready-made, no reduction)
    out_t    = res[t] + (pred_t >> shift)   for t >= order
    P        = shift_up(P) + out_t * Cf     (vector FMA, off the
                                             critical path except P[1])

with Cf[r] = c_{r+1} (the coefficient of s[t-1-r]). The loop-carried
chain is out_t -> mul c_1 -> add -> (next) shift/add: ~5 ops instead of
a 32-wide reduction. int32 wraparound addition is associative, so the
reordered accumulation is bit-exact vs the reference's index-order sum.

History depth is bucketed (hist = 8 / 16 / 32) by LPC order so common
music (order <= 8) pays a [8, L] pipeline, not [32, L].

The kernel is int32 (Mosaic has no int64): the same accumulator width
the reference uses for <=16-bit streams (InterType, zflac.zig:314-319).
Wider streams take the XLA scan path.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .vma import out_struct


def _lpc2_kernel(rows_ref, cfwd_ref, shift_ref, order_ref, out_ref,
                 P_scr, *, hist: int, unroll: int, tt: int):
    """Time-tiled grid body: grid = (S/lanes, B/tt), time tiles inner.
    The recurrence is latency-bound (each step's ~5-op dependency chain
    stalls the VPU regardless of lane count), so lanes go WIDE (512:
    four vregs of independent work per step hide the chain latency —
    measured 2.4x over the old whole-time-axis blocks at lanes=128) and
    the pipeline state P carries across time tiles in VMEM scratch
    (TPU grid iteration is sequential, so scratch persists)."""
    L = rows_ref.shape[1]
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        P_scr[...] = jnp.zeros((hist, L), jnp.int32)

    cfwd = cfwd_ref[:, :]              # [hist, L], row r = c_{r+1}
    shift = shift_ref[:, :]            # [1, L]
    order = order_ref[:, :]            # [1, L]
    zrow = jnp.zeros((1, L), jnp.int32)
    t0 = j * tt

    def step(carry):
        i, P = carry
        t = pl.multiple_of(i * unroll, unroll)
        res = rows_ref[pl.ds(t, unroll), :]          # [unroll, L]
        outs = []
        for u in range(unroll):
            pred = jnp.right_shift(P[0:1, :], shift)
            out = jnp.where(t0 + t + u >= order, res[u:u + 1, :] + pred,
                            res[u:u + 1, :])
            outs.append(out)
            # Rolling pipeline: drop the consumed head, add this
            # sample's contribution to the next `hist` predictions.
            P = jnp.concatenate([P[1:, :], zrow], axis=0) + out * cfwd
        out_ref[pl.ds(t, unroll), :] = jnp.concatenate(outs, axis=0)
        return i + jnp.int32(1), P

    _, P = jax.lax.while_loop(
        lambda c: c[0] < jnp.int32(tt // unroll), step,
        (jnp.int32(0), P_scr[...]))
    P_scr[...] = P


def lpc2_reconstruct_inline(rows_t, cfwd_t, shift, order, *,
                            lanes: int = 512, hist: int = 8,
                            unroll: int = 8, tt: int = 512,
                            interpret: bool = False):
    """rows_t: [B, S] int32 (time-major; warm-ups at t < order,
    residuals after); cfwd_t: [hist, S] with row r = c_{r+1} (zero for
    r >= order); shift/order: [1, S]. S must be a multiple of `lanes`,
    B of `tt` (and tt of `unroll`), every order <= hist. Returns the
    reconstructed signal [B, S] int32. Not jitted: inline under the
    caller's jit."""
    B, S = rows_t.shape
    # tt must DIVIDE B: B is a multiple of 128 (the 128-padded block
    # bucket), so gcd(B, tt) >= 128 and stays a multiple of `unroll`.
    # min(tt, B) alone crashes on Bp values like 640/1152/2304
    # (classic FLAC block sizes 576/1152/2304 after padding).
    tt = math.gcd(B, tt)
    assert S % lanes == 0 and B % tt == 0 and tt % unroll == 0
    assert unroll % 8 == 0, "sublane alignment requires unroll % 8 == 0"
    assert cfwd_t.shape[0] == hist
    grid = (S // lanes, B // tt)
    kernel = functools.partial(_lpc2_kernel, hist=hist, unroll=unroll,
                               tt=tt)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((tt, lanes), lambda i, j: (j, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((hist, lanes), lambda i, j: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, lanes), lambda i, j: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, lanes), lambda i, j: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tt, lanes), lambda i, j: (j, i),
                               memory_space=pltpu.VMEM),
        out_shape=out_struct((B, S), jnp.int32, rows_t, cfwd_t,
                             shift, order),
        scratch_shapes=[pltpu.VMEM((hist, lanes), jnp.int32)],
        interpret=interpret,
    )(rows_t, cfwd_t, shift, order)


def lpc2_lanes(n: int, B: int, pairs: int = 1):
    """Kernel geometry (lanes, tt) for the time-tiled LPC kernels, or
    None when nothing fits — the caller falls back to the XLA scan
    path.

    The recurrence is latency-bound, so WIDER lanes win as long as the
    double-buffered (in + out) blocks fit VMEM: measured on v5e
    (B=4096, S=2048, order 8) lanes 512/1024/2048 run 0.39/0.26/0.19-
    0.23 ms per 8.4 M samples. The footprint is
    2 (dbl-buffer) x 2 (in+out) x pairs x (tt x lanes) x 4 B,
    independent of B; `pairs` is 2 for the lpc2w33 kernel (hi AND lo
    planes in and out). tt shrinks (staying a divisor of B and a
    multiple of the unroll) to admit wider lanes — the measured
    (lanes=2048, tt=256) beats (1024, 512) and is comfortably inside
    the ~16 MB/core VMEM."""
    budget_words = (12 * 2**20 // 16) // pairs   # tt * lanes bound
    for lanes in (2048, 1024, 512, 256, 128):
        if n % lanes:
            continue
        tt = math.gcd(B, 512)
        while tt > 8 and tt * lanes > budget_words:
            tt //= 2
        if tt % 8 == 0 and tt * lanes <= budget_words:
            return lanes, tt
    return None


@functools.partial(jax.jit,
                   static_argnames=("lanes", "hist", "unroll", "interpret"))
def lpc2_reconstruct_tpu(rows_t, cfwd_t, shift, order, lanes=512, hist=8,
                         unroll=8, interpret=False):
    return lpc2_reconstruct_inline(rows_t, cfwd_t, shift, order,
                                   lanes=lanes, hist=hist, unroll=unroll,
                                   interpret=interpret)
