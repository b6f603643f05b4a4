"""Pallas TPU kernel for the batched LPC recurrence.

The LPC time loop is inherently sequential (the `>> shift` inside the
recurrence makes it nonlinear — zflac.zig:526-533; SURVEY.md §7 fact 3),
so throughput comes from batching subframes across VPU lanes and keeping
the whole recurrence in VMEM with a hardware fori_loop — no XLA
while-loop per-step overhead.

Layout: time on the sublane axis, subframes on the lane axis (128 per
grid step). Each step reads the 32-row history window of the output
buffer being built, multiplies by per-lane reversed coefficients,
reduces over sublanes, shifts per lane, adds the residual, and stores
one output row:

  X[32+t, s] = rows[t, s] + ((sum_j X[t+j, s] * C[j, s]) >> shift[s])
               for t >= order[s];  X[32+t, s] = rows[t, s] otherwise
  (X[0:32, :] = 0; warm-ups live in rows[t < order] so early window
   products are exactly the reference's history dot.)

The kernel is int32 (Mosaic has no int64): the same accumulator width
the reference uses for <=16-bit streams (InterType i32,
zflac.zig:314-319). Wider streams take the XLA scan path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .vma import out_struct

LANES = 128
HIST = 32


def _lpc_kernel(rows_ref, coeffs_ref, shift_ref, order_ref, out_ref, *,
                hist: int, unroll: int):
    B = rows_ref.shape[0]
    L = rows_ref.shape[1]
    coeffs = coeffs_ref[:, :]          # [hist, L]
    shift = shift_ref[:, :]            # [1, L]
    order = order_ref[:, :]            # [1, L]

    # History window lives in vector registers as the loop carry (no
    # per-step VMEM round-trip); row j holds output t-hist+j. The inner
    # unroll makes the window roll a compile-time register rename and
    # batches the residual loads/output stores into [unroll, L] tiles.
    window0 = jnp.zeros((hist, L), jnp.int32)

    def step(carry):
        i, window = carry
        # Sublane offsets must be provably 8-aligned for vector loads.
        t = pl.multiple_of(i * unroll, unroll)
        res = rows_ref[pl.ds(t, unroll), :]              # [unroll, L]
        outs = []
        for k in range(unroll):
            # dtype pinned: under x64 jnp.sum would promote to int64,
            # which Mosaic lacks (and the reference accumulates in i32).
            pred = jnp.sum(window * coeffs, axis=0, keepdims=True,
                           dtype=jnp.int32)
            pred = jnp.right_shift(pred, shift)
            out = jnp.where(t + k >= order, res[k:k + 1, :] + pred,
                            res[k:k + 1, :])
            outs.append(out)
            window = jnp.concatenate([window[1:, :], out], axis=0)
        out_ref[pl.ds(t, unroll), :] = jnp.concatenate(outs, axis=0)
        return i + jnp.int32(1), window

    # Explicit while_loop with an int32 counter: under x64, fori_loop
    # promotes its induction variable to int64, which Mosaic cannot
    # lower.
    jax.lax.while_loop(
        lambda c: c[0] < jnp.int32(B // unroll), step,
        (jnp.int32(0), window0))


def lpc_reconstruct_inline(rows_t, coeffs_t, shift, order, *,
                           lanes: int = LANES, hist: int = HIST,
                           unroll: int = 8, interpret: bool = False):
    """rows_t: [B, S] int32 (time-major); coeffs_t: [hist, S] with row j
    holding the coefficient for s[t-hist+j] (the tail columns of
    plan.coeffs_rev, transposed); shift/order: [1, S]. S must be a
    multiple of `lanes`, B of `unroll`, and every order <= hist.
    Returns the reconstructed signal [B, S] int32.

    Not jitted: inline under the caller's jit (runtime.reconstruct)."""
    B, S = rows_t.shape
    assert S % lanes == 0 and B % unroll == 0
    assert unroll % 8 == 0, "sublane alignment requires unroll % 8 == 0"
    assert coeffs_t.shape[0] == hist
    grid = (S // lanes,)

    kernel = functools.partial(_lpc_kernel, hist=hist, unroll=unroll)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((B, lanes), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((hist, lanes), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, lanes), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, lanes), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((B, lanes), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=out_struct((B, S), jnp.int32, rows_t, coeffs_t,
                             shift, order),
        interpret=interpret,
    )(rows_t, coeffs_t, shift, order)


@functools.partial(jax.jit,
                   static_argnames=("lanes", "hist", "unroll", "interpret"))
def lpc_reconstruct_tpu(rows_t, coeffs_t, shift, order, lanes=LANES,
                        hist=HIST, unroll=8, interpret=False):
    return lpc_reconstruct_inline(rows_t, coeffs_t, shift, order,
                                  lanes=lanes, hist=hist, unroll=unroll,
                                  interpret=interpret)
