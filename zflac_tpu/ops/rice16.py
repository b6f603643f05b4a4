"""Pallas TPU Rice/bit-unpack kernel, v2 (pack2 path).

Same measured-offset two-phase design as ops/rice.py (the host scan
walks the serial bitstream once and records group offsets; extraction
is then data-parallel over groups — SURVEY.md §7 fact 4), but with the
geometry tuned from profiling the v1 kernel on TPU v5e:

  * G2 = 8 residuals per group (round 3 used 16, but a 16-residual
    span rarely fits an 8-word window on real streams, forcing W=16
    and doubling the per-residual select-chain cost; at G2=8 the same
    4 bytes/residual upload keeps W=8 and halves the fetch work);
  * the window is emitted by the C++ scan directly into the packed
    device buffer (pack2_helpers.inc), so there is NO device-side
    window gather (the v1 skim path's dominant cost: an XLA gather of
    [W, NG] from the word table);
  * W = 8 words per group (adaptively 16 for extreme-k streams),
    chosen by the scan from the measured spans — 4 bytes of upload per
    residual;
  * ONE 64-bit extract per residual: the host envelope guarantees
    q <= 40 and q + 1 + k <= 64, so the quotient, the terminator, and
    the remainder all live in the 64 bits at the residual's start
    (v1 performed a second full extract for the remainder);
  * per-group metadata packed in one int32:
    pos0(5) | k(6: 0-31 rice, 62 escape, 63 invalid) | depth(5) |
    skip(5).

Escaped partitions (fixed-width raw residuals) ride the same kernel.
Groups outside the envelope are invalidated by the host and patched
from scan-recorded values. Mirrors the semantics of
/root/reference/src/zflac.zig:635-666 (decode_residual_partition).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .vma import out_struct

G2 = 8  # must match kG2 in index/native/pack2_helpers.inc
K2_ESCAPE = 62
K2_INVALID = 63


def _clz32(u):
    """Count leading zeros of a uint32 vector (exact integer math:
    smear the MSB down, then SWAR popcount)."""
    u = u | (u >> 1)
    u = u | (u >> 2)
    u = u | (u >> 4)
    u = u | (u >> 8)
    u = u | (u >> 16)
    v = u - ((u >> 1) & jnp.uint32(0x55555555))
    v = (v & jnp.uint32(0x33333333)) + ((v >> 2) & jnp.uint32(0x33333333))
    v = (v + (v >> 4)) & jnp.uint32(0x0F0F0F0F)
    pop = (v * jnp.uint32(0x01010101)) >> 24
    return (jnp.uint32(32) - pop).astype(jnp.int32)


def _bitcast_i32(u):
    return jax.lax.bitcast_convert_type(u, jnp.int32)


def _select_word(win, wi, c_lo, c_hi):
    """win[wi] per element via a select chain (win: [W, *S] uint32;
    wi: [*S] int32; rows outside [c_lo, c_hi] read as 0)."""
    acc = jnp.zeros_like(win[0])
    for c in range(c_lo, c_hi + 1):
        acc = jnp.where(wi == c, win[c], acc)
    return acc


def _unpack16_list(win, meta):
    """Shape-generic group extraction: win is indexable as win[c] with
    the same (arbitrary) spatial shape as meta — [1, L] rows in the
    flat layout, [8, 128] full-vreg tiles in the 4D sublane layout
    (rice16_unpack_rows_inline). Returns a list of G2 arrays of
    meta's shape (residual j of every group)."""
    W = win.shape[0]
    pos = meta & 31
    k6 = (meta >> 5) & 63
    depth = (meta >> 11) & 31
    skip = (meta >> 16) & 31

    valid = k6 != K2_INVALID
    is_escape = k6 == K2_ESCAPE
    kk = jnp.where(is_escape | ~valid, 0, k6).astype(jnp.uint32)
    d = depth.astype(jnp.uint32)
    du = jnp.minimum(32 - depth, 31)

    outs = []
    for j in range(G2):
        active = valid & (j >= skip)
        wi = pos >> 5
        b = (pos & 31).astype(jnp.uint32)
        # Tight fetch bounds: before residual j, pos <= pos0 + 64*j
        # (the host envelope caps every residual at q + 1 + k <= 64
        # bits) and pos0 < 32, so wi <= (31 + 64*j) >> 5. Residual 0's
        # rows are static (wi == 0); later residuals walk shorter
        # select chains than the worst case.
        hi = min((31 + 64 * j) >> 5, W - 3)
        if hi == 0:
            w0, w1, w2 = win[0], win[1], win[2]
        else:
            w0 = _select_word(win, wi, 0, hi)
            w1 = _select_word(win, wi + 1, 1, hi + 1)
            w2 = _select_word(win, wi + 2, 2, hi + 2)
        # (x >> 1) >> (31 - b) == x >> (32 - b), defined for b == 0.
        chunk = (w0 << b) | ((w1 >> 1) >> (jnp.uint32(31) - b))
        chunk2 = (w1 << b) | ((w2 >> 1) >> (jnp.uint32(31) - b))

        # Unary quotient from the 64 bits at pos (host: q <= 40).
        zeros = jnp.where(chunk != 0, _clz32(chunk),
                          32 + _clz32(chunk2))
        # Remainder: k bits starting at zeros+1 within (chunk, chunk2);
        # host envelope q + 1 + k <= 64 keeps it inside. sh is clamped
        # so garbage lanes (decoding past their last real residual)
        # stay shift-defined; their values are masked downstream.
        sh = jnp.minimum(zeros + 1, 41).astype(jnp.uint32)
        fhi = jnp.where(
            sh < 32,
            (chunk << sh) | ((chunk2 >> 1) >> (jnp.uint32(31) - sh)),
            chunk2 << (sh & 31))
        rem = jnp.where(kk > 0, fhi >> (jnp.uint32(32) - kk),
                        jnp.uint32(0))
        q = zeros.astype(jnp.uint32)
        zz = (q << kk) | rem
        # Zigzag decode in uint32 wraparound == the int32 bit pattern
        # (zflac.zig:663-664).
        rice_val = _bitcast_i32((zz >> 1) ^ (jnp.uint32(0) - (zz & 1)))
        rice_adv = zeros + 1 + kk.astype(jnp.int32)

        # Escape path: fixed-width signed residual (arithmetic shift
        # sign-extends the depth-bit value; depth == 0 -> all zeros).
        esc_val = jnp.where(depth > 0, _bitcast_i32(chunk) >> du, 0)
        esc_adv = depth

        value = jnp.where(is_escape, esc_val, rice_val)
        adv = jnp.where(is_escape, esc_adv, rice_adv)
        outs.append(jnp.where(active, value, 0).astype(jnp.int32))
        pos = jnp.where(active, pos + adv, pos)
    return outs


def _unpack16_math(win, meta):
    """Flat-layout wrapper of _unpack16_list (the CPU-reference form):
    win [W, L] uint32, meta [1, L] int32. Returns out [G2, L] int32."""
    return jnp.concatenate(
        _unpack16_list(win[:, None, :], meta), axis=0)


def _rice16_kernel(win_ref, meta_ref, out_ref):
    out_ref[:, :] = _unpack16_math(win_ref[:, :], meta_ref[:, :])


def rice16_unpack_inline(windows, meta, *, lanes: int = 2048,
                         interpret: bool = False):
    """windows: [W, NG] uint32; meta: [1, NG] int32 with NG a multiple
    of `lanes`. Returns residuals [G2, NG] int32. Not jitted: inline
    under the caller's jit."""
    W, NG = windows.shape
    assert NG % lanes == 0
    grid = (NG // lanes,)
    return pl.pallas_call(
        _rice16_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((W, lanes), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, lanes), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((G2, lanes), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=out_struct((G2, NG), jnp.int32, windows, meta),
        interpret=interpret,
    )(windows, meta)


@functools.partial(jax.jit, static_argnames=("lanes", "interpret"))
def rice16_unpack_tpu(windows, meta, lanes=2048, interpret=False):
    return rice16_unpack_inline(windows, meta, lanes=lanes,
                                interpret=interpret)


# ---------------------------------------------------------------------
# v3 rows layout: the C++ scan emits groups P-MAJOR (slot = p * Ssort +
# sorted subframe), so the kernel's output BlockSpec can write the
# TIME-MAJOR residual array [(GPB+1)*G2, Ssort] directly — row
# t = p*G2 + j is time, lane is the sorted subframe. This is the layout
# the LPC kernels consume, so the [G2,NGp]->[Ssort,Bp] relayout and the
# transposes around the LPC kernels (v2's dominant XLA glue) vanish.
# ---------------------------------------------------------------------


def rows_lanes(Ssort: int) -> int:
    """Widest lane-block dividing Ssort (Ssort is a sum of pow2
    multiples of 128, hence always a multiple of 128)."""
    for cand in (2048, 1024, 512, 256):
        if Ssort % cand == 0:
            return cand
    return 128


def unpack16_rows_math(win, meta, *, Ssort: int):
    """CPU reference of the rows-layout kernel: the flat [G2, NGp]
    math output re-laid to time-major [(NGp/Ssort)*G2, Ssort]."""
    W, NGp = win.shape
    GP1 = NGp // Ssort
    out = _unpack16_math(win, meta)
    return out.reshape(G2, GP1, Ssort).transpose(1, 0, 2).reshape(
        GP1 * G2, Ssort)


def _rice16_kernel4(win_ref, meta_ref, out_ref):
    """Full-vreg body: refs carry (8, 128) minor tiles, so every
    per-residual op runs on complete vregs instead of [1, lanes] rows
    (which occupy one sublane of each vreg — ~1/8 ALU utilization,
    the dominant cost of the 2-D kernel)."""
    win = win_ref[:, 0]                 # [W, 8, 128]
    meta = meta_ref[0]                  # [8, 128]
    outs = _unpack16_list(win, meta)
    for j in range(G2):
        out_ref[j, 0] = outs[j]


def rice16_unpack_rows_inline(windows, meta, *, Ssort: int,
                              lanes: int = 0, interpret: bool = False):
    """windows: [W, NGp] uint32 with NGp = GP1 * Ssort (p-major slots);
    meta: [1, NGp]. Returns time-major residuals [GP1 * G2, Ssort]
    int32. Not jitted: inline under the caller's jit.

    When Ssort is a multiple of 1024 (every production-size chunk),
    the arrays are VIEWED 4-D — [.., NGp/1024, 8, 128] — so each grid
    step's block is a stack of full (8, 128) vregs: the flat run of
    1024 group slots at (s, l) = s*128 + l is exactly the row-major
    (8, 128) tile, so the views are free and the kernel's elementwise
    math uses all 8 sublanes. Measured ~3x on the v5e over the
    [1, lanes]-row form. Small chunks keep the 2-D row layout."""
    W, NGp = windows.shape
    assert NGp % Ssort == 0
    GP1 = NGp // Ssort
    if Ssort % 1024 == 0:
        NB = NGp // 1024                # total (8, 128) blocks
        R4 = Ssort // 1024              # blocks per p-row
        win4 = windows.reshape(W, NB, 8, 128)
        meta4 = meta.reshape(NB, 8, 128)
        out4 = pl.pallas_call(
            _rice16_kernel4,
            grid=(NB,),
            in_specs=[
                pl.BlockSpec((W, 1, 8, 128), lambda i: (0, i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 8, 128), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            # Block i covers p-row i // R4, sorted-lane tile i % R4 of
            # the time-major output (viewed 4-D over the same memory).
            out_specs=pl.BlockSpec(
                (G2, 1, 8, 128), lambda i: (i // R4, i % R4, 0, 0),
                memory_space=pltpu.VMEM),
            out_shape=out_struct((GP1 * G2, R4, 8, 128), jnp.int32,
                                 windows, meta),
            interpret=interpret,
        )(win4, meta4)
        return out4.reshape(GP1 * G2, Ssort)
    if lanes <= 0:
        lanes = rows_lanes(Ssort)
    assert Ssort % lanes == 0
    R = Ssort // lanes
    grid = (NGp // lanes,)
    return pl.pallas_call(
        _rice16_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((W, lanes), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, lanes), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        # Flat lane-block i covers groups of p-row i // R, sorted-lane
        # block i % R: the [G2, lanes] block lands at time rows
        # (i // R) * G2 of the time-major output.
        out_specs=pl.BlockSpec((G2, lanes), lambda i: (i // R, i % R),
                               memory_space=pltpu.VMEM),
        out_shape=out_struct((GP1 * G2, Ssort), jnp.int32, windows,
                             meta),
        interpret=interpret,
    )(windows, meta)
