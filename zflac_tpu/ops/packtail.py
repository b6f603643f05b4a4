"""Fused stereo tail kernel: stream-order gather + wasted shift +
decorrelation + channel pack in ONE streaming pass.

The XLA form of the pack2 tail needs optimization barriers after the
inv row gathers (without them XLA re-executes each gather inside every
decorrelation consumer), which forces two materialized [F, Bp] channel
planes before the elementwise pack — ~3x the tail's bandwidth floor
(docs/PERF.md roofline). This kernel removes the intermediates: the
grid walks frames, a scalar-prefetched `inv` permutation drives the
input BlockSpec index maps (pltpu.PrefetchScalarGridSpec — the index
of each frame's two sorted stack rows is known before the body runs,
so the DMAs pipeline), and the body shifts/decorrelates/packs the two
rows directly into the packed output row. Decorrelation math mirrors
/root/reference/src/zflac.zig:553-578; the channel pack is the
little-endian bitcast interleave of runtime/device.py.

Serves the stereo int8/int16-container fast tail (the production
16-bit stereo path). Wider containers keep the XLA tail.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .. import format as fmt
from .vma import out_struct


def _packtail_kernel(inv_ref, wasted_ref, chcode_ref, s0_ref, s1_ref,
                     out_ref, *, container_bits: int):
    f = pl.program_id(0)
    c0 = s0_ref[0]                      # [Bp // 128, 128]
    c1 = s1_ref[0]
    c0 = c0 << wasted_ref[2 * f]
    c1 = c1 << wasted_ref[2 * f + 1]
    mode = chcode_ref[f]
    # Stereo decorrelation (zflac.zig:553-578) under a scalar mode.
    mid = (c0 << 1) | (c1 & 1)
    new0 = jnp.where(
        mode == fmt.CH_SIDE_RIGHT, c0 + c1,
        jnp.where(mode == fmt.CH_MID_SIDE, (mid + c1) >> 1, c0))
    new1 = jnp.where(
        mode == fmt.CH_LEFT_SIDE, c0 - c1,
        jnp.where(mode == fmt.CH_MID_SIDE, (mid - c1) >> 1, c1))
    if container_bits == 16:
        out_ref[0] = (new0 & 0xFFFF) | (new1 << 16)
    else:
        out_ref[0] = (new0 & 0xFF) | ((new1 & 0xFF) << 8)


def packtail_inline(stack, inv, wasted, chcode, *, Fp: int,
                    container_bits: int, interpret: bool = False):
    """stack: [Ssort + 1, Bp] int32 (reconstructed sorted rows + the
    dead zero row); inv: [2 * Fp] int32 stream->sorted permutation;
    wasted: [2 * Fp] int32; chcode: [Fp] int32. Returns the packed
    stereo planes [Fp, Bp] int32 (caller bitcasts to the container
    dtype, appending the channel axis in memory order). Not jitted:
    inline under the caller's jit."""
    S1, Bp = stack.shape
    # 3-D views (free, row-major): Mosaic requires the block's LAST
    # TWO dims to satisfy the (8, 128) tiling rule, but leading block
    # dims are unconstrained — so rows ride the leading dim (block 1,
    # dynamically indexed by the prefetched permutation) and the row's
    # Bp samples fill full (Bp/128, 128) vreg tiles.
    B128 = Bp // 128
    stack3 = stack.reshape(S1, B128, 128)
    import functools
    kernel = functools.partial(_packtail_kernel,
                               container_bits=container_bits)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,      # inv, wasted, chcode
        grid=(Fp,),
        in_specs=[
            # Frame f's two channel rows of the sorted stack, selected
            # by the prefetched permutation (in-bounds by construction:
            # padded slots point at the dead row Ssort).
            pl.BlockSpec((1, B128, 128),
                         lambda f, inv, w, cc: (inv[2 * f], 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, B128, 128),
                         lambda f, inv, w, cc: (inv[2 * f + 1], 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, B128, 128),
                               lambda f, inv, w, cc: (f, 0, 0),
                               memory_space=pltpu.VMEM),
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=out_struct((Fp, B128, 128), jnp.int32, stack, inv,
                             wasted, chcode),
        interpret=interpret,
    )(inv, wasted, chcode, stack3, stack3)
    return out.reshape(Fp, Bp)
