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


def test_rice16_kernel_interpret_matches_math():
    """The rice16 Pallas kernel BODY in interpret mode == the shared
    jnp math on a real packed chunk, so CPU-only CI executes the actual
    kernel code path (the reference's debug+release dual test pass,
    /root/reference/.github/workflows/tests.yml)."""
    import jax
    import jax.numpy as jnp
    from zflac_tpu.bitio import BitReader
    from zflac_tpu.encoder import EncoderConfig, encode
    from zflac_tpu.index.native_indexer import (native_available,
                                                pack2_range)
    from zflac_tpu.oracle import parse_metadata
    from zflac_tpu.ops.rice16 import (_unpack16_math,
                                      rice16_unpack_inline)
    from zflac_tpu.testing import correlated_stereo

    if not native_available():
        pytest.skip("native indexer unavailable")
    pcm = correlated_stereo(16384, 16, seed=11)
    data = encode(pcm, 44100, 16, EncoderConfig(block_size=2048))
    br = BitReader(data)
    info = parse_metadata(br)
    ck = pack2_range(data, br.pos // 8, len(data), info)
    assert ck is not None
    W, NG = ck.W, ck.NGp
    win = jnp.asarray(
        ck.buf[ck.off["win"]:ck.off["win"] + W * NG]
        .reshape(W, NG).view(np.uint32))
    meta = jnp.asarray(
        ck.buf[ck.off["meta"]:ck.off["meta"] + NG].reshape(1, NG))
    ref = np.asarray(jax.jit(_unpack16_math)(win, meta))
    got = np.asarray(rice16_unpack_inline(win, meta, lanes=NG,
                                          interpret=True))
    np.testing.assert_array_equal(got, ref)


def test_rice16_rows_kernel_4d_interpret_matches_math():
    """The production 4-D sublane-tiled rows kernel (full-vreg math on
    (8, 128) tiles) in interpret mode == the flat reference math,
    including the time-major output BlockSpec mapping. Ssort=1024
    triggers the 4-D path; a synthetic group mix covers rice, escape,
    invalid, and skip lanes."""
    import jax
    import jax.numpy as jnp
    from zflac_tpu.ops.rice16 import (K2_ESCAPE, K2_INVALID,
                                      rice16_unpack_rows_inline,
                                      unpack16_rows_math)

    rng = np.random.default_rng(5)
    W, SS, GP1 = 8, 1024, 6
    NG = GP1 * SS
    win = jnp.asarray(rng.integers(0, 1 << 32, (W, NG),
                                   dtype=np.uint32))
    k6 = rng.integers(0, 9, NG)
    k6[rng.random(NG) < 0.1] = K2_ESCAPE
    k6[rng.random(NG) < 0.1] = K2_INVALID
    depth = rng.integers(0, 12, NG)
    skip = np.where(rng.random(NG) < 0.05,
                    rng.integers(0, 8, NG), 0)
    pos0 = rng.integers(0, 32, NG)
    meta = jnp.asarray(
        (pos0 | (k6 << 5) | (depth << 11) | (skip << 16))
        .astype(np.int32)[None, :])
    ref = np.asarray(jax.jit(
        lambda w, m: unpack16_rows_math(w, m, Ssort=SS))(win, meta))
    got = np.asarray(jax.jit(
        lambda w, m: rice16_unpack_rows_inline(
            w, m, Ssort=SS, interpret=True))(win, meta))
    np.testing.assert_array_equal(got, ref)


def test_packtail_kernel_interpret_matches_xla_tail():
    """The fused gather+decorrelate+pack tail kernel (scalar-prefetch
    BlockSpecs, ops/packtail.py) in interpret mode == the XLA tail on
    a real mid-side chunk."""
    import jax
    import jax.numpy as jnp

    from zflac_tpu.bitio import BitReader
    from zflac_tpu.encoder import EncoderConfig, encode
    from zflac_tpu.index.native_indexer import (native_available,
                                                pack2_range)
    from zflac_tpu.oracle import parse_metadata
    from zflac_tpu.ops.packtail import packtail_inline
    from zflac_tpu.runtime.device import _reconstruct_pack2_core
    from zflac_tpu.testing import correlated_stereo

    if not native_available():
        pytest.skip("native indexer unavailable")
    pcm = correlated_stereo(40000, 16, seed=21)
    data = encode(pcm, 44100, 16,
                  EncoderConfig(block_size=1024, stereo_mode="mid_side"))
    br = BitReader(data)
    info = parse_metadata(br)
    ck = pack2_range(data, br.pos // 8, len(data), info,
                     max_frames=1 << 20)
    assert ck is not None
    spec = ck.spec_key()
    (Fp, Sp, Bp, *_rest) = spec
    off = dict(spec[9])
    buf = jnp.asarray(ck.device_buf)
    run = lambda **kw: jax.jit(  # noqa: E731
        lambda b: _reconstruct_pack2_core(
            b, spec=spec, num_channels=2, container_bits=16,
            do_decorrelate=True, use_pallas=False, **kw))(buf)
    ref = np.asarray(run())
    stack = run(stage="transpose")
    packed = jax.jit(lambda s, i, w, c: packtail_inline(
        s, i, w, c, Fp=Fp, container_bits=16, interpret=True))(
        stack, jnp.asarray(ck.buf[off["inv"]:off["inv"] + Sp]),
        jnp.asarray(ck.buf[off["wasted"]:off["wasted"] + Sp]),
        jnp.asarray(ck.buf[off["chcode"]:off["chcode"] + Fp]))
    got = np.asarray(jax.lax.bitcast_convert_type(packed, jnp.int16))
    np.testing.assert_array_equal(got, ref)


def _numpy_lpc64(rows, cf, shift, order):
    """Scalar reference of the 64-bit-accumulator LPC recurrence
    (InterType i64, zflac.zig:314-319,526-533)."""
    S, B = rows.shape
    out = rows.astype(np.int64).copy()
    for s in range(S):
        o = int(order[s])
        for t in range(o, B):
            acc = 0
            for j in range(o):
                acc += int(cf[s, j]) * int(out[s, t - 1 - j])
            out[s, t] = int(rows[s, t]) + (acc >> int(shift[s]))
    return out


def test_lpc2w_kernel_interpret_matches_numpy64():
    """The wide (hi/lo dual-int32) Pallas LPC kernel BODY in interpret
    mode == a scalar int64 reference and the lax.scan twin, on values
    whose dot products exceed 32 bits (the high-res domain)."""
    from zflac_tpu.ops.lpc2w import (lpc2w_reconstruct_inline,
                                     lpc2w_scan)
    import jax.numpy as jnp

    rng = np.random.default_rng(13)
    S, B, hist = 128, 64, 8
    order = rng.integers(1, hist + 1, S).astype(np.int32)
    shift = np.full(S, 14, np.int32)
    cf = np.zeros((S, hist), np.int32)
    rows = np.zeros((S, B), np.int32)
    for s in range(S):
        o = order[s]
        # sum|c| <= 2^14 = 2^shift keeps the recurrence contractive so
        # true samples stay in int32 while products reach ~2^40.
        c = rng.integers(-2048, 2049, o)
        cf[s, :o] = c
        rows[s, :o] = rng.integers(-2**29, 2**29, o)      # warm-ups
        rows[s, o:] = rng.integers(-1024, 1025, B - o)     # residuals
    ref = _numpy_lpc64(rows, cf, shift, order)
    assert np.abs(ref).max() < 2**31  # in the kernel's exactness domain
    args = (jnp.asarray(rows.T.copy()), jnp.asarray(cf.T.copy()),
            jnp.asarray(shift[None, :]), jnp.asarray(order[None, :]))
    got_scan = np.asarray(lpc2w_scan(*args, hist=hist)).T
    np.testing.assert_array_equal(got_scan, ref)
    got_kern = np.asarray(lpc2w_reconstruct_inline(
        *args, lanes=S, hist=hist, unroll=8, interpret=True)).T
    np.testing.assert_array_equal(got_kern, ref)
