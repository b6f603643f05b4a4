"""Amortized on-chip throughput of the TPU decode kernels.

The axon tunnel defeats naive timing twice over: `block_until_ready`
returns at dispatch (so chained-dispatch wall time measures Python
enqueue cost), each enqueue costs ~10-45 ms of HTTP round trip, and a
value fetch pays a ~25 ms round-trip floor. This tool therefore runs
the repetition loop ON DEVICE:

    g(bufpad, k) = fori_loop(0, k, acc -> acc + f(slice(bufpad, acc&1))[0])

one enqueue, one scalar fetch, k full executions of the measured
function between them. The input is doubled (bufpad = [buf, buf]) and
each iteration dynamically slices one of the two identical copies at a
data-dependent offset, so XLA cannot hoist or CSE the loop-invariant
computation; the slice itself adds one HBM copy of the input
(~0.05 ms per 36 MB at v5e's ~800 GB/s — noise). Reported time is the
two-point slope (t(2n) - t(n)) / n, cancelling the round-trip floor
and the (single) compile.

Reported rows:
  pack2 streams       full reconstruct_pack2 (rice16 unpack + LPC/fixed
                      reconstruction + decorrelation + container cast)
                      on a resident packed buffer, per true sample
  rice16_kernel       the G16 Rice bit-unpack Pallas kernel alone
  lpc2_kernel         the transposed-form int32 LPC Pallas kernel alone
  lpc2w_kernel        the hi/lo wide (64-bit accumulator) LPC kernel

Usage: python tools/bench_tpu.py [--samples N] [--dispatches N]
Prints one JSON object (stdout) and progress lines (stderr).
First compiles through the remote helper can take minutes; the JAX
persistent compilation cache is enabled to amortize across runs.
"""

import argparse
import functools
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")


def _log(msg):
    print(f"[bench_tpu] {msg}", file=sys.stderr, flush=True)


def _amortized(sliced_fn, bufpad, n_elems, n, extra_args=()):
    """Per-execution seconds of sliced_fn on device.

    sliced_fn(buf_slice, *extra_args) -> array; bufpad is the doubled
    input ([2 * n_elems] leading axis); the on-device fori_loop picks
    copy (acc & 1) each iteration."""
    import jax
    import jax.numpy as jnp
    from jax import lax

    @jax.jit
    def g(bufpad, k, *extra):
        def body(i, acc):
            start = (acc & 1) * n_elems
            buf = lax.dynamic_slice_in_dim(bufpad, start, n_elems,
                                           axis=0)
            out = sliced_fn(buf, *extra)
            return acc + out.ravel()[0].astype(jnp.int32)

        return lax.fori_loop(0, k, body, jnp.int32(0))

    def run(k):
        t0 = time.perf_counter()
        float(jax.device_get(g(bufpad, jnp.int32(k), *extra_args)))
        return time.perf_counter() - t0

    t0 = time.perf_counter()
    run(1)
    _log(f"  compile+first exec: {time.perf_counter() - t0:.1f}s")
    # MEDIAN of slope repeats: the tunnel adds tens of ms of jitter to
    # individual round trips, and min-of-slopes picks the luckiest
    # (t_small inflated, t_big deflated) pair — observed 4x-low
    # readings. The median is robust to both tails.
    slopes = []
    for _ in range(5):
        t1, t2 = run(n), run(2 * n)
        _log(f"  t({n})={t1:.3f}s t({2 * n})={t2:.3f}s")
        slopes.append(max(t2 - t1, 1e-9) / n)
    return float(np.median(slopes))


def bench_stream(bps: int, samples: int, n: int, data: bytes = None):
    import jax
    import jax.numpy as jnp

    from zflac_tpu import format as fmt
    from zflac_tpu.encoder import EncoderConfig, encode
    from zflac_tpu.index.native_indexer import pack2_range
    from zflac_tpu.bitio import BitReader
    from zflac_tpu.oracle import parse_metadata
    from zflac_tpu.runtime.device import _on_tpu, _reconstruct_pack2_core
    from zflac_tpu.testing import correlated_stereo

    # The pack2 step now runs in ~1 ms: at n=8 the 8-iteration slope
    # (~8 ms) drowns in the tunnel's per-measurement jitter (observed
    # +/- 10-20 ms in bad phases). Keep the slope window >= ~50 ms.
    n = max(n, 48)
    if data is None:
        pcm = correlated_stereo(samples, bps, seed=7)
        data = encode(pcm, 44100 if bps == 16 else 96000, bps,
                      EncoderConfig(block_size=4096))
    _log(f"  stream ready ({len(data)} bytes)")
    br = BitReader(data)
    info = parse_metadata(br)
    ck = pack2_range(data, br.pos // 8, len(data), info,
                     max_frames=1 << 20)
    assert ck is not None and ck.landed >= len(data) - 4, \
        "bench stream must pack in one chunk"
    use_pallas = _on_tpu()

    t0 = time.perf_counter()
    bufpad = jax.device_put(np.concatenate([ck.device_buf,
                                            ck.device_buf]))
    bufpad.block_until_ready()
    t_h2d = time.perf_counter() - t0
    _log(f"  h2d done ({2 * ck.device_buf.nbytes} bytes)")

    core = functools.partial(
        _reconstruct_pack2_core, spec=ck.spec_key(), num_channels=ck.C,
        container_bits=fmt.container_bits(ck.bits_per_sample),
        do_decorrelate=ck.do_decorrelate, use_pallas=use_pallas)
    t = _amortized(lambda buf: core(buf), bufpad,
                   len(ck.device_buf), n)
    true_samples = ck.total_block_samples * ck.C
    return {
        "bps": bps,
        "true_samples_per_dispatch": int(true_samples),
        "pack2_exec_ms": round(t * 1e3, 3),
        "pack2_msps": round(true_samples / t / 1e6, 1),
        "h2d_bytes": int(ck.device_buf.nbytes),
        "h2d_ms": round(t_h2d * 1e3 / 2, 1),
        "use_pallas": use_pallas,
    }


def bench_kernels(n: int):
    import jax.numpy as jnp

    # The individual kernels now run in the 0.02-0.7 ms range: at the
    # stream-level loop count the 8->16-iteration delta (~1 ms) drowns
    # in the tunnel's per-measurement jitter (+/- several ms). Scale
    # the on-device loop so the slope is measured over >= ~10 ms of
    # real compute.
    n = max(8 * n, 64)

    from zflac_tpu.ops.lpc2 import lpc2_reconstruct_inline
    from zflac_tpu.ops.lpc2w import lpc2w_reconstruct_inline
    from zflac_tpu.ops.rice16 import G2, rice16_unpack_rows_inline

    rng = np.random.default_rng(0)
    out = {}

    # rice16 rows kernel (the production 4-D sublane-tiled form):
    # geometry of a 4M-sample stereo stream (NG groups, Ssort=1024).
    W, NG, SS = 8, 1 << 19, 1024
    win = jnp.asarray(rng.integers(0, 1 << 32, (2 * W, NG),
                                   dtype=np.uint32))
    meta = jnp.asarray(
        (rng.integers(0, 4, (1, NG)) << 5 | 3).astype(np.int32))
    t = _amortized(
        lambda w, m: rice16_unpack_rows_inline(w, m, Ssort=SS),
        win, W, n, extra_args=(meta,))
    out["rice16_res_per_exec"] = G2 * NG
    out["rice16_ms"] = round(t * 1e3, 3)
    out["rice16_mres_s"] = round(G2 * NG / t / 1e6, 1)

    # lpc2 / lpc2w: B x S = 4096 x 2048 (a 4M-sample stream's LPC
    # load), at the geometry the production path picks via lpc2_lanes
    # (lanes=2048, tt=256 on this shape — wide lanes hide the
    # latency-bound recurrence chain).
    from zflac_tpu.ops.lpc2 import lpc2_lanes
    B, S, hist = 4096, 2048, 8
    lanes, tt = lpc2_lanes(S, B)
    rows = jnp.asarray(rng.integers(-1000, 1000, (2 * B, S),
                                    dtype=np.int32))
    cfwd = jnp.asarray(rng.integers(-500, 500, (hist, S),
                                    dtype=np.int32))
    shift = jnp.full((1, S), 10, jnp.int32)
    order = jnp.full((1, S), hist, jnp.int32)
    for name, fn in (("lpc2", lpc2_reconstruct_inline),
                     ("lpc2w", lpc2w_reconstruct_inline)):
        t = _amortized(
            lambda r, c, s, o, fn=fn: fn(r, c, s, o, lanes=lanes,
                                         hist=hist, unroll=8, tt=tt),
            rows, B, n, extra_args=(cfwd, shift, order))
        out[f"{name}_samples_per_exec"] = B * S
        out[f"{name}_ms"] = round(t * 1e3, 3)
        out[f"{name}_msps"] = round(B * S / t / 1e6, 1)
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--samples", type=int, default=1 << 22)
    ap.add_argument("--dispatches", type=int, default=8)
    args = ap.parse_args()

    import jax
    dev = jax.devices()[0]
    res = {"device": str(dev), "platform": dev.platform,
           "loop_n": args.dispatches}
    for stage, fn in (
            ("stream16", lambda: bench_stream(16, args.samples,
                                              args.dispatches)),
            ("stream24", lambda: bench_stream(24, args.samples // 2,
                                              args.dispatches)),
            ("kernels", lambda: bench_kernels(args.dispatches))):
        _log(f"{stage}...")
        t0 = time.perf_counter()
        res[stage] = fn()
        _log(f"{stage} done in {time.perf_counter() - t0:.1f}s")
    print(json.dumps(res, indent=2))
    return 0


if __name__ == "__main__":
    sys.exit(main())
