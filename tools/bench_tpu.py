"""Amortized on-chip throughput of the TPU decode kernels.

The axon tunnel has a ~25 ms per-dispatch floor and ~13 MB/s D2H, so a
single timed dispatch through it says nothing about chip capability
(PERF.md). This tool measures what that floor hides: N back-to-back
jitted dispatches on DEVICE-RESIDENT buffers (no host fetch inside the
timed region), divided by N — the samples/s-per-chip number behind the
pack2 path ("several hundred Msamples/s per chip", PERF.md), now
measured rather than projected.

Reported rows:
  pack2_e2e_dispatch  full reconstruct_pack2 (rice16 unpack + LPC/fixed
                      reconstruction + decorrelation + container cast)
                      on a resident packed buffer, per true sample
  rice16_kernel       the G16 Rice bit-unpack Pallas kernel alone
  lpc2_kernel         the transposed-form int32 LPC Pallas kernel alone
  lpc2w_kernel        the hi/lo wide (64-bit accumulator) LPC kernel
  h2d_pack2           device_put of the packed buffer (tunnel-bound
                      here; PCIe/DMA-bound on a directly-attached chip)

Usage: PYTHONPATH=. python tools/bench_tpu.py [--samples N]
Prints one JSON object and a human table.
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def _timed_dispatches(fn, n, warmup=2):
    """Wall time of n chained async dispatches, blocked once at the
    end; best of 3 batches."""
    for _ in range(warmup):
        fn().block_until_ready()
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        out = None
        for _ in range(n):
            out = fn()
        out.block_until_ready()
        best = min(best, (time.perf_counter() - t0) / n)
    return best


def bench_stream(bps: int, samples: int, n: int):
    import jax

    from zflac_tpu import format as fmt
    from zflac_tpu.encoder import EncoderConfig, encode
    from zflac_tpu.index.native_indexer import pack2_range
    from zflac_tpu.bitio import BitReader
    from zflac_tpu.oracle import parse_metadata
    from zflac_tpu.runtime.device import _on_tpu, reconstruct_pack2
    from zflac_tpu.testing import correlated_stereo

    pcm = correlated_stereo(samples, bps, seed=7)
    data = encode(pcm, 44100 if bps == 16 else 96000, bps,
                  EncoderConfig(block_size=4096))
    br = BitReader(data)
    info = parse_metadata(br)
    ck = pack2_range(data, br.pos // 8, len(data), info,
                     max_frames=1 << 20)
    assert ck is not None and ck.landed >= len(data) - 4, \
        "bench stream must pack in one chunk"
    use_pallas = _on_tpu()

    # H2D of the packed buffer (the only transfer the path performs).
    t0 = time.perf_counter()
    buf_dev = jax.device_put(ck.device_buf)
    buf_dev.block_until_ready()
    t_h2d = time.perf_counter() - t0

    kwargs = dict(spec=ck.spec_key(), num_channels=ck.C,
                  container_bits=fmt.container_bits(ck.bits_per_sample),
                  do_decorrelate=ck.do_decorrelate,
                  use_pallas=use_pallas)
    t = _timed_dispatches(lambda: reconstruct_pack2(buf_dev, **kwargs), n)
    true_samples = ck.total_block_samples * ck.C
    return {
        "bps": bps,
        "true_samples_per_dispatch": int(true_samples),
        "pack2_dispatch_ms": round(t * 1e3, 3),
        "pack2_msps": round(true_samples / t / 1e6, 1),
        "h2d_bytes": int(ck.device_buf.nbytes),
        "h2d_ms": round(t_h2d * 1e3, 1),
        "use_pallas": use_pallas,
    }


def bench_kernels(n: int):
    import jax
    import jax.numpy as jnp

    from zflac_tpu.ops.lpc2 import lpc2_reconstruct_tpu
    from zflac_tpu.ops.lpc2w import lpc2w_reconstruct_tpu
    from zflac_tpu.ops.rice16 import G2, rice16_unpack_tpu

    rng = np.random.default_rng(0)
    out = {}

    # rice16: geometry of a 4M-sample stereo stream (NG = Sp * GPB).
    W, NG = 8, 1 << 19
    win = jnp.asarray(rng.integers(0, 1 << 32, (W, NG), dtype=np.uint32))
    meta = jnp.asarray(
        (rng.integers(0, 4, (1, NG)) << 5 | 3).astype(np.int32))
    t = _timed_dispatches(lambda: rice16_unpack_tpu(win, meta), n)
    out["rice16_res_per_dispatch"] = G2 * NG
    out["rice16_ms"] = round(t * 1e3, 3)
    out["rice16_mres_s"] = round(G2 * NG / t / 1e6, 1)

    # lpc2 / lpc2w: B x S = 4096 x 2048 (a 4M-sample stream's LPC load).
    B, S, hist = 4096, 2048, 8
    rows = jnp.asarray(rng.integers(-1000, 1000, (B, S), dtype=np.int32))
    cfwd = jnp.asarray(rng.integers(-500, 500, (hist, S), dtype=np.int32))
    shift = jnp.full((1, S), 10, jnp.int32)
    order = jnp.full((1, S), hist, jnp.int32)
    for name, fn in (("lpc2", lpc2_reconstruct_tpu),
                     ("lpc2w", lpc2w_reconstruct_tpu)):
        t = _timed_dispatches(
            lambda fn=fn: fn(rows, cfwd, shift, order, lanes=512,
                             hist=hist, unroll=8), n)
        out[f"{name}_samples_per_dispatch"] = B * S
        out[f"{name}_ms"] = round(t * 1e3, 3)
        out[f"{name}_msps"] = round(B * S / t / 1e6, 1)
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--samples", type=int, default=1 << 22)
    ap.add_argument("--dispatches", type=int, default=16)
    args = ap.parse_args()

    import jax
    dev = jax.devices()[0]
    res = {"device": str(dev), "platform": dev.platform,
           "dispatches": args.dispatches}
    res["stream16"] = bench_stream(16, args.samples, args.dispatches)
    res["stream24"] = bench_stream(24, args.samples // 2,
                                   args.dispatches)
    res["kernels"] = bench_kernels(args.dispatches)
    print(json.dumps(res, indent=2))
    return 0


if __name__ == "__main__":
    sys.exit(main())
