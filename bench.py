"""Benchmark: end-to-end decode throughput vs the measured
single-threaded native CPU baseline, plus the amortized on-chip TPU
number.

Protocol (BASELINE.md): the reference publishes no absolute numbers and
its Zig toolchain is unavailable, so the CPU baseline is this repo's own
single-threaded C++ scalar decoder (zfi_decode_cpu — structurally the
reference's decode loop, compiled -O3 -march=native).

PROVENANCE of the headline number: `zflac_tpu.decode(data)` with
engine="auto" routes host-destined PCM to the multithreaded AVX-512
C++ engine whenever the native library exists (runtime/decode.py) —
on THIS host the TPU sits behind a ~50 MB/s network tunnel, so feeding
the chip costs ~10x more than decoding on 2 CPU cores (docs/PERF.md).
The headline `value`/`vs_baseline` therefore measure the host engine
vs the scalar host baseline. The chip itself is measured separately:
`tpu_chip_msps` is the amortized per-dispatch throughput of the full
pack2 device path (rice16 bit-unpack + LPC/fixed reconstruction +
decorrelation) on device-resident buffers — dependency-chained
dispatches ended by a value fetch, two-point slope to cancel the
tunnel's round-trip floor (tools/bench_tpu.py) — 0.0 when no TPU is
attached or the measurement fails.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline",
"engine", "tpu_chip_msps", "tpu_chip_msps_24"}.
"""

import json
import os
import sys
import time

import numpy as np

# Persistent XLA compilation cache: the pack2 TPU graph can take
# minutes through a remote-compile tunnel on first build; cache it so
# repeat bench runs start warm. Must be set before jax imports.
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

CACHE = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                     ".bench_cache")
STREAM_SAMPLES = int(os.environ.get("BENCH_SAMPLES", 1 << 22))
BLOCK_SIZE = 4096
REPS = int(os.environ.get("BENCH_REPS", 9))


def get_stream() -> bytes:
    """Benchmark stream (BASELINE.json config 2: full subframe mix,
    16-bit/44.1kHz stereo), generated once and cached."""
    os.makedirs(CACHE, exist_ok=True)
    path = os.path.join(CACHE, f"bench_{STREAM_SAMPLES}_{BLOCK_SIZE}.flac")
    if os.path.exists(path):
        with open(path, "rb") as f:
            return f.read()
    from zflac_tpu.encoder import EncoderConfig, encode
    from zflac_tpu.testing import correlated_stereo
    pcm = correlated_stereo(STREAM_SAMPLES, 16, seed=7)
    data = encode(pcm, 44100, 16, EncoderConfig(block_size=BLOCK_SIZE))
    with open(path, "wb") as f:
        f.write(data)
    return data


def best_time(fn, reps=REPS):
    """Best-of-N wall time. The bench host is a shared VM with heavy
    steal-time noise (same-binary runs vary +/-40%); the minimum is the
    stable estimator of machine capability, applied identically to the
    engine and the baseline so the ratio stays fair."""
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        times.append(time.perf_counter() - t0)
    return float(np.min(times))


def best_times_aba(fn_a, fn_b, reps=REPS):
    """Best-of-N for two functions in A-B-A blocks: each side's minimum
    comes from consecutive (cache-warm) runs — interleaving every rep
    would make each side evict the other's working set — while the
    split A block straddles B in time so slow drift in host load hits
    both sides."""
    ta, tb = [], []
    first = (reps + 1) // 2
    for phase in ((fn_a, ta, first), (fn_b, tb, reps),
                  (fn_a, ta, reps - first)):
        fn, out, n = phase
        for _ in range(n):
            t0 = time.perf_counter()
            fn()
            out.append(time.perf_counter() - t0)
    return float(np.min(ta)), float(np.min(tb))


def tpu_chip_msps(data: bytes) -> tuple:
    """Amortized on-chip pack2 throughput for the 16-bit stream and the
    24-bit hi/lo wide path (tools/bench_tpu.py), (0.0, 0.0) when no TPU
    is attached or the measurement fails. Both widths are per-round
    artifacts so a regression in either kernel family (rice16/lpc2 or
    lpc2w) is caught by BENCH_r{N}, not only by manual runs."""
    try:
        import jax
        if jax.devices()[0].platform != "tpu":
            return 0.0, 0.0
        import importlib.util
        path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            "tools", "bench_tpu.py")
        spec = importlib.util.spec_from_file_location("bench_tpu", path)
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        res16 = mod.bench_stream(16, STREAM_SAMPLES, 8, data=data)
        msps16 = float(res16["pack2_msps"])
    except Exception as e:  # tunnel flakiness must not sink the bench
        print(f"tpu_chip_msps unavailable: {e!r}", file=sys.stderr)
        return 0.0, 0.0
    try:
        res24 = mod.bench_stream(24, STREAM_SAMPLES // 2, 8)
        msps24 = float(res24["pack2_msps"])
    except Exception as e:
        print(f"tpu_chip_msps_24 unavailable: {e!r}", file=sys.stderr)
        msps24 = 0.0
    return msps16, msps24


def main():
    data = get_stream()

    import zflac_tpu
    from zflac_tpu.index.native_indexer import (
        decode_cpu_native,
        native_available,
    )

    r = zflac_tpu.decode(data)  # warmup: compile + validate (MD5 on)
    total = r.num_samples * r.channels

    if native_available():
        # Baseline correctness cross-check, then timing. The baseline
        # includes the stream-MD5 verification the reference performs
        # as part of decode (zflac.zig:267-280), like the engine does.
        import hashlib

        def baseline():
            arr, meta = decode_cpu_native(data)
            assert hashlib.md5(arr.tobytes()).digest() == meta["md5"]
            return arr, meta

        base, meta = baseline()
        assert meta["frames"] == r.stats["frames"]
        t_engine, t_cpu = best_times_aba(
            lambda: zflac_tpu.decode(data), baseline)
        engine_msps = total / t_engine / 1e6
        cpu_msps = total / t_cpu / 1e6
        vs = engine_msps / cpu_msps
    else:
        t_engine = best_time(lambda: zflac_tpu.decode(data))
        engine_msps = total / t_engine / 1e6
        t_cpu = 0.0
        vs = 0.0

    chip16, chip24 = tpu_chip_msps(data)
    # Absolute wall times ride in the artifact so a BENCH_r{N} reader
    # can separate VM steal-time drift (both absolutes move, ratio
    # stable) from a real engine regression (engine absolute moves) —
    # r4 verdict: the two-endpoint ratio alone cannot distinguish them.
    print(json.dumps({
        "metric": "decode_throughput",
        "value": round(engine_msps, 2),
        "unit": "Msamples/s",
        "vs_baseline": round(vs, 3),
        "engine": r.stats.get("engine", "unknown"),
        "engine_wall_ms": round(t_engine * 1e3, 2),
        "baseline_wall_ms": round(t_cpu * 1e3, 2),
        "bench_samples": int(total),
        "tpu_chip_msps": round(chip16, 1),
        "tpu_chip_msps_24": round(chip24, 1),
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
