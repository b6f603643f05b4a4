"""Benchmark: end-to-end TPU-engine decode throughput vs the measured
single-threaded native CPU baseline.

Protocol (BASELINE.md): the reference publishes no absolute numbers and
its Zig toolchain is unavailable, so the CPU baseline is this repo's own
single-threaded C++ scalar decoder (zfi_decode_cpu — structurally the
reference's decode loop, compiled -O3 -march=native). The engine number
is the full production path: native index -> batched XLA reconstruction
on the default accelerator -> assembly -> MD5 verify.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import os
import sys
import time

import numpy as np

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
        vs = 0.0

    print(json.dumps({
        "metric": "decode_throughput",
        "value": round(engine_msps, 2),
        "unit": "Msamples/s",
        "vs_baseline": round(vs, 3),
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
