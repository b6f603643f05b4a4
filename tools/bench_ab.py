"""A/B regression benchmark: HEAD's native engine vs a pinned prior
revision, the analog of the reference's zbench harness which times the
current build against a pinned previous release of itself
(/root/reference/benchmarks/std_subset.zig, build.zig.zon:16-19).

Builds the indexer from the given git rev into a scratch .so and times
both on the cached benchmark stream.

Usage: python tools/bench_ab.py [REV] (default HEAD~1)
"""

import ctypes
import json
import os
import subprocess
import sys
import tempfile
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from zflac_tpu.index.native_indexer import _Plan  # noqa: E402


_NATIVE_SOURCES = ("indexer.cpp", "pack2_helpers.inc",
                   "interleave.inc", "simd512.inc")


def build_rev(rev: str) -> str:
    """Extract the FULL native engine (indexer.cpp + its .inc kernel
    files) at `rev` and build it with the current production flags."""
    tmp = tempfile.mkdtemp(prefix="zflac_ab_")
    for name in _NATIVE_SOURCES:
        try:
            blob = subprocess.check_output(
                ["git", "-C", REPO, "show",
                 f"{rev}:zflac_tpu/index/native/{name}"],
                stderr=subprocess.DEVNULL)
        except subprocess.CalledProcessError:
            continue  # rev predates this kernel file
        with open(os.path.join(tmp, name), "wb") as f:
            f.write(blob)
    so = os.path.join(tmp, "lib.so")
    subprocess.check_call(["g++", "-O3", "-march=native", "-std=c++20",
                           "-fwrapv", "-shared", "-fPIC", "-pthread",
                           "-o", so, os.path.join(tmp, "indexer.cpp")])
    return so


def bench_so(path: str, data: bytes, reps: int = 9) -> float:
    """Median wall time of the full native decode (parallel engine,
    MD5 on — the same work bench.py's baseline performs)."""
    lib = ctypes.CDLL(path)
    lib.zfi_decode_parallel.restype = ctypes.c_int
    lib.zfi_decode_parallel.argtypes = [
        ctypes.c_char_p, ctypes.c_size_t, ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(_Plan), ctypes.POINTER(ctypes.c_void_p)]
    lib.zfi_free.argtypes = [ctypes.POINTER(_Plan)]
    lib.zfi_free_samples.argtypes = [ctypes.c_void_p]
    times = []
    for _ in range(reps):
        plan = _Plan()
        sp = ctypes.c_void_p()
        t0 = time.perf_counter()
        rc = lib.zfi_decode_parallel(data, len(data), 0, 1,
                                     ctypes.byref(plan), ctypes.byref(sp))
        times.append(time.perf_counter() - t0)
        assert rc == 0, rc
        lib.zfi_free(ctypes.byref(plan))
        lib.zfi_free_samples(sp)
    return float(np.median(times))


def main() -> int:
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("rev", nargs="?", default="HEAD~1")
    ap.add_argument("--corpus", action="store_true",
                    help="time every conformance-corpus stream A/B "
                    "(the reference's per-file zbench protocol, "
                    "/root/reference/benchmarks/std_subset.zig)")
    args = ap.parse_args()
    rev = args.rev
    sys.path.insert(0, REPO)

    cur_so = os.path.join(REPO, "zflac_tpu", "index", "native",
                          "libzflac_index.so")
    if not os.path.exists(cur_so):
        from zflac_tpu.index.native_indexer import native_available
        assert native_available()
    # NOTE: the prior .so is loaded with the CURRENT _Plan layout; revs
    # that predate a layout change cannot be A/B'd safely.
    old_so = build_rev(rev)

    if args.corpus:
        from zflac_tpu.testing import make_corpus

        rows = []
        worst = (1e9, "")
        for name, (data, pcm, sr, bps) in sorted(make_corpus().items()):
            t_cur = bench_so(cur_so, data, reps=5)
            t_old = bench_so(old_so, data, reps=5)
            sp = t_old / t_cur
            rows.append({"file": name, "head_ms": round(t_cur * 1e3, 3),
                         "rev_ms": round(t_old * 1e3, 3),
                         "speedup": round(sp, 3)})
            if sp < worst[0]:
                worst = (sp, name)
        for r in rows:
            print(f"{r['file']:32s} head {r['head_ms']:8.3f} ms   "
                  f"{rev} {r['rev_ms']:8.3f} ms   x{r['speedup']:.3f}")
        print(json.dumps({
            "metric": "native_decode_ab_corpus",
            "files": len(rows),
            "geomean_speedup": round(
                float(np.exp(np.mean([np.log(r["speedup"])
                                      for r in rows]))), 3),
            "worst_speedup": round(worst[0], 3),
            "worst_file": worst[1],
        }))
        return 0

    import bench as benchmod
    data = benchmod.get_stream()
    t_cur = bench_so(cur_so, data)
    t_old = bench_so(old_so, data)
    print(json.dumps({
        "metric": "native_decode_ab",
        "head_ms": round(t_cur * 1e3, 2),
        f"{rev}_ms": round(t_old * 1e3, 2),
        "speedup": round(t_old / t_cur, 3),
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
