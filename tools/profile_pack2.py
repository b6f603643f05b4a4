"""On-chip stage breakdown of the pack2 reconstruction graph.

Runs `_reconstruct_pack2_core` truncated at each stage boundary with
the same on-device fori_loop slope timing as tools/bench_tpu.py, so the
delta between consecutive stages isolates what each piece of the graph
costs on real hardware:

    unpack     rice16 Pallas kernel (time-major [(GPB+1)*G2, Ssort])
    rows       + patch scatter, warm-up splice, tail mask (elementwise)
    stack      + per-class reconstruction on static lane slices (LPC
                 kernel, fixed cumsums) — still time-major
    transpose  + the ONE full-data relayout [Bp, Ssort+1]->[Ssort+1, Bp]
    signal     + the inv gather to stream order (general path)
    full       the production graph: stereo plane gathers fused with
               wasted shift / decorrelation / interleave pack

Usage: python tools/profile_pack2.py [--samples N] [--dispatches N]
       [--bps N]
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

from bench_tpu import _amortized, _log  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--samples", type=int, default=1 << 22)
    ap.add_argument("--dispatches", type=int, default=8)
    ap.add_argument("--bps", type=int, default=16)
    args = ap.parse_args()

    import jax

    from zflac_tpu import format as fmt
    from zflac_tpu.bitio import BitReader
    from zflac_tpu.encoder import EncoderConfig, encode
    from zflac_tpu.index.native_indexer import pack2_range
    from zflac_tpu.oracle import parse_metadata
    from zflac_tpu.runtime.device import _on_tpu, _reconstruct_pack2_core
    from zflac_tpu.testing import correlated_stereo, tone_mix

    bps = args.bps
    pcm = (correlated_stereo(args.samples, bps, seed=7) if bps == 16
           else tone_mix(args.samples, 2, bps, seed=7))
    data = encode(pcm, 44100 if bps == 16 else 96000, bps,
                  EncoderConfig(block_size=4096))
    br = BitReader(data)
    info = parse_metadata(br)
    ck = pack2_range(data, br.pos // 8, len(data), info,
                     max_frames=1 << 20)
    assert ck is not None
    _log(f"chunk: {ck.device_buf.nbytes} bytes, spec {ck.spec_key()[:6]}")

    bufpad = jax.device_put(np.concatenate([ck.device_buf,
                                            ck.device_buf]))
    bufpad.block_until_ready()
    use_pallas = _on_tpu()
    true_samples = ck.total_block_samples * ck.C

    res = {"device": str(jax.devices()[0]), "bps": bps,
           "true_samples": int(true_samples), "stages_ms": {}}
    # Wide (33-bit) chunks only implement the "unpack" and "full"
    # truncation points (runtime/device.py handles wide chunks in
    # _reconstruct_pack2_wide33, which has no intermediate stages);
    # reporting the others would show the full graph's time under a
    # stage label, reading as zero-cost stages (ADVICE r4).
    stages = ("unpack", "rows", "stack", "transpose", "signal", "full")
    if ck.wide:
        skipped = [s for s in stages if s not in ("unpack", "full")]
        _log(f"wide chunk: stages {skipped} not supported, skipping")
        stages = ("unpack", "full")
    prev = 0.0
    full_ms = None
    for stage in stages:
        core = functools.partial(
            _reconstruct_pack2_core, spec=ck.spec_key(),
            num_channels=ck.C,
            container_bits=fmt.container_bits(ck.bits_per_sample),
            do_decorrelate=ck.do_decorrelate, use_pallas=use_pallas,
            stage=stage)
        _log(f"stage {stage}...")
        t = _amortized(lambda buf: core(buf), bufpad,
                       len(ck.device_buf), args.dispatches)
        ms = t * 1e3
        res["stages_ms"][stage] = {
            "cumulative": round(ms, 3),
            "delta": round(ms - prev, 3),
        }
        prev = ms
        if stage == "full":
            full_ms = ms
    res["msps_full"] = round(true_samples / (full_ms / 1e3) / 1e6, 1)
    print(json.dumps(res, indent=2))


if __name__ == "__main__":
    main()
