"""Byte-mutation fuzz of the native engine's full entry surface.

Every mutated stream must either decode or raise a typed FlacError —
never crash, read out of bounds, or trip UB. Run under the sanitized
build (tools/sanitize_run.py) this is the checked-arithmetic analog of
the reference's debug CI pass (zig build test with asserts live,
/root/reference/src/bit_reader.zig:26-34); the mutation corpus plays
the role of its faulty-file corpus (tests/std_faulty.zig).

Entry points exercised per mutation: decode(engine="native") (parallel
engine: anchors, fused Rice, AVX-512 reconstruction, MD5),
decode_tolerant (CRC-validated resync), build_plan_skim (measure-only
scan), pack2_range (device-buffer emitter).

Usage: python tools/fuzz_native.py [--iters N] [--seed S]
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def _streams():
    from zflac_tpu.encoder import EncoderConfig, encode
    from zflac_tpu.testing import correlated_stereo, tone_mix

    return [
        encode(correlated_stereo(20000, 16, seed=1), 44100, 16,
               EncoderConfig(block_size=1024)),
        encode(tone_mix(6000, 2, 24, seed=2), 96000, 24,
               EncoderConfig(block_size=256)),
        encode(tone_mix(4000, 8, 16, seed=3), 48000, 16,
               EncoderConfig(block_size=576)),
        # 3072 = 16 blocks of 192: the forced partition order must
        # divide every block, including the last.
        encode(tone_mix(3072, 1, 8, seed=4), 8000, 8,
               EncoderConfig(block_size=192, partition_order=4)),
        encode(tone_mix(4000, 2, 32, seed=5), 96000, 32,
               EncoderConfig(block_size=512)),
    ]


def _mutate(rng, data: bytes) -> bytes:
    buf = bytearray(data)
    mode = rng.integers(0, 4)
    if mode == 0:      # flip 1-4 random bytes
        for _ in range(rng.integers(1, 5)):
            buf[rng.integers(0, len(buf))] ^= int(rng.integers(1, 256))
    elif mode == 1:    # truncate
        del buf[rng.integers(1, len(buf)):]
    elif mode == 2:    # splice a chunk of garbage
        at = rng.integers(0, len(buf))
        n = int(rng.integers(1, 64))
        buf[at:at] = bytes(rng.integers(0, 256, n, dtype=np.uint8))
    else:              # burst-corrupt a window
        at = rng.integers(0, len(buf))
        n = min(int(rng.integers(1, 256)), len(buf) - at)
        buf[at:at + n] = bytes(rng.integers(0, 256, n, dtype=np.uint8))
    return bytes(buf)


def fuzz(iters: int, seed: int) -> int:
    import zflac_tpu
    from zflac_tpu.bitio import BitReader
    from zflac_tpu.errors import FlacError
    from zflac_tpu.index.native_indexer import (
        build_plan_skim,
        native_available,
        pack2_range,
    )
    from zflac_tpu.oracle import parse_metadata

    assert native_available(), "native engine unavailable"
    rng = np.random.default_rng(seed)
    base = _streams()
    outcomes = {"ok": 0, "typed_error": 0}
    for i in range(iters):
        data = _mutate(rng, base[i % len(base)])
        for entry in ("decode", "tolerant", "skim", "pack2"):
            try:
                if entry == "decode":
                    zflac_tpu.decode(data, engine="native")
                elif entry == "tolerant":
                    zflac_tpu.decode_tolerant(data)
                elif entry == "skim":
                    build_plan_skim(data)
                else:
                    br = BitReader(data)
                    info = parse_metadata(br)
                    pack2_range(data, br.pos // 8, len(data), info,
                                max_frames=1 << 14)
                outcomes["ok"] += 1
            except FlacError:
                outcomes["typed_error"] += 1
            # anything else (segfault, sanitizer abort, non-Flac
            # exception) propagates and fails the run
        if (i + 1) % 50 == 0:
            print(f"[fuzz] {i + 1}/{iters} {outcomes}", flush=True)
    print(f"[fuzz] done: {outcomes}", flush=True)
    return 0


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=200)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()
    sys.exit(fuzz(args.iters, args.seed))
