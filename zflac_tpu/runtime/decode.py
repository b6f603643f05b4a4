"""Production decode orchestrator: bytes -> host index -> batched
XLA reconstruction -> assembly -> MD5 -> DecodedFLAC.

Mirrors the reference's public entry point semantics
(/root/reference/src/zflac.zig:217-310) with the two-phase TPU
architecture of SURVEY.md §7.
"""

from __future__ import annotations

import hashlib

import numpy as np

from .. import format as fmt
from ..errors import InvalidChecksum
from ..index import build_plan
from ..plan import StreamPlan
from ..result import DecodedFLAC, container_dtype
from .reconstruct import reconstruct


def _pad_pow2(n: int, lo: int = 1) -> int:
    p = lo
    while p < n:
        p *= 2
    return p


def _bucket_block(b: int) -> int:
    """Pad the sample axis to a lane-friendly size with few distinct
    buckets (recompile control)."""
    return max(128, -(-b // 128) * 128)


def _run_reconstruct(plan: StreamPlan):
    """Pad plan arrays to bucketed static shapes and run the jitted
    reconstruction. Returns host PCM [F, B, C] (container dtype)."""
    F = plan.num_frames
    C = plan.channels
    S = plan.num_subframes
    B = plan.max_block
    Bp = _bucket_block(B)
    Fp = _pad_pow2(F)
    Sp = Fp * C

    rows = np.zeros((Sp, Bp), dtype=plan.rows.dtype)
    rows[:S, :B] = plan.rows

    def pad1(a, n, dtype=None):
        out = np.zeros(n, dtype=dtype or a.dtype)
        out[:len(a)] = a
        return out

    kind = pad1(plan.kind, Sp)
    order = pad1(plan.order, Sp)
    wasted = pad1(plan.wasted, Sp)
    shift = pad1(plan.shift, Sp)
    coeffs = np.zeros((Sp, 32), dtype=np.int32)
    coeffs[:S] = plan.coeffs_rev
    seeds = np.zeros((Sp, 4), dtype=plan.fixed_seeds.dtype)
    seeds[:S] = plan.fixed_seeds
    channel_code = pad1(plan.channel_code, Fp)

    # The Pallas LPC kernel serves int32 streams with moderate block
    # sizes on TPU; otherwise the XLA scan path. Any int64 use (wide
    # rows or int64 streams) requires the scoped-x64 trace, which Mosaic
    # lowering does not tolerate.
    import jax
    needs_x64 = rows.dtype == np.int64 or bool(np.any(plan.wide))
    try:
        target = jax.config.jax_default_device or jax.devices()[0]
        on_tpu = target.platform == "tpu"
    except RuntimeError:
        # Accelerator backend failed to initialize (e.g. the chip is
        # held by another process); XLA will fall back to CPU.
        on_tpu = False
    lpc_impl = "pallas" if (
        not needs_x64 and rows.dtype == np.int32 and Bp <= 4096
        and on_tpu) else "scan"

    # Gather lists per kernel class, padded to pow2 with OOB sentinels
    # (LPC pads to lane multiples for the kernel).
    class_idx = {}
    for name, idx in plan.classes().items():
        if len(idx) == 0:
            continue
        n = _pad_pow2(len(idx))
        if name == "lpc" and lpc_impl == "pallas":
            n = max(n, 128)
        padded = np.full(n, Sp, dtype=np.int32)  # OOB sentinel
        padded[:len(idx)] = idx
        class_idx[name] = padded

    def run():
        return reconstruct(
            rows, kind, order, wasted, shift, coeffs, seeds, class_idx,
            channel_code,
            num_channels=C,
            container_bits=fmt.container_bits(plan.info.bits_per_sample),
            do_decorrelate=bool(
                np.any(plan.channel_code > fmt.CH_INDEPENDENT_MAX)),
            lpc_impl=lpc_impl,
        )

    if needs_x64:
        with jax.enable_x64(True):
            pcm = run()
    else:
        pcm = run()
    return np.asarray(pcm)[:F]


def _assemble(plan: StreamPlan, pcm: np.ndarray) -> np.ndarray:
    """[F, B, C] frame-major PCM -> interleaved output, honoring
    per-frame block sizes."""
    F = plan.num_frames
    C = plan.channels
    bs = plan.block_size
    total = plan.total_samples
    if F == 0:
        return np.zeros(0, dtype=pcm.dtype if pcm.size else np.int16)
    if np.all(bs == bs[0]):
        flat = pcm[:, :bs[0], :].reshape(-1)
        return flat[:total * C]
    out = np.empty(total * C, dtype=pcm.dtype)
    for f in range(F):
        start = plan.pcm_start[f] * C
        out[start:start + bs[f] * C] = pcm[f, :bs[f], :].reshape(-1)
    return out


def verify_stream_md5(interleaved: np.ndarray, bps: int,
                      expected: bytes) -> bool:
    """MD5 over the smallest-whole-byte little-endian sample bytes
    (zflac.zig:267-277)."""
    nbytes = fmt.md5_bytes_per_sample(bps)
    if nbytes == 3:
        raw = interleaved.astype("<i4").tobytes()
        raw = b"".join(raw[i:i + 3] for i in range(0, len(raw), 4))
    else:
        raw = interleaved.astype(f"<i{nbytes}", copy=False).tobytes()
    return hashlib.md5(raw).digest() == expected


def _decode_native(data: bytes, check_crc: bool,
                   verify_md5: bool) -> DecodedFLAC:
    """Host-native engine: parallel sync-scan index + threaded C++
    reconstruction. Fastest path when the output destination is host
    RAM (phase 2 is memory-bound; a device round-trip costs more than
    the compute — see bench.py)."""
    from ..index.native_indexer import decode_native_parallel
    arr, meta = decode_native_parallel(data, check_crc=check_crc)
    si_bps = meta["si_bits_per_sample"]
    if verify_md5 and not verify_stream_md5(arr, si_bps, meta["md5"]):
        raise InvalidChecksum("stream MD5 mismatch")
    shift = fmt.normalization_shift(si_bps)
    if shift:
        arr = arr << shift
    return DecodedFLAC(
        channels=meta["channels"],
        sample_rate=meta["sample_rate"],
        bits_per_sample=meta["bits_per_sample"],
        interleaved=arr,
        stats={"frames": meta["frames"], "engine": "native"},
    )


def decode(data: bytes, check_crc: bool = False, verify_md5: bool = True,
           prefer_native: bool = True, safe_lpc: bool = False,
           engine: str = "auto") -> DecodedFLAC:
    """Decode a stream.

    engine:
      "auto"   fastest correct path for host output: the native engine
               when available, else the XLA/Pallas engine.
      "tpu"    host index + batched XLA/Pallas reconstruction (use for
               device-resident output and sharded/long-stream decode).
      "native" parallel C++ index + threaded C++ reconstruction.
    safe_lpc: route int32-stream LPC subframes through the widened
    int64 accumulator class (hardening beyond the reference's always-i32
    InterType for <=16-bit streams, zflac.zig:314-319) at some cost
    (tpu engine only; the native engine always accumulates in 64-bit).
    """
    if engine == "auto":
        from ..index.native_indexer import native_available
        engine = "native" if (native_available() and prefer_native
                              and not safe_lpc) else "tpu"
    if engine == "native":
        return _decode_native(data, check_crc, verify_md5)

    plan = build_plan(data, check_crc=check_crc,
                      prefer_native=prefer_native)
    if safe_lpc and plan.rows.dtype == np.int32:
        plan.wide = (plan.kind == 3)
    dtype = container_dtype(plan.info.bits_per_sample)

    if plan.num_frames == 0:
        interleaved = np.zeros(0, dtype=dtype)
    else:
        pcm = _run_reconstruct(plan)
        interleaved = _assemble(plan, pcm)

    if verify_md5:
        if not verify_stream_md5(interleaved, plan.info.bits_per_sample,
                                 plan.info.md5):
            raise InvalidChecksum("stream MD5 mismatch")

    # Bit-depth normalization (zflac.zig:287-306); wraps in-container.
    shift = fmt.normalization_shift(plan.info.bits_per_sample)
    if shift:
        interleaved = interleaved << shift

    stats = dict(plan.stats)
    stats["engine"] = "xla"
    return DecodedFLAC(
        channels=plan.channels,
        sample_rate=plan.sample_rate,
        bits_per_sample=plan.bits_per_sample,
        interleaved=interleaved,
        stats=stats,
    )
