"""Seek / partial decode and tolerant (error-recovering) decode.

The frame table produced by the indexer *is* a seek table (byte offset,
first-sample position, and coded number per frame — the checkpoint/
resume capability SURVEY.md §5 notes the reference lacks), and the
sync-scan anchor machinery makes decode recoverable: a corrupt region
is skipped to the next CRC-validated frame and the gap's exact sample
position is restored from the next frame's coded number
(frame_index x block_size under fixed blocking, the sample number
itself under variable blocking). The reference's resync is an
acknowledged TODO (Readme.md:54).
"""

from __future__ import annotations

import numpy as np

from .. import format as fmt
from ..bitio import BitReader
from ..errors import FlacError
from ..oracle import parse_metadata
from ..result import DecodedFLAC, container_dtype


def _slice_plan(plan, f0: int, f1: int):
    """Frame-range view [f0, f1) of a plan (arrays sliced, offsets
    rebased)."""
    import dataclasses
    C = plan.channels
    sub = dataclasses.replace(
        plan,
        block_size=plan.block_size[f0:f1],
        channel_code=plan.channel_code[f0:f1],
        pcm_start=plan.pcm_start[f0:f1] - plan.pcm_start[f0],
        frame_byte_offset=plan.frame_byte_offset[f0:f1],
        coded_number=plan.coded_number[f0:f1],
        rows=plan.rows[f0 * C:f1 * C],
        kind=plan.kind[f0 * C:f1 * C],
        order=plan.order[f0 * C:f1 * C],
        wasted=plan.wasted[f0 * C:f1 * C],
        shift=plan.shift[f0 * C:f1 * C],
        coeffs_rev=plan.coeffs_rev[f0 * C:f1 * C],
        fixed_seeds=plan.fixed_seeds[f0 * C:f1 * C],
        wide=plan.wide[f0 * C:f1 * C],
        total_samples=int(np.sum(plan.block_size[f0:f1])),
        groups=None,
    )
    return sub


def decode_range(data: bytes, start_sample: int, num_samples: int,
                 prefer_native: bool = True,
                 use_seektable: bool = True) -> DecodedFLAC:
    """Decode only the frames covering [start_sample, start_sample +
    num_samples) and trim to exactly that sample range. Stream MD5
    cannot be verified for a partial decode.

    With use_seektable, a SEEKTABLE metadata block (or, failing that, a
    sync-scan anchor estimate) limits indexing to the needed byte range
    instead of walking the whole stream — O(range) seeks into huge
    files."""
    from ..index import build_plan
    from .decode import _assemble, _run_reconstruct

    if use_seektable:
        r = _decode_range_indexed(data, start_sample, num_samples)
        if r is not None:
            return r

    plan = build_plan(data, prefer_native=prefer_native)
    end_sample = min(start_sample + num_samples, plan.total_samples)
    if start_sample >= plan.total_samples or end_sample <= start_sample:
        empty = np.zeros(0, dtype=container_dtype(
            plan.info.bits_per_sample))
        return DecodedFLAC(plan.channels, plan.sample_rate,
                           plan.bits_per_sample, empty,
                           stats={"frames": 0, "engine": "seek"})

    starts = plan.pcm_start
    f0 = int(np.searchsorted(starts, start_sample, side="right") - 1)
    f1 = int(np.searchsorted(starts, end_sample, side="left"))
    f1 = max(f1, f0 + 1)

    sub = _slice_plan(plan, f0, f1)
    pcm = _run_reconstruct(sub)
    interleaved = _assemble(sub, pcm)

    C = plan.channels
    lo = (start_sample - int(starts[f0])) * C
    hi = lo + (end_sample - start_sample) * C
    interleaved = interleaved[lo:hi]

    shift = fmt.normalization_shift(plan.info.bits_per_sample)
    if shift:
        interleaved = interleaved << shift
    return DecodedFLAC(
        channels=C,
        sample_rate=plan.sample_rate,
        bits_per_sample=plan.bits_per_sample,
        interleaved=interleaved,
        stats={"frames": f1 - f0, "engine": "seek",
               "first_frame": f0},
    )


def _decode_range_indexed(data: bytes, start_sample: int,
                          num_samples: int):
    """Seek via SEEKTABLE: index only from the nearest preceding seek
    point to the end of the requested range. Returns None when the
    fast path does not apply (no native indexer, no usable seek point,
    or a variable-blocking stream whose positions cannot be derived
    from frame numbers alone)."""
    from ..index.native_indexer import index_range, native_available
    from ..metadata import probe
    from .decode import _assemble, _run_reconstruct

    if not native_available():
        return None
    meta = probe(data)
    pts = [p for p in meta.seek_points if p[0] <= start_sample]
    if not pts:
        return None
    info = meta.streaminfo
    base_sample, rel_byte, _ = max(pts)
    start_byte = meta.first_frame_byte + rel_byte

    end_sample = start_sample + num_samples
    if info.total_samples:
        end_sample = min(end_sample, info.total_samples)
    if end_sample <= start_sample:
        return None

    # Index forward from the seek point, bounding the scan by a frame
    # size estimate first and extending only if coverage falls short.
    blk = max(info.min_block_size, 1)
    needed_frames = -(-(end_sample - base_sample) // blk) + 2
    frame_cap = max(info.max_frame_size, 1 << 16)
    stop = min(len(data), start_byte + needed_frames * frame_cap)
    plan, landed = index_range(data, start_byte, stop, info)
    if (base_sample + plan.total_samples < end_sample
            and landed < len(data)):
        plan, _ = index_range(data, start_byte, len(data), info)
    covered = base_sample
    f1 = 0
    while f1 < plan.num_frames and covered < end_sample:
        covered += int(plan.block_size[f1])
        f1 += 1
    if f1 == 0 or covered < end_sample:
        return None
    sub = _slice_plan(plan, 0, f1)

    pcm = _run_reconstruct(sub)
    interleaved = _assemble(sub, pcm)
    C = plan.channels
    lo = (start_sample - base_sample) * C
    hi = lo + (end_sample - start_sample) * C
    if lo < 0 or hi > len(interleaved):
        return None
    interleaved = interleaved[lo:hi]
    shift = fmt.normalization_shift(info.bits_per_sample)
    if shift:
        interleaved = interleaved << shift
    return DecodedFLAC(
        channels=C,
        sample_rate=plan.sample_rate,
        bits_per_sample=plan.bits_per_sample,
        interleaved=interleaved,
        stats={"frames": f1, "engine": "seektable",
               "seek_point": base_sample},
    )


def decode_tolerant(data: bytes, max_resyncs: int = 64) -> DecodedFLAC:
    """Error-recovering decode: on a malformed region, resynchronize at
    the next CRC-validated frame and fill the gap with silence at the
    exact sample position recovered from coded numbers. Returns the
    best-effort PCM plus recovery stats (MD5 is reported, not raised).
    """
    from ..index.native_indexer import (
        find_anchor,
        index_range,
        native_available,
    )
    from .decode import _assemble, _run_reconstruct, verify_stream_md5

    if not native_available():
        raise RuntimeError("tolerant decode needs the native indexer")

    br = BitReader(data)
    info = parse_metadata(br)
    pos = br.pos // 8

    segments = []  # (first_sample or None, plan)
    errors = 0
    while pos < len(data) and errors <= max_resyncs:
        # CRC verification on: corrupted residual bits often still parse
        # structurally; the frame CRC-16 localizes the damage so resync
        # skips exactly the bad frame.
        plan, landed, exc = index_range(data, pos, len(data), info,
                                        partial_ok=True, check_crc=True)
        if plan.num_frames:
            segments.append(plan)
        if exc is None:
            break
        errors += 1
        nxt = find_anchor(data, max(landed, pos) + 1, len(data), info)
        if nxt < 0:
            break
        pos = nxt

    if not segments:
        raise FlacError("no decodable frames found")

    C = segments[0].channels
    bps0 = segments[0].bits_per_sample
    dtype = container_dtype(info.bits_per_sample)

    # Absolute first-sample positions from coded numbers.
    def first_sample(plan):
        cn = int(plan.coded_number[0])
        if plan.variable_blocking:
            return cn
        return cn * int(plan.block_size[0])

    placed = [(first_sample(p), p) for p in segments]
    total = max(fs + p.total_samples for fs, p in placed)
    if info.total_samples:
        total = max(total, info.total_samples)
    out = np.zeros(total * C, dtype=dtype)

    for fs, plan in placed:
        pcm = _run_reconstruct(plan)
        part = _assemble(plan, pcm)
        out[fs * C:fs * C + len(part)] = part

    md5_ok = verify_stream_md5(out, info.bits_per_sample, info.md5)
    shift = fmt.normalization_shift(info.bits_per_sample)
    if shift:
        out = out << shift
    return DecodedFLAC(
        channels=C,
        sample_rate=segments[0].sample_rate,
        bits_per_sample=bps0,
        interleaved=out,
        stats={"engine": "tolerant", "resyncs": errors,
               "segments": len(segments), "md5_ok": md5_ok,
               "frames": sum(p.num_frames for p in segments)},
    )
