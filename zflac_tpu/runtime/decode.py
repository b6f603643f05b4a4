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
from ..utils.log import get_logger

_log_stream = get_logger("stream")
_log_frame = get_logger("frame")
_log_kernel = get_logger("kernel")


def _pad_pow2(n: int, lo: int = 1) -> int:
    p = lo
    while p < n:
        p *= 2
    return p


def _bucket_block(b: int) -> int:
    """Pad the sample axis to a lane-friendly size with few distinct
    buckets (recompile control)."""
    return max(128, -(-b // 128) * 128)


def _run_reconstruct(plan: StreamPlan, async_: bool = False):
    """Pad plan arrays to bucketed static shapes and run the jitted
    reconstruction. Returns host PCM [F, B, C] (container dtype), or
    (device array, F) when async_ (dispatch without blocking)."""
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
        kw = dict(
            num_channels=C,
            container_bits=fmt.container_bits(plan.info.bits_per_sample),
            do_decorrelate=bool(
                np.any(plan.channel_code > fmt.CH_INDEPENDENT_MAX)),
            lpc_impl=lpc_impl,
        )
        if not needs_x64:
            # Tunneled-TPU fast path: one buffer, one transfer, one
            # dispatch (runtime/pack.py).
            from .pack import Packer
            from .reconstruct import reconstruct_packed
            p = Packer()
            p.add("rows", rows)
            p.add("kind", kind)
            p.add("order", order)
            p.add("wasted", wasted)
            p.add("shift", shift)
            p.add("coeffs", coeffs)
            p.add("seeds", seeds)
            p.add("channel_code", channel_code)
            for name, idx in class_idx.items():
                p.add("ci_" + name, idx)
            buf, spec = p.finish()
            return reconstruct_packed(
                buf, spec=spec,
                class_names=tuple(sorted(class_idx)), **kw)
        return reconstruct(
            rows, kind, order, wasted, shift, coeffs, seeds, class_idx,
            channel_code, **kw)

    if needs_x64:
        with jax.enable_x64(True):
            pcm = run()
    else:
        pcm = run()
    if async_:
        return pcm, F  # device array (dispatch is asynchronous)
    return np.asarray(pcm)[:F]


def _run_reconstruct_device(plan: StreamPlan, data: bytes,
                            unpack_impl: str = "pallas"):
    """Device-side unpack variant of _run_reconstruct: uploads the
    bitstream windows + plan metadata instead of the decoded rows; Rice
    extraction and reconstruction both run on the accelerator
    (reconstruct_device_unpack). int32 streams only."""
    from ..ops.rice import G, K_INVALID, build_group_inputs
    from .reconstruct import reconstruct_device_unpack

    assert plan.rows.dtype == np.int32
    F = plan.num_frames
    C = plan.channels
    S = plan.num_subframes
    B = plan.max_block
    Bp = _bucket_block(B)
    Fp = _pad_pow2(F)
    Sp = Fp * C

    if plan.groups is None:
        return _run_reconstruct(plan)  # no Rice-coded subframes
    win, pos0, gk, gdepth, gskip, valid = build_group_inputs(data, plan)
    GPB = valid.shape[1]

    # Pad subframe axis: group grid [S, GPB] -> [Sp, GPB] (invalid).
    def pad_groups(a, fill=0):
        out = np.full((Sp, GPB), fill, dtype=a.dtype)
        out[:S] = a.reshape(S, GPB)
        return out.reshape(1, -1)

    win_p = np.zeros((win.shape[0], Sp * GPB), dtype=win.dtype)
    win_p[:, :S * GPB] = win
    pos0 = pad_groups(pos0[0])
    gk = pad_groups(gk[0], fill=K_INVALID)
    gdepth = pad_groups(gdepth[0])
    gskip = pad_groups(gskip[0])
    # Lane padding for the kernel grid.
    NG = Sp * GPB
    NGp = -(-NG // 1024) * 1024
    if NGp != NG:
        pad = NGp - NG
        win_p = np.pad(win_p, ((0, 0), (0, pad)))
        pos0 = np.pad(pos0, ((0, 0), (0, pad)))
        gk = np.pad(gk, ((0, 0), (0, pad)), constant_values=K_INVALID)
        gdepth = np.pad(gdepth, ((0, 0), (0, pad)))
        gskip = np.pad(gskip, ((0, 0), (0, pad)))

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
    warmups = np.zeros((Sp, 32), np.int32)
    warmups[:S, :min(32, B)] = plan.rows[:, :min(32, B)].astype(np.int32)
    bs_sub = pad1(np.repeat(plan.block_size, C), Sp)

    # Sparse patches for kernel-ineligible groups: true row values at
    # positions the kernel cannot produce.
    col = np.arange(Bp)[None, :]
    gv = np.zeros((Sp, GPB), bool)
    gv[:S] = valid
    gv_cols = np.repeat(gv, G, axis=1)[:, :Bp] if GPB * G >= Bp else \
        np.pad(np.repeat(gv, G, axis=1), ((0, 0), (0, Bp - GPB * G)))
    order_p = order[:, None]
    bs_p = bs_sub[:, None]
    need = (~gv_cols) & (col >= order_p) & (col < bs_p)
    need[S:] = False
    rows_host = np.zeros((Sp, Bp), np.int32)
    rows_host[:S, :B] = plan.rows
    pidx = np.nonzero(need.reshape(-1))[0].astype(np.int32)
    pval = rows_host.reshape(-1)[pidx]
    n_p = max(1, _pad_pow2(len(pidx)))
    patch_idx = np.full(n_p, Sp * Bp, np.int32)  # OOB sentinel
    patch_idx[:len(pidx)] = pidx
    patch_val = np.zeros(n_p, np.int32)
    patch_val[:len(pidx)] = pval

    import jax
    try:
        target = jax.config.jax_default_device or jax.devices()[0]
        on_tpu = target.platform == "tpu"
    except RuntimeError:
        on_tpu = False
    if not on_tpu:
        unpack_impl = "jnp"
    lpc_impl = "pallas" if (on_tpu and Bp <= 4096) else "scan"

    class_idx = {}
    for name, idx in plan.classes().items():
        if len(idx) == 0:
            continue
        n = _pad_pow2(len(idx))
        if name == "lpc" and lpc_impl == "pallas":
            n = max(n, 128)
        padded = np.full(n, Sp, dtype=np.int32)
        padded[:len(idx)] = idx
        class_idx[name] = padded

    # Tunneled-TPU fast path: one buffer, one transfer, one dispatch.
    from .pack import Packer
    from .reconstruct import reconstruct_device_unpack_packed
    p = Packer()
    p.add("windows", win_p)
    p.add("pos0", pos0)
    p.add("gk", gk)
    p.add("gdepth", gdepth)
    p.add("gskip", gskip)
    p.add("warmups", warmups)
    p.add("patch_idx", patch_idx)
    p.add("patch_val", patch_val)
    p.add("kind", kind)
    p.add("order", order)
    p.add("wasted", wasted)
    p.add("shift", shift)
    p.add("coeffs", coeffs)
    p.add("seeds", seeds)
    p.add("channel_code", channel_code)
    p.add("bs_sub", bs_sub)
    for name, idx in class_idx.items():
        p.add("ci_" + name, idx)
    buf, spec = p.finish()
    pcm = reconstruct_device_unpack_packed(
        buf, spec=spec, class_names=tuple(sorted(class_idx)),
        num_channels=C,
        container_bits=fmt.container_bits(plan.info.bits_per_sample),
        do_decorrelate=bool(
            np.any(plan.channel_code > fmt.CH_INDEPENDENT_MAX)),
        lpc_impl=lpc_impl, unpack_impl=unpack_impl, B=Bp, gpb=GPB,
    )
    return np.asarray(pcm)[:F]


def _pack_skim(plan: StreamPlan, data: bytes, base_byte: int = 0):
    """Build the packed single-buffer inputs for reconstruct_skim_packed
    from a skim plan (rows=None). base_byte: stream offset of the words
    upload (group bit offsets are rebased against it; the span must stay
    under 2^28 bytes so relative bit offsets fit int32)."""
    from ..ops.rice import G, K_INVALID
    from .pack import Packer

    F = plan.num_frames
    C = plan.channels
    S = plan.num_subframes
    B = plan.max_block
    Bp = _bucket_block(B)
    Fp = _pad_pow2(F)
    Sp = Fp * C
    GPB = -(-Bp // G)

    base_word = base_byte // 4
    span = len(data) - base_word * 4
    assert span * 8 < 2**31, "skim chunk exceeds int32 bit offsets"
    tail = (-span) % 4 + 4 * 16
    words = np.frombuffer(
        data[base_word * 4:] + b"\x00" * tail, dtype=">u4"
    ).astype(np.uint32)

    off32 = np.full((Sp, GPB), -1, dtype=np.int32)
    meta = np.full((Sp, GPB), K_INVALID, dtype=np.int32)
    if plan.groups is not None:
        g = plan.groups
        gpb0 = g["off"].shape[1]
        goff = g["off"] - np.int64(base_word) * 32
        gk = g["k"].astype(np.int32)
        gd = g["depth"].astype(np.int32)
        bad = (g["off"] < 0) | (gk == K_INVALID)
        off32[:S, :gpb0] = np.where(bad, -1, goff).astype(np.int32)
        meta[:S, :gpb0] = np.where(bad, K_INVALID, gk | (gd << 8))

    NG = Sp * GPB
    NGp = -(-NG // 1024) * 1024
    off32 = np.pad(off32.reshape(-1), (0, NGp - NG), constant_values=-1)
    meta = np.pad(meta.reshape(-1), (0, NGp - NG),
                  constant_values=K_INVALID)

    def pad1(a, n, dtype=None):
        out = np.zeros(n, dtype=dtype or a.dtype)
        out[:len(a)] = a
        return out

    kind = pad1(plan.kind, Sp)
    order = pad1(plan.order, Sp)
    warmups = np.zeros((Sp, 32), np.int32)
    warmups[:S] = plan.warmups
    warm_len = np.where(kind == 0, 1, order).astype(np.int32)
    bs_sub = pad1(np.repeat(plan.block_size, C), Sp)

    p_sub, p_pos, p_val = plan.patches
    pidx = p_sub.astype(np.int64) * Bp + p_pos
    n_p = max(1, _pad_pow2(len(pidx)))
    patch_idx = np.full(n_p, Sp * Bp, np.int32)
    patch_idx[:len(pidx)] = pidx.astype(np.int32)
    patch_val = np.zeros(n_p, np.int32)
    patch_val[:len(p_val)] = p_val

    coeffs = np.zeros((Sp, 32), dtype=np.int32)
    coeffs[:S] = plan.coeffs_rev
    seeds = np.zeros((Sp, 4), dtype=np.int32)
    seeds[:S] = plan.fixed_seeds
    channel_code = pad1(plan.channel_code, Fp)

    p = Packer()
    p.add("words", words)
    p.add("off32", off32)
    p.add("meta", meta)
    p.add("warmups", warmups)
    p.add("warm_len", warm_len)
    p.add("patch_idx", patch_idx)
    p.add("patch_val", patch_val)
    p.add("kind", kind)
    p.add("order", order)
    p.add("wasted", pad1(plan.wasted, Sp))
    p.add("shift", pad1(plan.shift, Sp))
    p.add("coeffs", coeffs)
    p.add("seeds", seeds)
    p.add("channel_code", channel_code)
    p.add("bs_sub", bs_sub)

    class_idx = {}
    for name, idx in plan.classes().items():
        if len(idx) == 0:
            continue
        n = max(128, _pad_pow2(len(idx)))
        padded = np.full(n, Sp, dtype=np.int32)
        padded[:len(idx)] = idx
        class_idx[name] = padded
        p.add("ci_" + name, padded)
    buf, spec = p.finish()
    return buf, spec, tuple(sorted(class_idx)), Bp, GPB


def _run_reconstruct_skim(plan: StreamPlan, data: bytes,
                          async_: bool = False):
    """Fully device-side phase 2 from a skim plan. Returns host PCM
    [F, B, C], or the device array + F when async_."""
    import jax

    from .reconstruct import reconstruct_skim_packed

    buf, spec, class_names, Bp, GPB = _pack_skim(plan, data)
    try:
        target = jax.config.jax_default_device or jax.devices()[0]
        on_tpu = target.platform == "tpu"
    except RuntimeError:
        on_tpu = False
    lpc_impl = "pallas" if (on_tpu and Bp <= 4096) else "scan"
    unpack_impl = "pallas" if on_tpu else "jnp"

    pcm = reconstruct_skim_packed(
        buf, spec=spec, class_names=class_names,
        num_channels=plan.channels,
        container_bits=fmt.container_bits(plan.info.bits_per_sample),
        do_decorrelate=bool(
            np.any(plan.channel_code > fmt.CH_INDEPENDENT_MAX)),
        lpc_impl=lpc_impl, unpack_impl=unpack_impl, B=Bp, gpb=GPB)
    if async_:
        return pcm, plan.num_frames
    return np.asarray(pcm)[:plan.num_frames]


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


def decode_pipelined(data: bytes, chunk_frames: int = 64,
                     verify_md5: bool = True) -> DecodedFLAC:
    """Pipeline-parallel decode (the PP axis of SURVEY.md §2.3): the
    host indexes chunk i+1 while the accelerator reconstructs chunk i —
    jax dispatch is asynchronous, so each chunk's reconstruction is
    launched without blocking and collected in order afterwards. Chunks
    pad to the same bucketed shapes, so compilation is reused."""
    from ..bitio import BitReader
    from ..index.native_indexer import index_range, native_available
    from ..oracle import parse_metadata

    if not native_available():
        return decode(data, verify_md5=verify_md5, engine="tpu")

    br = BitReader(data)
    info = parse_metadata(br)
    pos = br.pos // 8
    # Estimate bytes per chunk from the stream size / nominal frames.
    nominal = max(info.max_block_size, 1)
    total_frames = max(1, -(-max(info.total_samples, 1) // nominal))
    chunk_bytes = max(1 << 16,
                      (len(data) - pos) * chunk_frames // total_frames)

    launched = []  # (plan, device_pcm, F)
    while pos < len(data):
        stop = min(pos + chunk_bytes, len(data))
        plan, landed = index_range(data, pos, stop, info)
        if plan.num_frames == 0:
            break
        dev, F = _run_reconstruct(plan, async_=True)  # non-blocking
        launched.append((plan, dev, F))
        if landed <= pos:
            break
        pos = landed

    if not launched:
        return decode(data, verify_md5=verify_md5, engine="tpu")

    C = launched[0][0].channels
    total = sum(p.total_samples for p, _, _ in launched)
    dtype = container_dtype(info.bits_per_sample)
    out = np.empty(total * C, dtype=dtype)
    at = 0
    for plan, dev, F in launched:
        pcm = np.asarray(dev)[:F]   # blocks; later chunks still running
        part = _assemble(plan, pcm)
        out[at:at + len(part)] = part
        at += len(part)

    if verify_md5:
        if not verify_stream_md5(out, info.bits_per_sample, info.md5):
            raise InvalidChecksum("stream MD5 mismatch")
    shift = fmt.normalization_shift(info.bits_per_sample)
    if shift:
        out = out << shift
    return DecodedFLAC(
        channels=C,
        sample_rate=launched[0][0].sample_rate,
        bits_per_sample=launched[0][0].bits_per_sample,
        interleaved=out,
        stats={"engine": "pipelined", "chunks": len(launched),
               "frames": sum(p.num_frames for p, _, _ in launched)},
    )


def stream_decode(data: bytes, chunk_frames: int = 64):
    """Streaming decode: yields interleaved PCM chunks (normalized
    container samples) as they are produced, overlapping host indexing
    with device compute like decode_pipelined. The playback-style
    consumer API (the reference's example app pumps samples from a
    callback, examples/example.zig)."""
    from ..bitio import BitReader
    from ..index.native_indexer import index_range, native_available
    from ..oracle import parse_metadata

    br = BitReader(data)
    info = parse_metadata(br)
    pos = br.pos // 8
    shift = fmt.normalization_shift(info.bits_per_sample)

    if not native_available():
        r = decode(data, verify_md5=False)
        yield r.interleaved
        return

    nominal = max(info.max_block_size, 1)
    total_frames = max(1, -(-max(info.total_samples, 1) // nominal))
    chunk_bytes = max(1 << 16,
                      (len(data) - pos) * chunk_frames // total_frames)

    pending = None  # (plan, device array, F)
    while pos < len(data):
        stop = min(pos + chunk_bytes, len(data))
        plan, landed = index_range(data, pos, stop, info)
        if plan.num_frames == 0:
            break
        launched = (plan, *_run_reconstruct(plan, async_=True))
        if pending is not None:
            p, dev, F = pending
            part = _assemble(p, np.asarray(dev)[:F])
            yield part << shift if shift else part
        pending = launched
        if landed <= pos:
            break
        pos = landed
    if pending is not None:
        p, dev, F = pending
        part = _assemble(p, np.asarray(dev)[:F])
        yield part << shift if shift else part


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
    arr, meta = decode_native_parallel(data, check_crc=check_crc,
                                       compute_md5=verify_md5)
    si_bps = meta["si_bits_per_sample"]
    _log_stream.debug(
        "decode: %d bytes -> %d frames, engine=native (per-frame trace:"
        " ZFLAC_TPU_LOG reaches the C++ engine too)", len(data),
        meta["frames"])
    if verify_md5:
        # The digest is computed inline by the native decoder,
        # overlapped with the decode itself; fall back to the host hash
        # if it wasn't produced.
        if meta["computed_md5"] is not None:
            if meta["computed_md5"] != meta["md5"]:
                raise InvalidChecksum("stream MD5 mismatch")
        elif not verify_stream_md5(arr, si_bps, meta["md5"]):
            raise InvalidChecksum("stream MD5 mismatch")
    shift = fmt.normalization_shift(si_bps)
    if shift:
        # In place: the array exclusively owns the engine's buffer, and
        # a copying shift would add a full extra pass + allocation.
        if arr.flags.writeable:
            np.left_shift(arr, shift, out=arr)
        else:
            arr = arr << shift
    return DecodedFLAC(
        channels=meta["channels"] or meta.get("si_channels", 1),
        sample_rate=meta["sample_rate"],
        bits_per_sample=meta["bits_per_sample"] or si_bps,
        interleaved=arr,
        stats={"frames": meta["frames"], "engine": "native"},
    )


def decode(data: bytes, check_crc: bool = False, verify_md5: bool = True,
           prefer_native: bool = True, safe_lpc: bool = False,
           engine: str = "auto",
           device_unpack: bool = False) -> DecodedFLAC:
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
    device_unpack: tpu engine uploads the *bitstream windows* and runs
    Rice extraction in the Pallas bit-unpack kernel on the accelerator
    (ops/rice.py) instead of uploading host-decoded residual rows.
    """
    if engine not in ("auto", "tpu", "native"):
        # Unknown strings must not fall through to a default path: a
        # typo'd engine= would silently test the wrong engine.
        raise ValueError(
            f"unknown engine {engine!r}; expected 'auto', 'tpu', or "
            "'native' (the scalar oracle is zflac_tpu.decode_oracle)")
    if engine == "auto":
        from ..index.native_indexer import native_available
        engine = "native" if (native_available() and prefer_native
                              and not safe_lpc) else "tpu"
    if engine == "native":
        return _decode_native(data, check_crc, verify_md5)

    plan = None
    if device_unpack and not safe_lpc and prefer_native:
        # Measure-only skim index: no residual rows on the host at all;
        # the accelerator recomputes them from the bitstream.
        from ..index.native_indexer import native_available
        if native_available():
            from ..index.native_indexer import build_plan_skim
            plan = build_plan_skim(data, check_crc=check_crc)
    if plan is None:
        plan = build_plan(data, check_crc=check_crc,
                          prefer_native=prefer_native,
                          emit_groups=device_unpack)
    if safe_lpc and plan.rows.dtype == np.int32:
        plan.wide = (plan.kind == 3)
    dtype = container_dtype(plan.info.bits_per_sample)

    if _log_stream.isEnabledFor(10):
        _log_stream.debug(
            "decode: %d bytes sr=%d ch=%d bps=%d frames=%d subframes=%d",
            len(data), plan.info.sample_rate, plan.info.channel_count,
            plan.info.bits_per_sample, plan.num_frames,
            plan.num_subframes)
    if _log_frame.isEnabledFor(10) and plan.num_frames:
        for f in range(plan.num_frames):
            _log_frame.debug("frame %d @%d bs=%d ch_code=%d", f,
                             plan.frame_byte_offset[f],
                             plan.block_size[f], plan.channel_code[f])

    if plan.num_frames == 0:
        interleaved = np.zeros(0, dtype=dtype)
        path = "empty"
    else:
        from ..utils.profiler import maybe_trace
        with maybe_trace("zflac_tpu.decode"):
            if plan.rows is None:
                pcm = _run_reconstruct_skim(plan, data)
                path = "skim"
            elif device_unpack and plan.rows.dtype == np.int32:
                pcm = _run_reconstruct_device(plan, data)
                path = "device_unpack"
            else:
                pcm = _run_reconstruct(plan)
                path = "rows"
            interleaved = _assemble(plan, pcm)
        _log_kernel.debug("reconstruct path=%s classes=%s", path,
                          {k: len(v) for k, v in plan.classes().items()
                           if len(v)})

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
    stats["path"] = path
    return DecodedFLAC(
        channels=plan.channels or plan.info.channel_count,
        sample_rate=plan.sample_rate or plan.info.sample_rate,
        bits_per_sample=plan.bits_per_sample
        or plan.info.bits_per_sample,
        interleaved=interleaved,
        stats=stats,
    )
