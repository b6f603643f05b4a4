"""Long-stream decode: the time axis sharded across hosts at frame
granularity (the codec analog of context/sequence parallelism,
SURVEY.md §2.3).

Pipeline per shard h of H:
  1. host 0 parses STREAMINFO; broadcast (tiny).
  2. shard h owns byte range [r_h, r_{h+1}); it locates its first frame
     with the sync-scan + CRC-validated anchor search (frame resync —
     a capability the reference lists as TODO, Readme.md:54) and
     indexes whole frames up to the next shard's anchor.
  3. boundary exchange: each shard contributes
     (anchor, landed, frames, samples); an all_gather over the mesh
     gives every shard the global picture, a prefix sum over the
     sample counts assigns global PCM offsets, and chain consistency
     (landed_h == anchor_{h+1}) is verified collectively.
  4. each shard reconstructs its frames with the batched engine and
     writes its slice of the output.
  5. stream MD5 over the assembled PCM (sequential by definition; host).

In one process this runs shards over the virtual device mesh with a
real jax.lax.all_gather for step 3; under jax.distributed the same code
spans hosts, with each shard reading only its byte range.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from ..errors import InvalidFrameHeader
from ..oracle import parse_metadata
from ..bitio import BitReader
from ..plan import StreamPlan
from ..utils.log import get_logger

_log_shard = get_logger("shard")

try:
    shard_map = jax.shard_map
except AttributeError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map  # type: ignore


def _first_frame_byte(data: bytes) -> int:
    br = BitReader(data)
    parse_metadata(br)
    return br.pos // 8


def shard_index(data: bytes, num_shards: int, check_crc: bool = False):
    """Steps 1-2: per-shard range indexing. Returns (info, list of
    (anchor, landed, plan_shard))."""
    from ..index.native_indexer import find_anchor, index_range

    br = BitReader(data)
    info = parse_metadata(br)
    first = br.pos // 8
    span = len(data) - first

    bounds = [first + span * h // num_shards for h in range(num_shards + 1)]
    anchors = []
    for h in range(num_shards):
        if h == 0:
            anchors.append(first)
        else:
            a = find_anchor(data, bounds[h], bounds[h + 1], info)
            anchors.append(a)
    # Shards whose window held no frame start contribute nothing; their
    # range belongs to the previous shard.
    starts = [a for a in anchors if a >= 0]
    starts = sorted(set(starts))

    shards = []
    for i, a in enumerate(starts):
        stop = starts[i + 1] if i + 1 < len(starts) else len(data)
        plan, landed = index_range(data, a, stop, info,
                                   check_crc=check_crc)
        _log_shard.debug("shard %d: anchor=%d landed=%d frames=%d "
                         "samples=%d", i, a, landed, plan.num_frames,
                         plan.total_samples)
        shards.append((a, landed, plan))
    return info, shards


def boundary_exchange(shards, mesh: Mesh):
    """Step 3 on the mesh: all_gather the per-shard boundary state and
    verify chain consistency; returns global per-shard PCM offsets."""
    H = len(shards)
    D = int(mesh.devices.size)
    Hp = -(-H // D) * D  # pad to a multiple of the mesh size
    local = np.zeros((Hp, 4), dtype=np.int64)
    for h, (anchor, landed, plan) in enumerate(shards):
        local[h] = (anchor, landed, plan.num_frames, plan.total_samples)

    def body(x):
        # x: [Hp/D, 4] per device -> gathered [Hp, 4] everywhere.
        g = jax.lax.all_gather(x, "dp").reshape(-1, 4)
        samples = g[:, 3]
        offsets = jnp.cumsum(samples) - samples
        return jnp.broadcast_to(offsets[None, :], (x.shape[0], Hp))

    fn = shard_map(body, mesh=mesh, in_specs=(P("dp", None),),
                   out_specs=P("dp", None))
    # Pass host memory directly: committing to the default device first
    # would force a cross-backend reshard onto the mesh.
    offsets = np.asarray(jax.jit(fn)(local))[0][:H]

    # Chain consistency: each shard's landing byte must be the next
    # shard's anchor (no gaps, no overlaps).
    for h in range(H - 1):
        if shards[h][1] != shards[h + 1][0]:
            raise InvalidFrameHeader(
                f"shard {h} landed at {shards[h][1]}, next anchor "
                f"{shards[h + 1][0]}")
    return offsets


def decode_longstream(data: bytes, num_shards: int, mesh: Mesh,
                      check_crc: bool = False, verify_md5: bool = True):
    """Steps 1-5 in one process (each shard's reconstruction runs through
    the batched engine; the mesh carries the boundary exchange)."""
    from ..format import normalization_shift
    from ..runtime.decode import (
        _assemble,
        _run_reconstruct,
        verify_stream_md5,
    )
    from ..errors import InvalidChecksum
    from ..result import container_dtype

    info, shards = shard_index(data, num_shards, check_crc=check_crc)
    offsets = boundary_exchange(shards, mesh)

    total = sum(p.total_samples for _, _, p in shards)
    channels = shards[0][2].channels
    dtype = container_dtype(info.bits_per_sample)
    out = np.empty(total * channels, dtype=dtype)
    # Reconstruct on the mesh's platform (each shard would run on its
    # own host's devices under jax.distributed).
    with jax.default_device(mesh.devices.flat[0]):
        for h, (_, _, plan) in enumerate(shards):
            pcm = _run_reconstruct(plan)
            part = _assemble(plan, pcm)
            start = int(offsets[h]) * channels
            out[start:start + len(part)] = part

    if verify_md5:
        if not verify_stream_md5(out, info.bits_per_sample, info.md5):
            raise InvalidChecksum("stream MD5 mismatch")
    shift = normalization_shift(info.bits_per_sample)
    if shift:
        out = out << shift

    from ..result import DecodedFLAC
    return DecodedFLAC(
        channels=channels,
        sample_rate=shards[0][2].sample_rate,
        bits_per_sample=shards[0][2].bits_per_sample,
        interleaved=out,
        stats={"shards": len(shards),
               "frames": sum(p.num_frames for _, _, p in shards),
               "engine": "longstream"},
    )
