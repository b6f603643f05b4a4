"""Multi-process (multi-host) long-stream decode over jax.distributed.

This is the executable form of the multi-host claim in longstream.py:
the same boundary-exchange design, but the shards live in DIFFERENT
PROCESSES (each with its own device pool), and the boundary state and
PCM slices cross process boundaries through real XLA collectives on the
global mesh — on a pod these ride ICI/DCN; in the CPU-simulated mode
(SURVEY.md §4) they ride Gloo between local processes.

Per process p of P (after jax.distributed.initialize):
  1. every process parses STREAMINFO and computes the deterministic
     anchor table (sync-scan + CRC-validated frame starts at the P
     byte-range boundaries) — header-scan work only, no decode;
  2. process p indexes and decodes ONLY its own byte range
     [anchor_p, anchor_{p+1});
  3. boundary rows (anchor, landed, frames, samples) cross the global
     mesh via all_gather; every process computes the same prefix-sum
     PCM offsets and verifies chain consistency
     (landed_p == anchor_{p+1}: no gaps, no overlaps);
  4. per-shard PCM slices cross the mesh via a second all_gather
     (padded to the max shard length, exact int32 lanes);
  5. every process assembles the full PCM, verifies the stream MD5
     (zflac.zig:267-280), and returns an identical DecodedFLAC.

Run one process standalone for testing:
  python -m zflac_tpu.parallel.distributed <stream.flac> <out.npy> \
      <coordinator host:port> <process_id> <num_processes>

Counters are exchanged as hi/lo int32 pairs: the transfer lanes stay
int32 (no jax x64 mode), yet byte offsets beyond 2^31 (hour-long
hi-res streams, BASELINE.json config 5) remain exact.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..bitio import BitReader
from ..errors import InvalidChecksum, InvalidFrameHeader
from ..oracle import parse_metadata
from ..utils.log import get_logger

_log_shard = get_logger("shard")

try:
    shard_map = jax.shard_map
except AttributeError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map  # type: ignore


def _global_mesh() -> Mesh:
    """1-D ('dp',) mesh over all global devices, ordered process-major
    so row d // local_device_count belongs to process d of the mesh."""
    devs = sorted(jax.devices(), key=lambda d: (d.process_index, d.id))
    return Mesh(np.asarray(devs), ("dp",))


def _split_i64(row: np.ndarray) -> np.ndarray:
    """int64 [K] -> int32 [2K] as (hi, lo) pairs (exact)."""
    u = row.astype(np.uint64)
    hi = (u >> np.uint64(32)).astype(np.uint32).astype(np.int64)
    lo = (u & np.uint64(0xFFFFFFFF)).astype(np.uint32).astype(np.int64)
    out = np.empty(2 * len(row), dtype=np.int64)
    out[0::2], out[1::2] = hi, lo
    return out.astype(np.uint32).view(np.int32).astype(np.int32)


def _join_i64(pairs: np.ndarray) -> np.ndarray:
    """int32 [..., 2K] (hi, lo) -> int64 [..., K]."""
    u = pairs.view(np.uint32).astype(np.uint64)
    hi, lo = u[..., 0::2], u[..., 1::2]
    return ((hi << np.uint64(32)) | lo).astype(np.int64)


def _allgather_rows(mesh: Mesh, local_row: np.ndarray) -> np.ndarray:
    """Gather one int32 row per PROCESS over the global mesh.

    local_row: [K] int32, this process's contribution (replicated over
    its local devices). Returns [num_processes, K] — identical on
    every process."""
    K = len(local_row)
    L = jax.local_device_count()
    local = np.tile(local_row[None, :], (L, 1))
    sharding = NamedSharding(mesh, P("dp", None))
    garr = jax.make_array_from_process_local_data(sharding, local)
    D = int(mesh.devices.size)

    def body(x):
        g = jax.lax.all_gather(x, "dp").reshape(D, K)
        return jnp.broadcast_to(g[None], (x.shape[0], D, K))

    fn = jax.jit(shard_map(body, mesh=mesh, in_specs=(P("dp", None),),
                           out_specs=P("dp", None, None)))
    out = np.asarray(fn(garr).addressable_shards[0].data)[0]  # [D, K]
    return out[::L][:jax.process_count()]


def decode_longstream_distributed(data: bytes, check_crc: bool = False,
                                  verify_md5: bool = True):
    """Steps 1-5 above. Call in every process of an initialized
    jax.distributed job; every process returns the full result."""
    from ..format import normalization_shift
    from ..index.native_indexer import find_anchor, index_range
    from ..result import DecodedFLAC, container_dtype
    from ..runtime.decode import (
        _assemble,
        _run_reconstruct,
        verify_stream_md5,
    )

    Pn = jax.process_count()
    p = jax.process_index()
    mesh = _global_mesh()

    # 1. deterministic anchor table (identical in every process).
    br = BitReader(data)
    info = parse_metadata(br)
    first = br.pos // 8
    span = len(data) - first
    bounds = [first + span * h // Pn for h in range(Pn + 1)]
    anchors = [first] + [find_anchor(data, bounds[h], bounds[h + 1], info)
                         for h in range(1, Pn)]
    starts = sorted(set(a for a in anchors if a >= 0))

    # 2. index + decode only our own range.
    if p < len(starts):
        a = starts[p]
        stop = starts[p + 1] if p + 1 < len(starts) else len(data)
        plan, landed = index_range(data, a, stop, info,
                                   check_crc=check_crc)
        with jax.default_device(jax.local_devices()[0]):
            part = _assemble(plan, _run_reconstruct(plan))
        row64 = np.array([a, landed, plan.num_frames,
                          plan.total_samples], dtype=np.int64)
    else:  # empty shard (window held no frame start)
        part = np.zeros(0, dtype=container_dtype(info.bits_per_sample))
        row64 = np.array([-1, -1, 0, 0], dtype=np.int64)

    # 3. boundary exchange + chain verify (identical result everywhere).
    g = _join_i64(_allgather_rows(mesh, _split_i64(row64)))  # [Pn, 4]
    _log_shard.debug("process %d/%d boundary rows: %s", p, Pn,
                     g.tolist())
    live = g[g[:, 0] >= 0]
    for h in range(len(live) - 1):
        if live[h, 1] != live[h + 1, 0]:
            raise InvalidFrameHeader(
                f"shard {h} landed at {live[h, 1]}, next anchor "
                f"{live[h + 1, 0]}")
    samples = live[:, 3]
    offsets = np.cumsum(samples) - samples

    # 4. PCM exchange: pad each slice to the global max (in int32
    # lanes; container dtypes are narrower or equal).
    channels = info.channel_count
    max_vals = int(samples.max(initial=0)) * channels
    padded = np.zeros(max_vals, dtype=np.int32)
    padded[:len(part)] = part
    gathered = _allgather_rows(mesh, padded)  # [Pn, max_vals]

    # 5. assemble + verify (every process identically).
    dtype = container_dtype(info.bits_per_sample)
    total = int(samples.sum())
    out = np.empty(total * channels, dtype=dtype)
    for h in range(len(live)):
        n = int(live[h, 3]) * channels
        start = int(offsets[h]) * channels
        out[start:start + n] = gathered[h, :n].astype(dtype)

    if verify_md5:
        if not verify_stream_md5(out, info.bits_per_sample, info.md5):
            raise InvalidChecksum("stream MD5 mismatch")
    shift = normalization_shift(info.bits_per_sample)
    if shift:
        out = out << shift

    return DecodedFLAC(
        channels=channels,
        sample_rate=info.sample_rate,
        bits_per_sample=info.bits_per_sample,
        interleaved=out,
        stats={"shards": len(live), "processes": Pn,
               "frames": int(live[:, 2].sum()),
               "engine": "longstream-distributed"},
    )


def _worker_main(argv) -> int:
    stream_path, out_path, coordinator, pid, nprocs = argv
    jax.distributed.initialize(coordinator_address=coordinator,
                               num_processes=int(nprocs),
                               process_id=int(pid))
    with open(stream_path, "rb") as f:
        data = f.read()
    r = decode_longstream_distributed(data)
    np.save(out_path, r.interleaved)
    print(f"process {pid}/{nprocs}: {r.stats}", flush=True)
    return 0


if __name__ == "__main__":
    import sys

    sys.exit(_worker_main(sys.argv[1:]))
