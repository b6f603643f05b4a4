"""Long-stream sharded decode: byte-range sharding with frame resync
and boundary exchange over the mesh must be bit-identical to the
single-shard decode (BASELINE.json config 5 semantics, tested on the
virtual CPU mesh)."""

import numpy as np
import pytest

import jax

from conftest import expected_output
from zflac_tpu.encoder import EncoderConfig, encode
from zflac_tpu.index.native_indexer import find_anchor, native_available
from zflac_tpu.oracle import parse_metadata
from zflac_tpu.bitio import BitReader
from zflac_tpu.parallel import make_mesh
from zflac_tpu.parallel.longstream import decode_longstream, shard_index
from zflac_tpu.testing import correlated_stereo, tone_mix

pytestmark = pytest.mark.skipif(
    not native_available(), reason="native indexer unavailable")


def cpu_mesh(n):
    devs = jax.devices("cpu")
    if len(devs) < n:
        pytest.skip(f"need {n} cpu devices")
    return make_mesh(devs[:n])


@pytest.mark.parametrize("shards", [2, 4, 8])
def test_longstream_bit_exact(shards, corpus=None):
    pcm = correlated_stereo(64 * 1024, 16, seed=9)
    data = encode(pcm, 44100, 16, EncoderConfig(block_size=4096))
    r = decode_longstream(data, shards, cpu_mesh(shards))
    assert r.stats["shards"] >= 1
    np.testing.assert_array_equal(r.interleaved, expected_output(pcm, 16))


def test_longstream_highres():
    pcm = tone_mix(16 * 1024, 2, 24, seed=10)
    data = encode(pcm, 96000, 24, EncoderConfig(block_size=2048))
    r = decode_longstream(data, 4, cpu_mesh(4))
    np.testing.assert_array_equal(r.interleaved, expected_output(pcm, 24))


def test_anchor_resync_finds_frames():
    """The anchor search locates true frame starts from arbitrary byte
    positions (frame resync)."""
    pcm = correlated_stereo(16 * 1024, 16, seed=11)
    data = encode(pcm, 44100, 16, EncoderConfig(block_size=1024))
    from zflac_tpu.index import build_plan_py
    plan = build_plan_py(data)
    br = BitReader(data)
    info = parse_metadata(br)
    true_starts = set(int(x) for x in plan.frame_byte_offset)
    # From the middle of each frame, the anchor must be the next true
    # frame start.
    for f in range(0, plan.num_frames - 1, 3):
        mid = int(plan.frame_byte_offset[f]) + 7
        a = find_anchor(data, mid, len(data), info)
        assert a in true_starts and a > mid


def test_shard_index_covers_all_frames():
    pcm = correlated_stereo(32 * 1024, 16, seed=12)
    data = encode(pcm, 44100, 16, EncoderConfig(block_size=2048))
    from zflac_tpu.index import build_plan_py
    plan = build_plan_py(data)
    info, shards = shard_index(data, 4)
    assert sum(p.num_frames for _, _, p in shards) == plan.num_frames
    got_offsets = np.concatenate(
        [p.frame_byte_offset for _, _, p in shards])
    np.testing.assert_array_equal(got_offsets, plan.frame_byte_offset)
