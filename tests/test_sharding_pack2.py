"""pack2 sharded decode (parallel/shard.py decode_to_device_sharded):
one packed chunk per device over a ('dp',) virtual CPU mesh, full
unpack + reconstruction under shard_map, psum completeness collective —
bit-exact vs the native engine."""

import numpy as np
import pytest

import jax

import zflac_tpu
from zflac_tpu import format as fmt
from zflac_tpu.index.native_indexer import native_available
from zflac_tpu.parallel.shard import (
    decode_to_device_sharded,
    make_mesh,
    sharded_to_host,
)

pytestmark = pytest.mark.skipif(
    not native_available(), reason="native indexer unavailable")


def _cpu_mesh():
    return make_mesh(jax.devices("cpu"))


# Exact corpus keys (zflac_tpu/testing.py). A name miss is a FAILURE,
# not a skip: round 3 shipped with 3 of 9 cases silently skipping on a
# substring mismatch, leaving the sharded path untested on stereo
# decorrelation and escaped partitions.
_CASES = ["lpc order 8", "fixed order 2", "stereo mid_side",
          "stereo left_side", "stereo side_right", "wasted bits",
          "blocksize 1000", "blocksize 16", "escaped partitions",
          "lpc order 32", "hi-res 24/96", "surround 8ch 24bit",
          "partition order 8", "variable blocksize",
          "hi-res 32bit", "hi-res 32bit mid_side",
          "hi-res 32bit left_side"]


def _run_sharded(data, mesh):
    """Dispatch + invariants shared by the cases below. The streams
    here are all inside the pack2 envelope: a decline is a FAILURE."""
    ref = zflac_tpu.decode(data, engine="native")
    r = decode_to_device_sharded(data, mesh)
    assert r is not None, "pack2 sharded declined an admissible stream"
    out, meta = r
    # Leading axis of every round is dp-sharded across the mesh.
    assert isinstance(out, list) and len(out) == meta["rounds"]
    for rnd in out:
        assert rnd.shape[0] == mesh.devices.size
    host = sharded_to_host(out, meta)
    shift = fmt.normalization_shift(meta["bits_per_sample"])
    refv = ref.interleaved >> shift if shift else ref.interleaved
    np.testing.assert_array_equal(host, refv)
    # psum completeness: every device agrees on the global count
    # (summed across rounds).
    totals = np.asarray(meta["psum_samples"])
    assert (totals == totals[0]).all()
    # bssub counts per-subframe, i.e. samples x channels.
    assert int(totals[0]) == meta["channels"] * sum(
        int(b.sum()) for b in meta["block_sizes"])
    return out, meta


@pytest.mark.parametrize("name", _CASES)
def test_sharded_pack2_matches_native(name, corpus):
    assert name in corpus, (
        f"corpus case {name!r} missing — fix the name, don't skip")
    data, pcm, sr, bps = corpus[name]
    _run_sharded(data, _cpu_mesh())


def test_sharded_pack2_single_vs_multi_device(corpus):
    """1-device mesh == 8-device mesh output (device-count invariance,
    SURVEY.md §4's single-vs-multi-chip equivalence requirement)."""
    data, *_ = corpus["lpc order 8"]
    m1 = make_mesh(jax.devices("cpu")[:1])
    m8 = _cpu_mesh()
    r1 = decode_to_device_sharded(data, m1)
    r8 = decode_to_device_sharded(data, m8)
    assert r1 is not None and r8 is not None
    np.testing.assert_array_equal(sharded_to_host(*r1),
                                  sharded_to_host(*r8))


def test_sharded_pack2_multi_round(corpus):
    """A stream needing MORE than one chunk per device dispatches
    ceil(chunks/D) rounds through one compiled executable instead of
    falling back (r4 verdict gap #1): 24 frames in 4-frame chunks over
    a 2-device mesh = 3 rounds, bit-exact vs native."""
    from zflac_tpu.encoder import EncoderConfig, encode
    from zflac_tpu.testing import tone_mix

    pcm = tone_mix(24 * 256, 2, 16, seed=31)     # 24 frames of 256
    data = encode(pcm, 44100, 16, EncoderConfig(block_size=256))
    mesh = make_mesh(jax.devices("cpu")[:2])
    ref = zflac_tpu.decode(data, engine="native")
    r = decode_to_device_sharded(data, mesh, chunk_frames=4)
    assert r is not None
    out, meta = r
    assert meta["rounds"] == 3 and len(out) == 3
    np.testing.assert_array_equal(sharded_to_host(out, meta),
                                  ref.interleaved)


def test_sharded_pack2_unknown_total(corpus):
    """omit_total_samples (STREAMINFO total = 0, legal — the corpus
    case '45 - no total number of samples set' analog) must ride the
    sharded pack2 path via probe-scan estimation, not decline (r4
    verdict gap #1)."""
    from zflac_tpu.encoder import EncoderConfig, encode
    from zflac_tpu.testing import tone_mix

    pcm = tone_mix(40 * 512, 2, 16, seed=33)
    data = encode(pcm, 44100, 16,
                  EncoderConfig(block_size=512,
                                omit_total_samples=True))
    out, meta = _run_sharded(data, _cpu_mesh())
    assert sum(meta["num_frames"]) == 40
