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


@pytest.mark.parametrize("name", _CASES)
def test_sharded_pack2_matches_native(name, corpus):
    assert name in corpus, (
        f"corpus case {name!r} missing — fix the name, don't skip")
    data, pcm, sr, bps = corpus[name]
    mesh = _cpu_mesh()
    ref = zflac_tpu.decode(data, engine="native")
    r = decode_to_device_sharded(data, mesh)
    if r is None:
        pytest.skip("pack2 sharded declined (wide/exotic stream)")
    out, meta = r
    # Leading axis is dp-sharded across the mesh.
    assert out.shape[0] == mesh.devices.size
    host = sharded_to_host(out, meta)
    shift = fmt.normalization_shift(meta["bits_per_sample"])
    refv = ref.interleaved >> shift if shift else ref.interleaved
    np.testing.assert_array_equal(host, refv)
    # psum completeness: every device agrees on the global count.
    totals = np.asarray(meta["psum_samples"])
    assert (totals == totals[0]).all()
    # bssub counts per-subframe, i.e. samples x channels.
    assert int(totals[0]) == meta["channels"] * sum(
        int(b.sum()) for b in meta["block_sizes"])


def test_sharded_pack2_single_vs_multi_device(corpus):
    """1-device mesh == 8-device mesh output (device-count invariance,
    SURVEY.md §4's single-vs-multi-chip equivalence requirement)."""
    data, *_ = corpus["lpc order 8"]
    m1 = make_mesh(jax.devices("cpu")[:1])
    m8 = _cpu_mesh()
    r1 = decode_to_device_sharded(data, m1)
    r8 = decode_to_device_sharded(data, m8)
    if r1 is None or r8 is None:
        pytest.skip("declined")
    np.testing.assert_array_equal(sharded_to_host(*r1),
                                  sharded_to_host(*r8))
