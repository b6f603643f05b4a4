"""Real-hardware smoke test: end-to-end decode with the reconstruction
kernels compiled for the TPU backend (skipped when no TPU is attached).
The bulk of the suite pins itself to CPU for compile speed; this keeps
the actual target hardware exercised."""

import numpy as np
import pytest

import jax

from conftest import expected_output
from zflac_tpu.encoder import EncoderConfig, encode
from zflac_tpu.testing import correlated_stereo, tone_mix


def _tpu():
    try:
        return [d for d in jax.devices() if d.platform == "tpu"]
    except RuntimeError:
        return []


pytestmark = pytest.mark.skipif(not _tpu(), reason="no TPU attached")


@pytest.mark.parametrize("bps,n", [(16, 8192), (24, 4096)])
def test_tpu_decode(bps, n):
    from zflac_tpu.runtime.decode import _assemble, _run_reconstruct
    from zflac_tpu.index import build_plan

    pcm = (correlated_stereo(n, bps, seed=1) if bps == 16
           else tone_mix(n, 2, bps, seed=2))
    data = encode(pcm, 48000, bps, EncoderConfig(block_size=1024))
    plan = build_plan(data)
    with jax.default_device(_tpu()[0]):
        out = _run_reconstruct(plan)
    interleaved = _assemble(plan, out)
    # pre-normalization comparison
    np.testing.assert_array_equal(
        interleaved.astype(np.int64),
        pcm.reshape(-1).astype(np.int64))


def _stream(bps, n, ch=2, block=1024):
    pcm = (correlated_stereo(n, bps, seed=1) if ch == 2 and bps == 16
           else tone_mix(n, ch, bps, seed=2))
    return pcm, encode(pcm, 48000, bps, EncoderConfig(block_size=block))


@pytest.mark.parametrize("bps,ch,mode",
                         [(16, 2, None), (16, 2, "mid_side"),
                          (8, 2, None), (24, 2, None), (24, 8, None),
                          (32, 2, "independent"), (32, 2, "mid_side"),
                          (32, 2, "left_side")])
def test_tpu_pack2(bps, ch, mode):
    """Device-resident pack2 path on hardware: rice16 G8 unpack +
    lpc2 (int32) / lpc2w (hi/lo wide, 17-32 bps) / lpc2w33 (33-bit
    side-channel pair) Pallas kernels, bit-exact vs the native host
    engine. The 32-bit mid-side/left-side cases run the wide pair
    chunks (runtime/wide.py) end to end on the chip."""
    import zflac_tpu
    from zflac_tpu.index.native_indexer import native_available

    if not native_available():
        pytest.skip("native indexer unavailable")
    pcm, data = _stream(bps, 4096 if ch == 8 else 8192, ch=ch)
    if mode is not None:
        pcm = correlated_stereo(8192, bps, seed=1)
        data = encode(pcm, 48000, bps, EncoderConfig(
            block_size=1024, stereo_mode=mode))
    with jax.default_device(_tpu()[0]):
        dd = zflac_tpu.decode_to_device(data)
        assert dd is not None, "pack2 declined an admissible stream"
        out = dd.to_host()
    ref = zflac_tpu.decode(data, engine="native")
    np.testing.assert_array_equal(out.interleaved, ref.interleaved)


def test_tpu_pack2_sharded_mesh():
    """The sharded pack2 path on a REAL TPU mesh (1 chip on this host):
    the full Pallas kernel set (rice16 4-D rows, wide-lane lpc2,
    packtail scalar-prefetch tail) traced and executed under shard_map
    with the psum collective — the composition a pod runs per chip."""
    import zflac_tpu
    from zflac_tpu.encoder import EncoderConfig, encode
    from zflac_tpu.index.native_indexer import native_available
    from zflac_tpu.parallel.shard import (decode_to_device_sharded,
                                          make_mesh, sharded_to_host)

    if not native_available():
        pytest.skip("native indexer unavailable")
    mesh = make_mesh(_tpu()[:1])
    data = encode(correlated_stereo(60000, 16, seed=9), 44100, 16,
                  EncoderConfig(block_size=1024,
                                stereo_mode="mid_side"))
    r = decode_to_device_sharded(data, mesh)
    assert r is not None, "pack2 sharded declined an admissible stream"
    host = sharded_to_host(*r)
    ref = zflac_tpu.decode(data, engine="native")
    np.testing.assert_array_equal(host, ref.interleaved)
