"""Pipelined (chunked, async-dispatch) decode is bit-identical to the
plain path."""

import numpy as np
import pytest

from conftest import expected_output
from zflac_tpu.encoder import EncoderConfig, encode
from zflac_tpu.index.native_indexer import native_available
from zflac_tpu.runtime.decode import decode_pipelined
from zflac_tpu.testing import correlated_stereo, tone_mix

pytestmark = pytest.mark.skipif(
    not native_available(), reason="native indexer unavailable")


def test_pipelined_bit_exact():
    pcm = correlated_stereo(64 * 1024, 16, seed=31)
    data = encode(pcm, 44100, 16, EncoderConfig(block_size=2048))
    r = decode_pipelined(data, chunk_frames=8)
    assert r.stats["chunks"] > 1
    np.testing.assert_array_equal(r.interleaved, expected_output(pcm, 16))


def test_pipelined_highres():
    pcm = tone_mix(16 * 1024, 2, 24, seed=32)
    data = encode(pcm, 96000, 24, EncoderConfig(block_size=1024))
    r = decode_pipelined(data, chunk_frames=4)
    np.testing.assert_array_equal(r.interleaved, expected_output(pcm, 24))


def test_stream_decode_chunks():
    from zflac_tpu.runtime.decode import stream_decode
    pcm = correlated_stereo(32 * 1024, 16, seed=33)
    data = encode(pcm, 44100, 16, EncoderConfig(block_size=2048))
    chunks = list(stream_decode(data, chunk_frames=4))
    assert len(chunks) >= 2
    np.testing.assert_array_equal(np.concatenate(chunks),
                                  expected_output(pcm, 16))


def test_stream_decode_normalized():
    # 12-bit stream: chunks carry the normalization shift.
    pcm = tone_mix(8 * 1024, 2, 12, seed=34)
    data = encode(pcm, 44100, 12, EncoderConfig(block_size=1024))
    from zflac_tpu.runtime.decode import stream_decode
    out = np.concatenate(list(stream_decode(data, chunk_frames=2)))
    np.testing.assert_array_equal(out, expected_output(pcm, 12))


def test_pipelined_unknown_total_still_chunks():
    """omit_total_samples streams must still pipeline in multiple
    chunks: the chunk-bytes estimate probe-scans instead of trusting
    STREAMINFO total (which previously collapsed to one giant chunk,
    losing the host/device overlap)."""
    pcm = correlated_stereo(32 * 1024, 16, seed=34)
    data = encode(pcm, 44100, 16,
                  EncoderConfig(block_size=1024,
                                omit_total_samples=True))
    r = decode_pipelined(data, chunk_frames=8)
    assert r.stats["chunks"] > 1
    np.testing.assert_array_equal(r.interleaved, expected_output(pcm, 16))
