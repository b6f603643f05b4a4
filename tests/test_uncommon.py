"""Uncommon-stream suite: extreme-but-legal configurations must decode
(mirrors /root/reference/tests/std_uncommon.zig:33-51 — 32 bps, 768 kHz,
15-bit, blocksize 65535, partition order 15)."""

import numpy as np
import pytest

import zflac_tpu
from conftest import expected_output
from zflac_tpu.encoder import EncoderConfig, encode
from zflac_tpu.testing import tone_mix

DECODERS = [zflac_tpu.decode_oracle, zflac_tpu.decode]


def roundtrip(decode, pcm, sr, bps, cfg):
    data = encode(pcm, sr, bps, cfg)
    r = decode(data)
    np.testing.assert_array_equal(r.interleaved, expected_output(pcm, bps))
    return r


@pytest.mark.parametrize("decode", DECODERS)
def test_32bps(decode):
    roundtrip(decode, tone_mix(2048, 2, 32, seed=1), 48000, 32,
              EncoderConfig(block_size=512))


@pytest.mark.parametrize("decode", DECODERS)
def test_768khz(decode):
    r = roundtrip(decode, tone_mix(2048, 2, 16, seed=2), 768000, 16,
                  EncoderConfig(block_size=512))
    assert r.sample_rate == 768000  # via the 16-bit Hz/10 uncommon path


@pytest.mark.parametrize("decode", DECODERS)
def test_15bit(decode):
    # 15 bps has no frame-header code: stored via STREAMINFO (bd code 0).
    r = roundtrip(decode, tone_mix(2048, 2, 15, seed=3), 44100, 15,
                  EncoderConfig(block_size=512, bps_from_streaminfo=True))
    assert r.bits_per_sample == 15


@pytest.mark.parametrize("decode", DECODERS)
def test_blocksize_65535(decode):
    roundtrip(decode, tone_mix(65535, 1, 16, seed=4), 44100, 16,
              EncoderConfig(block_size=65535, max_lpc_order=2))


@pytest.mark.parametrize("decode", DECODERS)
def test_partition_order_15(decode):
    roundtrip(decode, tone_mix(1 << 15, 1, 16, seed=5), 44100, 16,
              EncoderConfig(block_size=1 << 15, partition_order=15,
                            max_lpc_order=0, subframe_mode=("fixed", 1)))


@pytest.mark.parametrize("decode", DECODERS)
def test_mono_and_8ch(decode):
    roundtrip(decode, tone_mix(1024, 1, 16, seed=6), 8000, 16,
              EncoderConfig(block_size=256))
    roundtrip(decode, tone_mix(1024, 8, 16, seed=7), 8000, 16,
              EncoderConfig(block_size=256))


@pytest.mark.parametrize("decode", DECODERS)
def test_tiny_blocks(decode):
    roundtrip(decode, tone_mix(64, 2, 16, seed=8), 44100, 16,
              EncoderConfig(block_size=16, max_lpc_order=2))
