"""Edge-of-envelope streams: tiny counts, block size 1, empty streams,
unknown totals."""

import numpy as np
import pytest

import zflac_tpu
from conftest import expected_output
from zflac_tpu.encoder import EncoderConfig, encode
from zflac_tpu.testing import tone_mix

DECODERS = [zflac_tpu.decode_oracle, zflac_tpu.decode]


@pytest.mark.parametrize("decode", DECODERS)
def test_single_sample_stream(decode):
    pcm = np.array([[1234, -4321]], dtype=np.int64)
    data = encode(pcm, 44100, 16, EncoderConfig(block_size=4096))
    r = decode(data)
    np.testing.assert_array_equal(r.interleaved, expected_output(pcm, 16))


@pytest.mark.parametrize("decode", DECODERS)
def test_final_block_size_one(decode):
    # A last frame of block size 1 is legal (zflac.zig:404-405).
    pcm = tone_mix(4097, 1, 16, seed=1)
    data = encode(pcm, 44100, 16, EncoderConfig(block_size=4096))
    r = decode(data)
    np.testing.assert_array_equal(r.interleaved, expected_output(pcm, 16))


@pytest.mark.parametrize("decode", DECODERS)
def test_empty_stream(decode):
    pcm = np.zeros((0, 2), dtype=np.int64)
    data = encode(pcm, 44100, 16, EncoderConfig())
    r = decode(data)
    assert r.num_samples == 0


@pytest.mark.parametrize("decode", DECODERS)
def test_unknown_total_with_tiny_frames(decode):
    pcm = tone_mix(100, 2, 16, seed=2)
    data = encode(pcm, 44100, 16,
                  EncoderConfig(block_size=16, omit_total_samples=True))
    r = decode(data)
    np.testing.assert_array_equal(r.interleaved, expected_output(pcm, 16))


@pytest.mark.parametrize("decode", DECODERS)
def test_wrong_total_grows(decode):
    # STREAMINFO claims fewer samples than the stream carries
    # (zflac.zig:394-402 growth; the total becomes untrusted).
    pcm = tone_mix(3000, 2, 16, seed=3)
    data = encode(pcm, 44100, 16,
                  EncoderConfig(block_size=512,
                                total_samples_fudge=-1500))
    r = decode(data, verify_md5=True)
    np.testing.assert_array_equal(r.interleaved, expected_output(pcm, 16))


@pytest.mark.parametrize("decode", DECODERS)
def test_8bit_minimum_depth(decode):
    pcm = tone_mix(500, 1, 8, seed=4)
    data = encode(pcm, 8000, 8, EncoderConfig(block_size=256))
    r = decode(data)
    assert r.interleaved.dtype == np.int8
    np.testing.assert_array_equal(r.interleaved, expected_output(pcm, 8))


def test_declared_total_cuts_at_frame_boundary():
    """STREAMINFO claims FEWER samples, landing exactly on a frame
    boundary several frames early: decoding stops there (whole trailing
    frames dropped, zflac.zig:343-350), on every engine including the
    device path (which must drop more than one trailing block). The
    stream MD5 covers the full input, so default decode raises
    InvalidChecksum like the reference would."""
    import zflac_tpu.errors as err
    from zflac_tpu.runtime.device import decode_to_device

    pcm = tone_mix(3072, 2, 16, seed=9)   # 6 frames of 512
    declared = 1024                        # cut 4 whole frames
    data = encode(pcm, 44100, 16,
                  EncoderConfig(block_size=512,
                                total_samples_fudge=declared - 3072))
    with pytest.raises(err.InvalidChecksum):
        zflac_tpu.decode(data)
    # "oracle" is NOT a decode() engine (r4 verdict: the string fell
    # through to the tpu path and the oracle was never exercised here).
    runs = [zflac_tpu.decode_oracle(data, verify_md5=False)]
    runs += [zflac_tpu.decode(data, engine=eng, verify_md5=False)
             for eng in ("native", "tpu")]
    for r in runs:
        assert r.num_samples == declared
        np.testing.assert_array_equal(
            r.interleaved, expected_output(pcm[:declared], 16))
    # Plain fixed-predictor 16-bit stereo is squarely inside the pack2
    # envelope: a decline would silently skip the device-path check.
    dd = decode_to_device(data)
    assert dd is not None, "pack2 declined an admissible stream"
    host = dd.to_host(verify_md5=False)
    assert host.num_samples == declared
    np.testing.assert_array_equal(
        host.interleaved, expected_output(pcm[:declared], 16))


def test_unknown_engine_rejected():
    pcm = tone_mix(64, 1, 16, seed=5)
    data = encode(pcm, 44100, 16, EncoderConfig(block_size=64))
    with pytest.raises(ValueError, match="unknown engine"):
        zflac_tpu.decode(data, engine="oracle")
