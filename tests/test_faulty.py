"""Faulty-stream suite: corrupted inputs map to the exact typed errors,
mirroring the reference's error API tests
(/root/reference/tests/std_faulty.zig:17-61). The corpus submodule is
empty in the reference snapshot, so corruptions are synthesized here by
patching known byte offsets (frame table) or hand-crafting streams."""

import numpy as np
import pytest

import zflac_tpu
from zflac_tpu import errors
from zflac_tpu.bitio import BitWriter
from zflac_tpu.crc import crc8
from zflac_tpu.encoder import EncoderConfig, encode
from zflac_tpu.index import build_plan_py
from zflac_tpu.testing import tone_mix

DECODERS = [zflac_tpu.decode_oracle, zflac_tpu.decode]


def _stream(**cfg):
    pcm = tone_mix(2048, 2, 16, seed=1)
    return bytearray(encode(pcm, 44100, 16,
                            EncoderConfig(block_size=512, **cfg)))


def _frame_offsets(data):
    return build_plan_py(bytes(data)).frame_byte_offset


def _patch_frame_header(data, frame, transform):
    """Apply `transform` to the 4 header bytes of frame `frame` and fix
    up the header CRC-8 so crc-checking decoders behave identically."""
    data = bytearray(data)
    off = int(_frame_offsets(data)[frame])
    hdr = int.from_bytes(data[off:off + 4], "big")
    hdr = transform(hdr)
    data[off:off + 4] = hdr.to_bytes(4, "big")
    # find CRC position: 4 header bytes + coded number length
    first = data[off + 4]
    nbytes = 8 - ((first ^ 0xFF).bit_length())
    crc_pos = off + 4 + max(1, nbytes)
    data[crc_pos] = crc8(bytes(data[off:crc_pos]))
    return bytes(data)


@pytest.mark.parametrize("decode", DECODERS)
class TestFaulty:
    def test_missing_signature(self, decode):
        data = _stream()
        with pytest.raises(errors.InvalidSignature):
            decode(b"XLaC" + bytes(data[4:]))

    def test_truncated(self, decode):
        data = _stream()
        with pytest.raises(errors.EndOfStream):
            decode(bytes(data[:len(data) * 2 // 3]))

    def test_invalid_metadata_type(self, decode):
        data = _stream()
        with pytest.raises(errors.InvalidMetadataHeader):
            decode(bytes(data[:4]) + bytes([0x80 | 99]) + bytes(data[5:]))

    def test_missing_streaminfo(self, decode):
        # Signature followed by a last-block PADDING only.
        bw = BitWriter()
        bw.write_bytes(b"fLaC")
        bw.write_bits(1, 1)
        bw.write_bits(1, 7)       # padding
        bw.write_bits(0, 24)
        with pytest.raises(errors.MissingStreaminfo):
            decode(bw.getvalue())

    def test_md5_mismatch(self, decode):
        data = _stream()
        off = int(_frame_offsets(data)[1])
        data[off + 20] ^= 0x10  # flip a residual bit in frame 1
        with pytest.raises(errors.InvalidChecksum):
            decode(bytes(data))

    def test_crc_detects_before_md5(self, decode):
        data = _stream()
        off = int(_frame_offsets(data)[1])
        data[off + 20] ^= 0x10
        with pytest.raises(errors.InvalidChecksum, match="CRC"):
            decode(bytes(data), check_crc=True)

    def test_sample_rate_change(self, decode):
        # Patch frame 2's sample-rate code 44.1k -> 48k
        # (zflac.zig:391 InconsistentParameters).
        data = _patch_frame_header(
            _stream(), 2,
            lambda h: (h & ~(0xF << 8)) | (0b1010 << 8))
        with pytest.raises(errors.InconsistentParameters):
            decode(data)

    def test_bit_depth_change(self, decode):
        data = _patch_frame_header(
            _stream(), 2,
            lambda h: (h & ~(0x7 << 1)) | (0b001 << 1))  # 16 -> 8 bps
        with pytest.raises(errors.InconsistentParameters):
            decode(data)

    def test_channel_count_change(self, decode):
        data = _patch_frame_header(
            _stream(stereo_mode="independent"), 2,
            lambda h: (h & ~(0xF << 4)) | (0b0000 << 4))  # stereo -> mono
        with pytest.raises(errors.InconsistentParameters):
            decode(data)

    def test_stereo_mode_change_is_legal(self, decode):
        # Decorrelation mode may change mid-stream (count stays 2):
        # the encoder's default cycling already produces this.
        decode(bytes(_stream(stereo_mode=None)))

    def test_reserved_block_size(self, decode):
        data = _patch_frame_header(
            _stream(), 1, lambda h: h & ~(0xF << 12))  # code 0
        with pytest.raises(errors.InvalidFrameHeader):
            decode(data)

    def test_forbidden_sample_rate(self, decode):
        data = _patch_frame_header(
            _stream(), 1, lambda h: h | (0xF << 8))
        with pytest.raises(errors.InvalidFrameHeader):
            decode(data)

    def test_invalid_coded_number(self, decode):
        data = _stream()
        off = int(_frame_offsets(data)[1])
        data[off + 4] = 0xFF
        with pytest.raises(errors.InvalidCodedNumber):
            decode(bytes(data))

    def test_continuation_first_coded_number(self, decode):
        data = _stream()
        off = int(_frame_offsets(data)[1])
        data[off + 4] = 0x80  # lone continuation byte
        with pytest.raises(errors.InvalidCodedNumber):
            decode(bytes(data))

    def test_bad_sync(self, decode):
        data = _stream()
        off = int(_frame_offsets(data)[1])
        data[off] = 0x00
        with pytest.raises(errors.InvalidFrameHeader):
            decode(bytes(data))

    def test_garbage_after_final_frame_ok(self, decode):
        data = _stream()
        decode(bytes(data) + b"\x00" * 64)

    def test_truncated_when_total_known(self, decode):
        # Cut the last frame entirely: EOF with a known total is an
        # error (zflac.zig:344).
        data = _stream()
        off = int(_frame_offsets(data)[3])
        with pytest.raises(errors.EndOfStream):
            decode(bytes(data[:off]))
