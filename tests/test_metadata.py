"""Metadata probe: blocks the reference skips (zflac.zig:243-247) are
surfaced as structured data; encoder round-trip plus the real-libflac
golden stream pin the parsing."""

import numpy as np
import pytest

from test_golden import EXAMPLE_2
from zflac_tpu import decode, errors
from zflac_tpu.encoder import EncoderConfig, encode
from zflac_tpu.metadata import probe
from zflac_tpu.testing import tone_mix


def test_probe_roundtrip():
    pcm = tone_mix(8192, 2, 16, seed=1)
    data = encode(pcm, 44100, 16, EncoderConfig(
        block_size=1024, tags={"TITLE": "t", "ARTIST": "a"},
        padding=128, seektable_every=2048))
    m = probe(data)
    assert m.tags == {"TITLE": ["t"], "ARTIST": ["a"]}
    assert m.padding_bytes == 128
    assert len(m.seek_points) == 4
    assert m.streaminfo.total_samples == 8192
    # Seek offsets are relative to the first frame byte and land on a
    # frame sync.
    for sample, off, ns in m.seek_points:
        assert data[m.first_frame_byte + off] == 0xFF
    # Stream with metadata blocks still decodes bit-exactly.
    r = decode(data)
    assert r.num_samples == 8192


def test_probe_golden_libflac():
    m = probe(EXAMPLE_2)
    assert m.vendor == "reference libFLAC 1.3.3 20190804"
    assert m.tags == {"TITLE": ["שלום"]}
    assert m.padding_bytes == 6


def test_probe_errors():
    with pytest.raises(errors.InvalidSignature):
        probe(b"nope" + bytes(64))
    with pytest.raises(errors.MissingStreaminfo):
        probe(b"fLaC" + bytes([0x81, 0, 0, 0]))
