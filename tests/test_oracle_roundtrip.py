"""Encoder -> oracle round-trip over the synthesized conformance corpus:
decoded PCM must equal the encoder input bit-exactly (after container
normalization), and the stream MD5 must verify. This pins down both the
encoder and the oracle (independent bit packers/parsers)."""

import numpy as np
import pytest

from conftest import expected_output
from zflac_tpu import decode_oracle
from zflac_tpu.testing import make_corpus

_NAMES = sorted(make_corpus().keys())


@pytest.mark.parametrize("name", _NAMES)
def test_roundtrip(name, corpus):
    data, pcm, sr, bps = corpus[name]
    r = decode_oracle(data)
    assert r.channels == pcm.shape[1]
    assert r.num_samples == pcm.shape[0]
    np.testing.assert_array_equal(r.interleaved, expected_output(pcm, bps))


@pytest.mark.parametrize("name", _NAMES[::5])
def test_roundtrip_crc(name, corpus):
    """CRC-8/16 written by the encoder verify under the oracle."""
    data, pcm, sr, bps = corpus[name]
    decode_oracle(data, check_crc=True)
