"""Differential tests: production engine (indexer + batched XLA
reconstruction) vs the oracle / encoder ground truth over the full
synthesized conformance corpus."""

import numpy as np
import pytest

from conftest import expected_output
from zflac_tpu import decode
from zflac_tpu.testing import make_corpus

_NAMES = sorted(make_corpus().keys())


@pytest.mark.parametrize("engine", ["tpu", "auto"])
@pytest.mark.parametrize("name", _NAMES)
def test_engine_matches_truth(name, engine, corpus):
    data, pcm, sr, bps = corpus[name]
    r = decode(data, engine=engine)
    assert r.channels == pcm.shape[1]
    assert r.num_samples == pcm.shape[0]
    np.testing.assert_array_equal(r.interleaved, expected_output(pcm, bps))


@pytest.mark.parametrize("engine", ["tpu", "auto"])
@pytest.mark.parametrize("name", _NAMES[::4])
def test_engine_crc(name, engine, corpus):
    data, pcm, sr, bps = corpus[name]
    decode(data, check_crc=True, engine=engine)
