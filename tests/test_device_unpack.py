"""Fully device-side decode (bitstream-window upload + on-accelerator
Rice extraction + reconstruction) must match the ground truth across
the corpus. On CPU the unpack math runs as plain XLA ops; the compiled
Pallas kernels are exercised by the TPU smoke/bench paths."""

import numpy as np
import pytest

from conftest import expected_output
from zflac_tpu import decode
from zflac_tpu.index.native_indexer import native_available
from zflac_tpu.testing import make_corpus

pytestmark = pytest.mark.skipif(
    not native_available(), reason="native indexer unavailable")

_NAMES = sorted(make_corpus().keys())


@pytest.mark.parametrize("name", _NAMES)
def test_device_unpack_matches_truth(name, corpus):
    data, pcm, sr, bps = corpus[name]
    r = decode(data, engine="tpu", device_unpack=True)
    np.testing.assert_array_equal(r.interleaved, expected_output(pcm, bps))
