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
