"""Multi-chip equivalence: the frame-parallel sharded decode must be
bit-identical to the single-device path on a virtual 8-device CPU mesh
(SURVEY.md §4 — the distributed tests the reference never had)."""

import numpy as np
import pytest

import jax

from zflac_tpu.encoder import EncoderConfig, encode
from zflac_tpu.index import build_plan_py
from zflac_tpu.parallel import make_mesh, reconstruct_sharded
from zflac_tpu.runtime.decode import _run_reconstruct
from zflac_tpu.testing import correlated_stereo, tone_mix


def cpu_devices(n):
    devs = jax.devices("cpu")
    if len(devs) < n:
        pytest.skip(f"need {n} cpu devices, have {len(devs)}")
    return devs[:n]


@pytest.mark.parametrize("n_dev", [2, 4, 8])
@pytest.mark.parametrize("frames", [8, 13])
def test_sharded_equals_single(n_dev, frames):
    pcm = correlated_stereo(frames * 512, 16, seed=frames)
    data = encode(pcm, 44100, 16, EncoderConfig(block_size=512))
    plan = build_plan_py(data)
    mesh = make_mesh(cpu_devices(n_dev))
    sharded, total = reconstruct_sharded(plan, mesh)
    single = _run_reconstruct(plan)
    np.testing.assert_array_equal(sharded,
                                  single[:, :sharded.shape[1]])


def test_sharded_highres_multichannel():
    pcm = tone_mix(6 * 256, 4, 24, seed=5)
    data = encode(pcm, 96000, 24, EncoderConfig(block_size=256))
    plan = build_plan_py(data)
    mesh = make_mesh(cpu_devices(4))
    sharded, _ = reconstruct_sharded(plan, mesh)
    single = _run_reconstruct(plan)
    np.testing.assert_array_equal(sharded, single[:, :sharded.shape[1]])


def test_graft_entry_dryrun():
    import __graft_entry__
    __graft_entry__.dryrun_multichip(8)
