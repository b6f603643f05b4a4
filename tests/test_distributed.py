"""Multi-process jax.distributed long-stream decode (SURVEY.md §4's
"CPU-simulated multi-host mode"): two REAL processes, each owning one
byte-range shard, exchanging boundary state and PCM through collectives
on the global mesh (Gloo between local CPU processes; ICI/DCN on a
pod). Asserts both processes produce the full stream bit-exactly."""

import os
import socket
import subprocess
import sys

import numpy as np
import pytest

import zflac_tpu
from zflac_tpu.encoder import EncoderConfig, encode
from zflac_tpu.index.native_indexer import native_available
from zflac_tpu.testing import correlated_stereo

pytestmark = pytest.mark.skipif(
    not native_available(), reason="native indexer unavailable")

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def _worker_env(n_local_devices: int) -> dict:
    env = dict(os.environ)
    # The axon TPU plugin (on PYTHONPATH via .axon_site) ignores
    # JAX_PLATFORMS and would hijack the backend; scrub it so the
    # worker runs on the virtual CPU device pool.
    env["PYTHONPATH"] = REPO
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = (
        f"--xla_force_host_platform_device_count={n_local_devices}")
    return env


@pytest.mark.parametrize("n_local", [2])
def test_two_process_longstream(tmp_path, n_local):
    pcm = correlated_stereo(120000, 16, seed=11)
    data = encode(pcm, 44100, 16, EncoderConfig(block_size=1024))
    stream = tmp_path / "stream.flac"
    stream.write_bytes(data)

    coordinator = f"127.0.0.1:{_free_port()}"
    procs, outs = [], []
    for pid in range(2):
        out = tmp_path / f"out{pid}.npy"
        outs.append(out)
        procs.append(subprocess.Popen(
            [sys.executable, "-m", "zflac_tpu.parallel.distributed",
             str(stream), str(out), coordinator, str(pid), "2"],
            env=_worker_env(n_local), cwd=REPO,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT))
    logs = []
    for p in procs:
        out_bytes, _ = p.communicate(timeout=300)
        logs.append(out_bytes.decode(errors="replace"))
    for p, log in zip(procs, logs):
        assert p.returncode == 0, log

    ref = zflac_tpu.decode(data).interleaved
    for out, log in zip(outs, logs):
        got = np.load(out)
        np.testing.assert_array_equal(got, ref, err_msg=log)
    # both processes decoded a 2-shard stream
    assert "'shards': 2" in logs[0] and "'processes': 2" in logs[0]


@pytest.mark.parametrize("nprocs", [2, 4])
def test_multi_process_pack2(tmp_path, nprocs):
    """The FLAGSHIP pack2 device path across real process boundaries:
    one packed chunk per global device, spec union exchanged between
    processes, shard_map + psum on the global mesh (P=2 and P=4)."""
    pcm = correlated_stereo(60000, 16, seed=12)
    data = encode(pcm, 44100, 16, EncoderConfig(block_size=1024))
    stream = tmp_path / "stream.flac"
    stream.write_bytes(data)

    coordinator = f"127.0.0.1:{_free_port()}"
    procs, outs = [], []
    for pid in range(nprocs):
        out = tmp_path / f"out{pid}.npy"
        outs.append(out)
        procs.append(subprocess.Popen(
            [sys.executable, "-m", "zflac_tpu.parallel.distributed",
             str(stream), str(out), coordinator, str(pid),
             str(nprocs), "pack2"],
            env=_worker_env(1), cwd=REPO,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT))
    logs = []
    for p in procs:
        out_bytes, _ = p.communicate(timeout=600)
        logs.append(out_bytes.decode(errors="replace"))
    for p, log in zip(procs, logs):
        assert p.returncode == 0, log

    ref = zflac_tpu.decode(data).interleaved
    for out, log in zip(outs, logs):
        got = np.load(out)
        np.testing.assert_array_equal(got, ref, err_msg=log)
    assert f"'engine': 'pack2-distributed'" in logs[0], logs[0]
    assert f"'processes': {nprocs}" in logs[0]
