"""Differential tests: native C++ indexer vs Python indexer — identical
plans on every corpus stream, identical typed errors on faulty inputs."""

import numpy as np
import pytest

from zflac_tpu.index.native_indexer import (
    build_plan_native,
    native_available,
)
from zflac_tpu.index.py_indexer import build_plan as build_plan_py
from zflac_tpu.testing import make_corpus

pytestmark = pytest.mark.skipif(
    not native_available(), reason="native indexer unavailable")

_NAMES = sorted(make_corpus().keys())


@pytest.mark.parametrize("name", _NAMES)
def test_native_plan_matches_python(name, corpus):
    data, pcm, sr, bps = corpus[name]
    p = build_plan_py(data)
    n = build_plan_native(data)
    assert n.info == p.info
    assert (n.sample_rate, n.channels, n.bits_per_sample) == \
        (p.sample_rate, p.channels, p.bits_per_sample)
    assert n.total_samples == p.total_samples
    for field in ("block_size", "channel_code", "pcm_start",
                  "frame_byte_offset", "kind", "order", "wasted", "shift",
                  "coeffs_rev", "fixed_seeds", "wide", "rows"):
        np.testing.assert_array_equal(
            getattr(n, field), getattr(p, field), err_msg=field)
    assert n.rows.dtype == p.rows.dtype


@pytest.mark.parametrize("name", _NAMES[::3])
def test_native_crc(name, corpus):
    data, *_ = corpus[name]
    build_plan_native(data, check_crc=True)


def test_native_errors(corpus):
    data, *_ = corpus[sorted(corpus)[0]]
    cases = [
        (b"XLaC" + data[4:],),
        (data[: len(data) // 2],),
        (data[:4] + bytes([0x80 | 99]) + data[5:],),
        (b"",),
    ]
    for (bad,) in cases:
        try:
            build_plan_py(bad)
            py_exc = None
        except Exception as e:
            py_exc = type(e)
        try:
            build_plan_native(bad)
            nat_exc = None
        except Exception as e:
            nat_exc = type(e)
        assert py_exc == nat_exc, (py_exc, nat_exc)


@pytest.mark.parametrize("name", _NAMES)
def test_native_inline_md5(name, corpus):
    """The C++ inline MD5 (overlapped with the parallel decode) must
    equal hashlib over the same smallest-whole-byte LE sample bytes for
    every corpus entry, including the 3-of-4-byte 17-24-bit packing
    (zflac.zig:267-277)."""
    import hashlib

    from zflac_tpu.index.native_indexer import decode_native_parallel
    from zflac_tpu.runtime.decode import verify_stream_md5

    data, *_ = corpus[name]
    arr, meta = decode_native_parallel(data)
    assert meta["computed_md5"] is not None
    bps = meta["si_bits_per_sample"]
    nbytes = (bps + 7) // 8
    if nbytes == 3:
        raw = arr.astype("<i4").tobytes()
        raw = b"".join(raw[i:i + 3] for i in range(0, len(raw), 4))
    else:
        raw = arr.astype(f"<i{nbytes}", copy=False).tobytes()
    assert meta["computed_md5"] == hashlib.md5(raw).digest()
    assert verify_stream_md5(arr, bps, meta["computed_md5"])


def _mixed_big_stream(bps=16, seed=3):
    """~1.5 MB stream that drives the threaded cursor engine (it only
    engages above 1 MB): mixed subframe kinds/orders across frames,
    stereo decorrelation variety, a constant stretch, and wasted bits."""
    import numpy as np

    from zflac_tpu.encoder import EncoderConfig, encode
    from zflac_tpu.testing import correlated_stereo

    n = 600_000
    pcm = correlated_stereo(n, bps, seed=seed)
    # Constant stretch (constant subframes) and a wasted-bits stretch.
    pcm[5000:15000] = 57
    pcm[30000:40000] &= ~np.int64(0xF)
    return encode(pcm, 44100, bps, EncoderConfig(block_size=4096)), pcm


@pytest.mark.parametrize("bps", [8, 16])
def test_native_parallel_decode_large_mixed(bps):
    """Threaded cursor engine (anchors + deferred batched
    reconstruction + inline MD5) vs the sequential scalar decoder on a
    stream large enough to engage it — bit-exact, same MD5."""
    import hashlib

    from zflac_tpu.index.native_indexer import (
        decode_cpu_native,
        decode_native_parallel,
    )

    data, _ = _mixed_big_stream(bps=bps)
    arr, meta = decode_native_parallel(data)
    base, bmeta = decode_cpu_native(data)
    np.testing.assert_array_equal(arr, base)
    assert meta["computed_md5"] == hashlib.md5(
        base.astype(f"<i{(bps + 7) // 8}", copy=False).tobytes()).digest()
    assert meta["computed_md5"] == bmeta["md5"]


_BIG_CONFIGS = [
    # Each tuple drives a distinct fast-path shape of the threaded
    # cursor engine: odd block sizes hit the SIMD tail loops and the
    # group kernel's scalar tail; escapes/Rice2 bypass the
    # triple-consume loops; order 16 exceeds the group-kernel ceiling
    # (scalar passthrough lane); verbatim is a pure passthrough lane.
    ("odd-bs", dict(block_size=725)),
    ("escape", dict(block_size=4096, force_escape=True)),
    ("rice2", dict(block_size=4096, coding_method=1)),
    ("lpc16", dict(block_size=4096, max_lpc_order=16)),
    ("verbatim", dict(block_size=1024, subframe_mode="verbatim")),
    ("fixed", dict(block_size=2048, subframe_mode=("fixed", 2))),
    ("po-deep", dict(block_size=4096, partition_order=8)),
    ("stereo-cycle", dict(block_size=4096,
                          stereo_mode=["independent", "left_side",
                                       "side_right", "mid_side"])),
]


@pytest.mark.parametrize("name,opts",
                         _BIG_CONFIGS, ids=[c[0] for c in _BIG_CONFIGS])
def test_native_parallel_decode_large_configs(name, opts):
    """Every engine fast-path shape on streams large enough to engage
    the threaded cursor path, bit-exact vs the sequential decoder."""
    from zflac_tpu.encoder import EncoderConfig, encode
    from zflac_tpu.index.native_indexer import (
        decode_cpu_native,
        decode_native_parallel,
    )
    from zflac_tpu.testing import correlated_stereo

    n = 500_000 if name != "verbatim" else 300_000
    if "partition_order" in opts:
        # A forced partition order must divide every block (encoder
        # contract), so the stream length must be a block multiple.
        n = 128 * opts["block_size"]
    pcm = correlated_stereo(n, 16, seed=len(name))
    data = encode(pcm, 44100, 16, EncoderConfig(**opts))
    assert len(data) > (1 << 20), "stream too small to engage engine"
    arr, meta = decode_native_parallel(data)
    base, bmeta = decode_cpu_native(data)
    np.testing.assert_array_equal(arr, base)
    assert meta["computed_md5"] == bmeta["md5"]


@pytest.mark.parametrize("ch", [1, 3, 6, 8])
def test_native_parallel_decode_multichannel(ch):
    """Mono and surround through the threaded engine's batched
    reconstruction (1-8 lanes per frame), bit-exact vs sequential."""
    from zflac_tpu.encoder import EncoderConfig, encode
    from zflac_tpu.index.native_indexer import (
        decode_cpu_native,
        decode_native_parallel,
    )
    from zflac_tpu.testing import tone_mix

    pcm = tone_mix(400_000 // ch * 2, ch, 16, seed=ch)
    data = encode(pcm, 48000, 16, EncoderConfig(block_size=2048))
    assert len(data) > (1 << 18)
    a, am = decode_native_parallel(data)
    b, bm = decode_cpu_native(data)
    np.testing.assert_array_equal(a, b)
    assert am["computed_md5"] == bm["md5"]
