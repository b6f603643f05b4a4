"""Seek/partial decode and tolerant (resync) decode."""

import numpy as np
import pytest

from conftest import expected_output
from zflac_tpu.encoder import EncoderConfig, encode
from zflac_tpu.index import build_plan_py
from zflac_tpu.index.native_indexer import native_available
from zflac_tpu.runtime.seek import decode_range, decode_tolerant
from zflac_tpu.testing import correlated_stereo, tone_mix


def _stream(n=16 * 1024, bs=1024, **kw):
    pcm = correlated_stereo(n, 16, seed=21)
    return encode(pcm, 44100, 16, EncoderConfig(block_size=bs, **kw)), pcm


@pytest.mark.parametrize("start,count", [
    (0, 100), (1000, 4096), (5000, 1), (16 * 1024 - 10, 100),
    (3000, 10000),
])
def test_decode_range(start, count):
    data, pcm = _stream()
    r = decode_range(data, start, count)
    end = min(start + count, len(pcm))
    np.testing.assert_array_equal(
        r.interleaved, expected_output(pcm[start:end], 16))


def test_decode_range_via_seektable():
    from zflac_tpu.index.native_indexer import native_available
    if not native_available():
        pytest.skip("needs native")
    pcm = correlated_stereo(128 * 1024, 16, seed=23)
    data = encode(pcm, 44100, 16,
                  EncoderConfig(block_size=4096, seektable_every=16384))
    r = decode_range(data, 100000, 4000)
    assert r.stats["engine"] == "seektable"
    np.testing.assert_array_equal(
        r.interleaved, expected_output(pcm[100000:104000], 16))
    # Range straddling a seek point boundary.
    r2 = decode_range(data, 16384 - 100, 300)
    np.testing.assert_array_equal(
        r2.interleaved,
        expected_output(pcm[16384 - 100:16384 + 200], 16))


def test_decode_range_variable_blocking():
    pcm = tone_mix(8000, 2, 16, seed=22)
    data = encode(pcm, 44100, 16,
                  EncoderConfig(block_size=1024, variable_blocking=True))
    r = decode_range(data, 2500, 3000)
    np.testing.assert_array_equal(
        r.interleaved, expected_output(pcm[2500:5500], 16))


@pytest.mark.skipif(not native_available(), reason="needs native")
class TestTolerant:
    def test_clean_stream(self):
        data, pcm = _stream()
        r = decode_tolerant(data)
        assert r.stats["resyncs"] == 0 and r.stats["md5_ok"]
        np.testing.assert_array_equal(r.interleaved,
                                      expected_output(pcm, 16))

    def test_corrupt_middle(self):
        data, pcm = _stream()
        plan = build_plan_py(data)
        # Smash a few bytes inside frame 7's residuals.
        bad = bytearray(data)
        off = int(plan.frame_byte_offset[7]) + 40
        for i in range(8):
            bad[off + i] ^= 0xA5
        r = decode_tolerant(bytes(bad))
        assert r.stats["resyncs"] >= 1
        assert not r.stats["md5_ok"]
        assert r.num_samples == len(pcm)
        # Everything outside the damaged frame's span decodes exactly.
        exp = expected_output(pcm, 16).reshape(-1, 2)
        got = r.samples
        np.testing.assert_array_equal(got[:7 * 1024], exp[:7 * 1024])
        np.testing.assert_array_equal(got[8 * 1024:], exp[8 * 1024:])

    def test_corrupt_two_regions(self):
        data, pcm = _stream()
        plan = build_plan_py(data)
        bad = bytearray(data)
        for f in (3, 11):
            off = int(plan.frame_byte_offset[f]) + 30
            for i in range(4):
                bad[off + i] ^= 0x77
        r = decode_tolerant(bytes(bad))
        assert r.stats["resyncs"] >= 1
        exp = expected_output(pcm, 16).reshape(-1, 2)
        got = r.samples
        np.testing.assert_array_equal(got[4 * 1024:11 * 1024],
                                      exp[4 * 1024:11 * 1024])
        np.testing.assert_array_equal(got[12 * 1024:], exp[12 * 1024:])


def test_corruption_in_large_stream_raises_typed_error():
    """Corruption inside a stream large enough to engage the threaded
    cursor engine: whatever segment the damage lands in, decode must
    end in a typed error (MD5 mismatch at minimum), never silent wrong
    output — this also exercises the engine's flush-on-error path and
    the landing chain-verify fallback."""
    import numpy as np
    import pytest

    import zflac_tpu
    import zflac_tpu.errors as err
    from zflac_tpu.encoder import EncoderConfig, encode
    from zflac_tpu.testing import correlated_stereo

    pcm = correlated_stereo(600_000, 16, seed=21)
    data = bytearray(encode(pcm, 44100, 16, EncoderConfig(block_size=4096)))
    assert len(data) > (1 << 20)
    for frac in (0.25, 0.5, 0.9):
        bad = data.copy()
        bad[int(len(bad) * frac)] ^= 0x10
        with pytest.raises(err.FlacError):
            zflac_tpu.decode(bytes(bad))
    # The pristine stream still decodes bit-exactly afterwards.
    r = zflac_tpu.decode(bytes(data))
    np.testing.assert_array_equal(r.samples, pcm.astype(np.int16))


def test_tolerant_decode_large_stream_recovers():
    """decode_tolerant on a large corrupted stream: resync confines the
    damage and everything outside the damaged region is bit-exact."""
    import numpy as np

    import zflac_tpu
    from zflac_tpu.encoder import EncoderConfig, encode
    from zflac_tpu.testing import correlated_stereo

    n, bs = 600_000, 4096
    pcm = correlated_stereo(n, 16, seed=22)
    data = bytearray(encode(pcm, 44100, 16, EncoderConfig(block_size=bs)))
    data[len(data) // 2] ^= 0xFF
    r = zflac_tpu.decode_tolerant(bytes(data))
    assert r.num_samples == n
    good = r.samples == pcm.astype(np.int16)
    # Damage stays localized: the overwhelming majority is intact and
    # the head/tail are untouched.
    assert good[: n // 4].all() and good[-n // 4:].all()
    assert good.mean() > 0.95
