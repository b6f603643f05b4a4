"""Skim (measure-only) index: differential tests against the full
native index and end-to-end decode equality.

The skim plan (zfi_index_skim) carries no residual rows — the
accelerator's bit-unpack kernel recomputes them from the bitstream —
so every descriptor it does carry must match the full index exactly,
and the patch list must cover precisely the positions the kernel
cannot produce.
"""

import numpy as np
import pytest

import zflac_tpu
from zflac_tpu.encoder import EncoderConfig, encode
from zflac_tpu.testing import correlated_stereo, tone_mix

pytestmark = pytest.mark.skipif(
    not __import__(
        "zflac_tpu.index.native_indexer", fromlist=["native_available"]
    ).native_available(),
    reason="native indexer unavailable")


def _skim(data):
    from zflac_tpu.index.native_indexer import build_plan_skim
    return build_plan_skim(data)


def _full(data):
    from zflac_tpu.index.native_indexer import build_plan_native
    return build_plan_native(data, emit_groups=True)


CASES = [
    ("lpc-stereo", correlated_stereo(40000, 16, seed=7), 44100, 16,
     EncoderConfig(block_size=4096)),
    ("mix-8ch", tone_mix(7000, 8, 16, seed=2), 48000, 16,
     EncoderConfig(block_size=576)),
    ("small-blocks", tone_mix(5000, 1, 8, seed=1), 8000, 8,
     EncoderConfig(block_size=192)),
    ("12bit", tone_mix(9000, 2, 12, seed=3), 32000, 12,
     EncoderConfig(block_size=1024)),
]


@pytest.mark.parametrize("name,pcm,sr,bps,cfg",
                         CASES, ids=[c[0] for c in CASES])
def test_skim_matches_full_plan(name, pcm, sr, bps, cfg):
    data = encode(pcm, sr, bps, cfg)
    full = _full(data)
    skim = _skim(data)
    assert skim is not None and skim.rows is None
    for f in ("kind", "order", "wasted", "shift", "block_size",
              "channel_code", "pcm_start", "coeffs_rev", "fixed_seeds"):
        np.testing.assert_array_equal(getattr(skim, f), getattr(full, f),
                                      err_msg=f)
    assert skim.total_samples == full.total_samples
    assert skim.max_block == full.max_block
    # Warm-ups match the leading row values.
    S = full.num_subframes
    n = min(32, full.max_block)
    warm_len = np.where(skim.kind == 0, 1, skim.order)
    col = np.arange(n)[None, :]
    mask = col < warm_len[:, None]
    np.testing.assert_array_equal(
        np.where(mask, skim.warmups[:, :n], 0),
        np.where(mask, full.rows[:, :n].astype(np.int32), 0))
    # Patch values match the full rows at their positions.
    p_sub, p_pos, p_val = skim.patches
    np.testing.assert_array_equal(
        p_val, full.rows[p_sub, p_pos].astype(np.int32))
    # Group tables agree wherever both are recorded.
    if full.groups is not None:
        assert skim.groups is not None
        np.testing.assert_array_equal(skim.groups["off"],
                                      full.groups["off"])
        np.testing.assert_array_equal(skim.groups["k"], full.groups["k"])
        np.testing.assert_array_equal(skim.groups["depth"],
                                      full.groups["depth"])


@pytest.mark.parametrize("name,pcm,sr,bps,cfg",
                         CASES, ids=[c[0] for c in CASES])
def test_skim_decode_bit_exact(name, pcm, sr, bps, cfg):
    data = encode(pcm, sr, bps, cfg)
    r0 = zflac_tpu.decode(data, engine="native")
    skim = _skim(data)
    assert skim is not None and skim.rows is None  # skim path in play
    r1 = zflac_tpu.decode(data, engine="tpu", device_unpack=True)
    np.testing.assert_array_equal(r0.interleaved, r1.interleaved)


def test_skim_covers_invalid_groups_with_patches():
    """Every group position the kernel cannot produce must be patched:
    reconstruct rows host-side from (groups, warmups, patches) and
    compare to the full rows."""
    from zflac_tpu.ops.rice import G, K_INVALID
    pcm = correlated_stereo(30000, 16, seed=11)
    data = encode(pcm, 44100, 16, EncoderConfig(block_size=1536))
    full = _full(data)
    skim = _skim(data)
    S, B = full.num_subframes, full.max_block
    rows = np.zeros((S, B), np.int32)
    # valid groups' positions are produced by the kernel (trusted here;
    # test_rice_kernel pins that); take them from full rows.
    if skim.groups is not None:
        k = skim.groups["k"]
        gpb = k.shape[1]
        gv = np.repeat(k != K_INVALID, G, axis=1)[:, :B]
        rows = np.where(gv, full.rows.astype(np.int32), rows)
    warm_len = np.where(skim.kind == 0, 1, skim.order)
    col = np.arange(B)[None, :]
    n = min(32, B)
    rows[:, :n] = np.where(col[:, :n] < warm_len[:, None],
                           skim.warmups[:, :n], rows[:, :n])
    p_sub, p_pos, p_val = skim.patches
    rows[p_sub, p_pos] = p_val
    bs_sub = np.repeat(skim.block_size, skim.channels)
    rows = np.where(col < bs_sub[:, None], rows, 0)
    np.testing.assert_array_equal(rows, full.rows.astype(np.int32))


def test_skim_wide_stream_falls_back():
    pcm = tone_mix(4000, 2, 24, seed=5)
    data = encode(pcm, 96000, 24, EncoderConfig(block_size=256))
    assert _skim(data) is None  # int64 path: unsupported, caller falls back
    r0 = zflac_tpu.decode(data, engine="native")
    r1 = zflac_tpu.decode(data, engine="tpu", device_unpack=True)
    np.testing.assert_array_equal(r0.interleaved, r1.interleaved)
