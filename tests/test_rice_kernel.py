"""Group-table differential tests: the C++ scan's measured-offset Rice
group table, extracted via the reference math in ops/rice.py, must
reproduce the host-decoded residual rows bit-exactly across the corpus
(int32 streams), including escaped partitions, deep partition orders,
wasted bits, and short final frames. (The production device extraction
is the pack2 path, ops/rice16.py; this pins the group-recording walk
the C++ scan shares with it.)"""

import numpy as np
import pytest

from zflac_tpu.index.native_indexer import (
    build_plan_native,
    native_available,
)
from zflac_tpu.ops.rice import rows_from_groups
from zflac_tpu.testing import make_corpus

pytestmark = pytest.mark.skipif(
    not native_available(), reason="native indexer unavailable")

_NAMES = sorted(make_corpus().keys())


@pytest.mark.parametrize("name", _NAMES)
def test_kernel_rows_match_host(name, corpus):
    """Every stream, including int64 (hi-res) plans: Rice-coded
    residuals always fit int32 (RFC 9639), so the extracted rows are
    compared in the int32 wrap domain — exact for every group-table
    position; warm-up/verbatim positions come from the host rows on
    both sides (the only values that can exceed int32, and not what
    this test extracts). Previously int64 streams skipped outright."""
    data, pcm, sr, bps = corpus[name]
    plan = build_plan_native(data, emit_groups=True)
    rows = rows_from_groups(data, plan, impl="jnp")
    np.testing.assert_array_equal(rows, plan.rows.astype(np.int32))


def test_group_table_sanity(corpus):
    data, *_ = corpus["lpc order 8"]
    plan = build_plan_native(data, emit_groups=True)
    g = plan.groups
    valid = g["k"] != 0xFF
    # Most groups of a Rice-coded stream are kernel-eligible.
    assert valid.mean() > 0.5
    # Offsets strictly increase along each subframe's valid groups.
    for s in range(plan.num_subframes):
        offs = g["off"][s][valid[s]]
        assert np.all(np.diff(offs) > 0)
