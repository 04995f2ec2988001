"""Multi-host orchestration tests.

Real multi-process runs need a cluster; here the single-process degenerate
path is exercised end-to-end (the gather logic is shape-generic and the
device-level sharding underneath is covered by test_sharding.py on the
8-device CPU mesh)."""

import numpy as np
import pytest

from ryg_rans_tpu.config import RansConfig, Variant
from ryg_rans_tpu.models import stats
from ryg_rans_tpu.parallel import multihost


def _cfg():
    return RansConfig(variant=Variant.WORD, prob_bits=12, n_lanes=128,
                      lanes_per_stream=128, block_symbols=2048)


def test_local_block_range_single_process():
    lo, hi = multihost.local_block_range(8)
    assert (lo, hi) == (0, 8)


@pytest.mark.parametrize("n_blocks,P", [(8, 3), (5, 2), (9, 8), (3, 5),
                                        (7, 1), (16, 4)])
def test_block_range_of_ragged_partition(n_blocks, P):
    """Ragged ownership: contiguous, ordered, covers exactly [0, n_blocks);
    first n_blocks%P processes own one extra block."""
    spans = [multihost.block_range_of(n_blocks, p, P) for p in range(P)]
    assert spans[0][0] == 0 and spans[-1][1] == n_blocks
    for (a, b), (c, d) in zip(spans, spans[1:]):
        assert b == c and b >= a and d >= c
    sizes = [b - a for a, b in spans]
    base, rem = divmod(n_blocks, P)
    assert sizes == [base + (1 if p < rem else 0) for p in range(P)]


def test_local_block_range_ragged(monkeypatch):
    monkeypatch.setattr(multihost, "process_count", lambda: 3)
    monkeypatch.setattr(multihost, "process_index", lambda: 0)
    assert multihost.local_block_range(8) == (0, 3)
    monkeypatch.setattr(multihost, "process_index", lambda: 2)
    assert multihost.local_block_range(8) == (6, 8)


def test_compress_decompress_multihost_roundtrip(book1_head):
    cfg = _cfg()
    data = book1_head[:4 * cfg.block_symbols]
    freqs, cum = stats.build_model(data, cfg.prob_bits)
    payloads = multihost.compress_multihost(data, cfg, freqs, cum,
                                            interpret=True)
    assert len(payloads) == 4
    out = multihost.decompress_multihost(payloads, cfg, data.size, freqs,
                                         cum, interpret=True)
    assert np.array_equal(out, data)


def test_allgather_payloads_single_process_identity():
    ps = [np.arange(5, dtype=np.uint16), np.arange(3, dtype=np.uint16)]
    got = multihost.allgather_payloads(ps, cap_words=16)
    assert all(np.array_equal(a, b) for a, b in zip(got, ps))
