"""profiling + debug utility tests."""

import numpy as np
import pytest

from ryg_rans_tpu.config import BYTE_SPEC, RansConfig, Variant, WORD_SPEC
from ryg_rans_tpu.models import stats
from ryg_rans_tpu.ops import reference_numpy as oracle
from ryg_rans_tpu.utils import debug, profiling


def test_poison_buffer():
    p = debug.poison(16)
    assert (p == 0xCC).all()


def test_state_invariants_pass_on_real_stream(book1_head):
    cfg = RansConfig(variant=Variant.WORD, prob_bits=12, n_lanes=8,
                     lanes_per_stream=8, block_symbols=4096)
    data = book1_head[:4096]
    freqs, cum = stats.build_model(data, cfg.prob_bits)
    streams = oracle.encode(cfg, data, freqs, cum)
    x = debug.decode_states_from_head(cfg, streams[0])
    debug.check_state_invariants(x, WORD_SPEC)


def test_state_invariants_catch_bad_state():
    with pytest.raises(AssertionError, match="outside"):
        debug.check_state_invariants(np.array([1], np.uint64), BYTE_SPEC)
    with pytest.raises(AssertionError, match="outside"):
        debug.check_state_invariants(
            np.array([1 << 33], np.uint64), BYTE_SPEC)


def test_check_stream_counts(book1_head):
    cfg = RansConfig(variant=Variant.BYTE, prob_bits=14, n_lanes=4,
                     lanes_per_stream=2, block_symbols=4096)
    data = book1_head[:4096]
    freqs, cum = stats.build_model(data, cfg.prob_bits)
    streams = oracle.encode(cfg, data, freqs, cum)
    debug.check_stream_counts(cfg, [streams])
    with pytest.raises(AssertionError, match="head"):
        debug.check_stream_counts(cfg, [[streams[0][:2], streams[1]]])


def test_timed_runs_and_report():
    best, times = profiling.timed_runs(lambda: 42, runs=3)
    assert len(times) == 3 and best <= max(times)
    line = profiling.report_line("decode", 1 << 20, 0.001)
    assert "MiB/s" in line and "ns/symbol" in line


def test_dispatch_slope_linear():
    import time as _t

    def make(reps):
        return lambda: _t.sleep(0.002 * reps)

    per = profiling.dispatch_slope(make, lo=1, hi=5, tries=2)
    assert 0.001 < per < 0.004


def test_logging_emits_routing_and_summary(book1_head, caplog):
    import logging

    from ryg_rans_tpu import api

    with caplog.at_level(logging.DEBUG, logger="ryg_rans_tpu"):
        blob = api.compress(book1_head[:5000].tobytes(),
                            RansConfig(variant=Variant.WORD, prob_bits=12,
                                       n_lanes=64, lanes_per_stream=64,
                                       block_symbols=4096),
                            backend="numpy")
    text = caplog.text
    assert "backend=numpy" in text
    assert "container:" in text and "blocks" in text
