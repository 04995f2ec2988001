"""Modeling-layer tests: histogram, exact normalization, lookup tables."""

import numpy as np
import pytest

from ryg_rans_tpu.models import stats, tables, alias


def test_count_freqs_book1(book1):
    f = stats.count_freqs(book1)
    assert f.sum() == book1.size
    assert (f > 0).sum() == 82  # book1 has 82 distinct symbols (SURVEY.md)


@pytest.mark.parametrize("prob_bits", [12, 14, 16])
def test_normalize_invariants(book1, prob_bits):
    raw = stats.count_freqs(book1)
    freqs, cum = stats.normalize_freqs(raw, 1 << prob_bits)
    assert cum[0] == 0 and cum[256] == 1 << prob_bits
    assert freqs.sum() == 1 << prob_bits
    # every present symbol keeps nonzero freq; absent symbols stay zero
    assert np.all(freqs[raw > 0] > 0)
    assert np.all(freqs[raw == 0] == 0)
    assert np.array_equal(cum[1:] - cum[:-1], freqs)


def test_normalize_steal_path():
    # Force the steal fixup: one huge symbol and several freq-1 symbols that
    # round to zero at a tiny target scale.
    raw = np.zeros(256, np.uint32)
    raw[0] = 100000
    raw[1:9] = 1
    freqs, cum = stats.normalize_freqs(raw, 256)
    assert freqs.sum() == 256
    assert np.all(freqs[1:9] >= 1)
    assert freqs[0] == 256 - 8


def test_normalize_rejects_empty():
    with pytest.raises(ValueError):
        stats.normalize_freqs(np.zeros(256, np.uint32), 1 << 14)


def test_cum2sym(book1_head):
    freqs, cum = stats.build_model(book1_head, 14)
    c2s = stats.cum2sym(cum, 14)
    assert c2s.shape == (1 << 14,)
    # spot-check: each slot s maps back into its symbol's range
    slots = np.arange(1 << 14)
    s = c2s[slots].astype(np.int64)
    assert np.all(cum[s] <= slots)
    assert np.all(slots < cum[s + 1])


def test_byte_enc_tables_freq1_case(book1_head):
    freqs, cum = stats.build_model(book1_head, 14)
    t = tables.build_byte_enc_tables(freqs, cum, 14)
    ones = np.where(freqs == 1)[0]
    # freq=1 symbols take the rcp=~0, shift=0, bias=start+M-1 special case
    # (rans_byte.h:199-228)
    if ones.size:
        assert np.all(t.rcp_freq[ones] == 0xFFFFFFFF)
        assert np.all(t.rcp_shift[ones] == 0)
        assert np.all(
            t.bias[ones] == (cum[ones] + (1 << 14) - 1).astype(np.uint32))


@pytest.mark.parametrize("scale_bits", [14, 16])
def test_byte_reciprocal_division_exact(book1_head, scale_bits):
    """The Alverson reciprocal must reproduce exact integer division for
    every reachable (x, freq) pair boundary (rans_byte.h:229-242)."""
    freqs, cum = stats.build_model(book1_head, scale_bits)
    t = tables.build_byte_enc_tables(freqs, cum, scale_bits)
    rng = np.random.default_rng(1)
    for s in np.where(freqs > 1)[0][:40]:
        freq = int(freqs[s])
        x_max = int(t.x_max[s])
        # x ranges over [L_renormed, x_max): sample + boundaries
        xs = np.unique(np.concatenate([
            rng.integers(1 << 16, max(x_max, 1 << 16) + 1, 512),
            np.array([x_max - 1, freq, freq - 1, freq + 1, (1 << 23)]),
        ])).astype(np.uint64)
        xs = xs[xs < max(x_max, 1 << 23)]
        q_exact = xs // freq
        q_fast = ((xs * int(t.rcp_freq[s])) >> np.uint64(32)) \
            >> np.uint64(int(t.rcp_shift[s]))
        assert np.array_equal(q_exact, q_fast), f"symbol {s} freq {freq}"


def test_rans64_reciprocal_division_exact(book1_head):
    freqs, cum = stats.build_model(book1_head, 14)
    t = tables.build_rans64_enc_tables(freqs, cum, 14)
    rng = np.random.default_rng(2)
    for s in np.where(freqs > 1)[0][:20]:
        freq = int(freqs[s])
        xs = rng.integers(1 << 31, 1 << 62, 256, dtype=np.uint64)
        q_exact = xs // np.uint64(freq)
        # mulhi64 via python ints
        rcp = int(t.rcp_freq[s])
        q_fast = np.array(
            [((int(x) * rcp) >> 64) >> int(t.rcp_shift[s]) for x in xs],
            dtype=np.uint64)
        assert np.array_equal(q_exact, q_fast)


def test_alias_table_invariants(book1_head):
    freqs, cum = stats.build_model(book1_head, 16)
    tab = alias.make_alias_tables(freqs, cum, 16)
    M = 1 << 16
    # alias_remap is a bijection on [0, M)
    assert np.array_equal(np.sort(tab.alias_remap), np.arange(M))
    # decode(encode slot) round-trip: for every cum-slot c with symbol s,
    # the alias-coded slot must decode back to (s, c - cum[s]) via the
    # divider/slot tables (main_alias.cpp:252-267 semantics).
    c2s = stats.cum2sym(cum, 16)
    c = np.arange(M, dtype=np.int64)
    s = c2s.astype(np.int64)
    xm = tab.alias_remap[c].astype(np.int64)
    bucket = xm >> 8
    b2 = 2 * bucket + (xm < tab.divider[bucket])
    assert np.array_equal(tab.sym_id[b2], s), "alias decode symbol mismatch"
    # recovered within-symbol offset must equal c - cum[s]
    rec = xm - tab.slot_adjust[b2]
    assert np.array_equal(rec, c - cum[s])
    assert np.array_equal(tab.slot_freqs[b2], freqs[s])
