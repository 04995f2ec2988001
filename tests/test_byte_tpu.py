"""TPU BYTE/ALIAS-variant kernel tests (Pallas interpret mode on CPU; the
same code path compiles on real TPU)."""

import numpy as np
import pytest

from ryg_rans_tpu.config import RansConfig, Variant
from ryg_rans_tpu.models import alias as alias_mod
from ryg_rans_tpu.models import stats
from ryg_rans_tpu.ops import byte_tpu
from ryg_rans_tpu.ops import reference_numpy as oracle


def _cfg(variant, n_lanes=128, block_symbols=1 << 13):
    from ryg_rans_tpu.config import DEFAULT_PROB_BITS
    return RansConfig(variant=variant, prob_bits=DEFAULT_PROB_BITS[variant],
                      n_lanes=n_lanes, lanes_per_stream=n_lanes,
                      block_symbols=block_symbols)


@pytest.mark.parametrize("variant", [Variant.BYTE, Variant.ALIAS])
# 17000 spans two full blocks -> exercises the encode kernel's ilp=2 path
@pytest.mark.parametrize("size", [
    2048, pytest.param(9000, marks=pytest.mark.slow),
    pytest.param(17000, marks=pytest.mark.slow)])
def test_tpu_encode_matches_oracle(book1_head, variant, size):
    cfg = _cfg(variant)
    data = book1_head[:size]
    freqs, cum = stats.build_model(data, cfg.prob_bits)
    from ryg_rans_tpu.ops import word_tpu
    padded, _ = word_tpu.pad_block(data, cfg.n_lanes, freqs)

    blocks, padded_size = byte_tpu.encode(cfg, data, freqs, cum,
                                          interpret=True)
    assert padded_size == padded.size

    B = cfg.block_symbols
    off = 0
    for blk in blocks:
        chunk = padded[off:off + B]
        ref = oracle.encode(cfg, chunk, freqs, cum)[0]
        assert blk.size == ref.size
        assert np.array_equal(blk, ref)
        off += chunk.size


@pytest.mark.parametrize("sb", [
    pytest.param(9, marks=pytest.mark.slow), 12,
    pytest.param(16, marks=pytest.mark.slow)])
@pytest.mark.parametrize(
    "size", [2048, pytest.param(17000, marks=pytest.mark.slow)])
def test_alias_seed_bisect_matches_standard(book1_head, sb, size):
    """The seeded encoder (pack_alias_seed, r4 A/B: per-symbol lo4 bounds
    the segment bisect to 5 levels) must emit streams byte-identical to
    the hoisted-constant path."""
    cfg = RansConfig(variant=Variant.ALIAS, prob_bits=sb, n_lanes=128,
                     lanes_per_stream=128, block_symbols=1 << 13)
    data = book1_head[:size]
    freqs, cum = stats.build_model(data, cfg.prob_bits)
    assert byte_tpu.pack_alias_seed(freqs, cum, sb) is not None
    std, n1 = byte_tpu.encode(cfg, data, freqs, cum, interpret=True)
    seeded, n2 = byte_tpu.encode(cfg, data, freqs, cum, interpret=True,
                                 seed_bisect=True)
    assert n1 == n2 and len(std) == len(seeded)
    for a, b in zip(std, seeded):
        assert np.array_equal(a, b)


@pytest.mark.slow
def test_alias_seed_declines_wide_bands():
    """A model whose dominant symbol spans more segments than the depth-5
    reach makes pack_alias_seed return None, and encode() falls back to
    the standard path (still byte-identical round-trip)."""
    rng = np.random.default_rng(7)
    # one symbol at ~97%: it is the alias donor in most buckets, so its
    # band of segments far exceeds 31
    data = np.where(rng.random(20000) < 0.97, 65,
                    rng.integers(0, 256, 20000)).astype(np.uint8)
    freqs, cum = stats.build_model(data, 16)
    if byte_tpu.pack_alias_seed(freqs, cum, 16) is not None:
        pytest.skip("model unexpectedly seedable; fallback path untested")
    cfg = RansConfig(variant=Variant.ALIAS, prob_bits=16, n_lanes=128,
                     lanes_per_stream=128, block_symbols=1 << 13)
    std, _ = byte_tpu.encode(cfg, data, freqs, cum, interpret=True)
    fb, _ = byte_tpu.encode(cfg, data, freqs, cum, interpret=True,
                            seed_bisect=True)  # declines -> standard
    for a, b in zip(std, fb):
        assert np.array_equal(a, b)


@pytest.mark.parametrize("variant", [Variant.BYTE, Variant.ALIAS])
@pytest.mark.parametrize("size", [2048, 9000, 20000])
def test_tpu_decode_roundtrip(book1_head, variant, size):
    cfg = _cfg(variant)
    data = book1_head[:size]
    freqs, cum = stats.build_model(data, cfg.prob_bits)
    blocks, padded_size = byte_tpu.encode(cfg, data, freqs, cum,
                                          interpret=True)
    dec = byte_tpu.decode(cfg, blocks, padded_size, freqs, cum,
                          interpret=True)
    assert np.array_equal(dec[:size], data)


@pytest.mark.parametrize("variant", [Variant.BYTE, Variant.ALIAS])
def test_tpu_decodes_oracle_stream(book1_head, variant):
    cfg = _cfg(variant)
    data = book1_head[:4096]
    freqs, cum = stats.build_model(data, cfg.prob_bits)
    from ryg_rans_tpu.ops import word_tpu
    padded, orig = word_tpu.pad_block(data, cfg.n_lanes, freqs)
    streams = oracle.encode(cfg, padded, freqs, cum)
    dec = byte_tpu.decode(cfg, [streams[0]], padded.size, freqs, cum,
                          interpret=True)
    assert np.array_equal(dec[:orig], data)


@pytest.mark.parametrize("sb", [12, 16])
def test_alias_segments_reproduce_remap(book1_head, sb):
    """The packed segment decomposition must reproduce alias_remap exactly
    (entry e at (e & 3, e >> 2), value (delta mod M) << 16 | start, pad =
    repeat of the last segment)."""
    freqs, cum = stats.build_model(book1_head, sb)
    tab = alias_mod.make_alias_tables(freqs, cum, sb)
    sp = byte_tpu.build_alias_segments(freqs, cum, sb)
    assert sp.shape == (4, 128) and sp.dtype == np.int32
    packed = sp.view(np.uint32).T.reshape(-1)  # entry order
    starts = (packed & 0xFFFF).astype(np.int64)
    dmod = (packed >> 16).astype(np.int64)
    assert np.all(np.diff(starts) >= 0)  # sorted incl. pad repeats
    M = 1 << sb
    idx = np.arange(M, dtype=np.int64)
    seg = np.searchsorted(starts, idx, side="right") - 1
    got = (idx + dmod[seg]) % M
    assert np.array_equal(got, tab.alias_remap.astype(np.int64))


@pytest.mark.parametrize("pb", [15, 16])
def test_byte_high_precision_roundtrip(book1_head, pb):
    """BYTE at the reference's full prob_bits range (rans_byte.h:176 allows
    <= 16); freq-1 fc packing keeps the 16-bit field exact."""
    cfg = RansConfig(variant=Variant.BYTE, prob_bits=pb, n_lanes=128,
                     lanes_per_stream=128, block_symbols=4096)
    data = book1_head[:8192]
    freqs, cum = stats.build_model(data, pb)
    blocks, padded_size = byte_tpu.encode(cfg, data, freqs, cum,
                                          interpret=True)
    ref = oracle.encode(cfg, data[:4096], freqs, cum)[0]
    assert np.array_equal(blocks[0], ref)
    dec = byte_tpu.decode(cfg, blocks, padded_size, freqs, cum,
                          interpret=True)
    assert np.array_equal(dec[:data.size], data)


def test_byte_single_symbol_model_pb16():
    """Degenerate all-one-symbol data at prob_bits 16: freq = 2^16 must
    survive the freq-1 packing on both encode and decode tables."""
    cfg = RansConfig(variant=Variant.BYTE, prob_bits=16, n_lanes=128,
                     lanes_per_stream=128, block_symbols=4096)
    data = np.full(4096, 55, np.uint8)
    freqs, cum = stats.build_model(data, cfg.prob_bits)
    assert int(freqs[55]) == 1 << 16
    blocks, padded_size = byte_tpu.encode(cfg, data, freqs, cum,
                                          interpret=True)
    ref = oracle.encode(cfg, data, freqs, cum)[0]
    assert np.array_equal(blocks[0], ref)
    dec = byte_tpu.decode(cfg, blocks, padded_size, freqs, cum,
                          interpret=True)
    assert np.array_equal(dec[:data.size], data)


def test_byte_renorm_worst_case(rng):
    """A skewed model exercising the 2-bytes-per-symbol renorm path: rare
    symbols (freq 1 at prob_bits 14) force maximal emission."""
    cfg = RansConfig(variant=Variant.BYTE, prob_bits=14, n_lanes=128,
                     lanes_per_stream=128, block_symbols=8192)
    # heavily skewed: mostly symbol 0, occasional rare bytes
    data = np.zeros(8192, np.uint8)
    ridx = rng.integers(0, data.size, 300)
    data[ridx] = rng.integers(1, 256, 300).astype(np.uint8)
    freqs, cum = stats.build_model(data, cfg.prob_bits)
    blocks, padded_size = byte_tpu.encode(cfg, data, freqs, cum,
                                          interpret=True)
    ref = oracle.encode(cfg, data, freqs, cum)[0]
    assert len(blocks) == 1
    assert np.array_equal(blocks[0], ref)
    dec = byte_tpu.decode(cfg, blocks, padded_size, freqs, cum,
                          interpret=True)
    assert np.array_equal(dec[:data.size], data)


def test_alias_single_symbol_model_pb16():
    """Degenerate one-symbol model through the 6-row alias decode tables
    (r3 repack): slot_freqs = 2^16 must survive the freq-1 field, and the
    never-selected zero-slot halves must stay harmless."""
    cfg = RansConfig(variant=Variant.ALIAS, prob_bits=16, n_lanes=128,
                     lanes_per_stream=128, block_symbols=4096)
    data = np.full(4096, 200, np.uint8)
    freqs, cum = stats.build_model(data, cfg.prob_bits)
    assert int(freqs[200]) == 1 << 16
    blocks, padded_size = byte_tpu.encode(cfg, data, freqs, cum,
                                          interpret=True)
    ref = oracle.encode(cfg, data, freqs, cum)[0]
    assert np.array_equal(blocks[0], ref)
    dec = byte_tpu.decode(cfg, blocks, padded_size, freqs, cum,
                          interpret=True)
    assert np.array_equal(dec[:data.size], data)


def test_alias_dec_table_pack_fields(book1_head):
    """The fused 32-bit alias entry (adj_lo:8|freq-1:16|sym:8) and the
    4-packed adj_hi plane reproduce the raw AliasTables fields."""
    from ryg_rans_tpu.models import alias as alias_mod

    freqs, cum = stats.build_model(book1_head, 16)
    tab = alias_mod.make_alias_tables(freqs, cum, 16)
    div2, pa, adjhi = byte_tpu.pack_alias_dec_tables(freqs, cum, 16)
    div2 = div2.reshape(-1).view(np.uint32)
    pa = pa.reshape(-1).view(np.uint32)
    adjhi = adjhi.reshape(-1).view(np.uint32)
    for b2 in range(512):
        # parity-split planes (r4): even entries first, then odd
        e = int(pa[(b2 & 1) * 256 + (b2 >> 1)])
        ah = (int(adjhi[b2 >> 2]) >> ((b2 & 3) * 8)) & 0xFF
        adj = (ah << 8) | (e >> 24)
        # stored mod 2^16: the true adjust may be a wrapped negative or
        # exactly 2^16 (pack_alias_dec_tables), and slot - adj is decoded
        # with 16-bit wrapped arithmetic
        assert adj == int(tab.slot_adjust[b2]) & 0xFFFF
        assert (e & 0xFF) == int(tab.sym_id[b2])
        if tab.slot_freqs[b2] > 0:
            assert ((e >> 8) & 0xFFFF) + 1 == int(tab.slot_freqs[b2])
    for b in range(256):
        dv = (int(div2[b >> 1]) >> ((b & 1) * 16)) & 0xFFFF
        assert dv == int(tab.divider[b]) - b * 256  # bucket-relative


def test_alias_wrapped_adjust_model():
    """Uniform-ish models can produce slot_adjust values outside [0, 2^16)
    (wrapped negatives, or exactly 2^16 on never-selected halves); the
    16-bit wrapped subtract must still decode exactly.  Regression for the
    r3 repack (found by the entropy-robustness probe)."""
    rng = np.random.default_rng(3)
    data = rng.integers(0, 256, 20000, dtype=np.uint8)
    freqs, cum = stats.build_model(data, 16)
    tab = alias_mod.make_alias_tables(freqs, cum, 16)
    assert tab.slot_adjust.max() >= (1 << 16)  # the shape that bit
    cfg = RansConfig(variant=Variant.ALIAS, prob_bits=16, n_lanes=256,
                     lanes_per_stream=256, block_symbols=8192)
    # the MODEL (from all 20000 samples) is what wraps; one block of it
    # exercises the kernel's 16-bit wrapped subtract at 1/4 the steps
    chunk = data[:8192]
    blocks, padded_size = byte_tpu.encode(cfg, chunk, freqs, cum,
                                          interpret=True)
    dec = byte_tpu.decode(cfg, blocks, padded_size, freqs, cum,
                          interpret=True)
    assert np.array_equal(dec[:chunk.size], chunk)
