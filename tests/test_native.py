"""Native C++ core tests: cross-checks against the NumPy oracle, full-book1
reference-layout parity, and alias-builder agreement."""

import numpy as np
import pytest

from ryg_rans_tpu import native
from ryg_rans_tpu.config import RansConfig, Variant
from ryg_rans_tpu.models import alias as alias_mod
from ryg_rans_tpu.models import stats
from ryg_rans_tpu.ops import reference_numpy as oracle

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native core unavailable (no g++)")

VARIANTS = [Variant.BYTE, Variant.WORD, Variant.RANS64, Variant.ALIAS]


def _cfg(variant, n_lanes, lpg, prob_bits=None):
    return RansConfig(
        variant=variant,
        prob_bits=prob_bits or
        {Variant.WORD: 12, Variant.ALIAS: 16}.get(variant, 14),
        n_lanes=n_lanes,
        lanes_per_stream=lpg,
        block_symbols=1 << 20,
    )


@pytest.mark.parametrize("variant", VARIANTS)
@pytest.mark.parametrize("n_lanes,lpg", [(1, 1), (2, 2), (8, 4), (256, 128)])
def test_native_matches_numpy_oracle(book1_head, variant, n_lanes, lpg):
    data = book1_head[:32768]
    cfg = _cfg(variant, n_lanes, lpg)
    freqs, cum = stats.build_model(data, cfg.prob_bits)

    streams_np = oracle.encode(cfg, data, freqs, cum)
    payload_c, words_c = native.encode(cfg, data, freqs, cum)

    np_words = np.array([s.size for s in streams_np], np.int64)
    assert np.array_equal(words_c, np_words)
    cat = b"".join(s.tobytes() for s in streams_np)
    assert payload_c.tobytes() == cat, f"payload mismatch {cfg}"

    dec = native.decode(cfg, payload_c, words_c, data.size, freqs, cum)
    assert np.array_equal(dec, data)


@pytest.mark.parametrize("pb", [
    20, pytest.param(31, marks=pytest.mark.slow)])
def test_native_r64_reciprocal_matches_oracle(book1_head, pb):
    """The division-free RANS64 encode (64-bit Alverson reciprocals,
    rans64.h:167-247 semantics) must produce the exact oracle stream at
    the precisions the AVX2/scalar differential can't cross-check."""
    data = book1_head[:32768]
    cfg = _cfg(Variant.RANS64, 8, 4, prob_bits=pb)
    freqs, cum = stats.build_model(data, cfg.prob_bits)

    streams_np = oracle.encode(cfg, data, freqs, cum)
    payload_c, words_c = native.encode(cfg, data, freqs, cum)

    np_words = np.array([s.size for s in streams_np], np.int64)
    assert np.array_equal(words_c, np_words)
    cat = b"".join(s.tobytes() for s in streams_np)
    assert payload_c.tobytes() == cat, f"payload mismatch {cfg}"

    dec = native.decode(cfg, payload_c, words_c, data.size, freqs, cum)
    assert np.array_equal(dec, data)


@pytest.mark.parametrize("variant,published", [
    (Variant.BYTE, 435113),    # README:48  (plain rans_byte)
    (Variant.RANS64, 435116),  # README:82
])
def test_native_reference_sizes_full_book1(book1, variant, published):
    cfg = RansConfig.reference(variant, n_lanes=1)
    freqs, cum = stats.build_model(book1, cfg.prob_bits)
    payload, words = native.encode(cfg, book1, freqs, cum)
    assert payload.size == published
    dec = native.decode(cfg, payload, words, book1.size, freqs, cum)
    assert np.array_equal(dec, book1)


@pytest.mark.parametrize("variant,lanes,published", [
    (Variant.BYTE, 2, 435117),    # README:62
    (Variant.RANS64, 2, 435120),  # README:96
    (Variant.WORD, 8, 435626),    # README:110 (8-way SIMD format)
])
def test_native_interleaved_sizes_full_book1(book1, variant, lanes, published):
    cfg = RansConfig.reference(variant, n_lanes=lanes)
    freqs, cum = stats.build_model(book1, cfg.prob_bits)
    payload, words = native.encode(cfg, book1, freqs, cum)
    assert payload.size == published
    dec = native.decode(cfg, payload, words, book1.size, freqs, cum)
    assert np.array_equal(dec, book1)


@pytest.mark.parametrize("lanes,measured", [
    (1, 435059),  # measured in this environment (BASELINE.md, alias plain)
    (2, 435063),  # alias 2-way
])
def test_native_alias_sizes_full_book1(book1, lanes, measured):
    cfg = RansConfig.reference(Variant.ALIAS, n_lanes=lanes)
    freqs, cum = stats.build_model(book1, cfg.prob_bits)
    payload, words = native.encode(cfg, book1, freqs, cum)
    assert payload.size == measured
    dec = native.decode(cfg, payload, words, book1.size, freqs, cum)
    assert np.array_equal(dec, book1)


def test_native_alias_builder_matches_numpy(book1_head):
    freqs, cum = stats.build_model(book1_head, 16)
    t_np = alias_mod.make_alias_tables(freqs, cum, 16)
    t_c = native.build_alias_tables(16, freqs, cum)
    assert np.array_equal(t_c["divider"], t_np.divider)
    assert np.array_equal(t_c["slot_freqs"], t_np.slot_freqs)
    assert np.array_equal(t_c["slot_adjust"], t_np.slot_adjust)
    assert np.array_equal(t_c["sym_id"], t_np.sym_id.astype(np.uint8))
    assert np.array_equal(t_c["alias_remap"], t_np.alias_remap)


def test_native_wide_lane_book1_roundtrip(book1):
    """Full-corpus round-trip in the TPU-wide layout (1024 lanes)."""
    cfg = _cfg(Variant.WORD, 1024, 128)
    freqs, cum = stats.build_model(book1, cfg.prob_bits)
    payload, words = native.encode(cfg, book1, freqs, cum)
    dec = native.decode(cfg, payload, words, book1.size, freqs, cum)
    assert np.array_equal(dec, book1)
    # per-lane flush overhead: 4 bytes/lane over the 8-way size
    assert payload.size < 435626 + 4 * 1024 + 64


@pytest.mark.skipif(not native.available(), reason="no native core")
def test_native_threaded_blocks_identical(book1_head, monkeypatch):
    """Block-parallel host coding (api._host_pool_map) must produce the
    byte-identical container at any worker count; blocks are independent
    and the C calls release the GIL."""
    import os
    from ryg_rans_tpu import api

    cfg = RansConfig(variant=Variant.WORD, prob_bits=12, n_lanes=64,
                     lanes_per_stream=64, block_symbols=4096)
    data = book1_head[:40000].tobytes()
    blob_seq = api.compress(data, cfg, backend="native")
    monkeypatch.setattr(os, "cpu_count", lambda: 4)
    blob_par = api.compress(data, cfg, backend="native")
    assert blob_par == blob_seq
    assert api.decompress(blob_par, backend="native") == data


@pytest.mark.parametrize("variant,pb", [
    (Variant.BYTE, 14), (Variant.WORD, 12), (Variant.RANS64, 14),
    (Variant.ALIAS, 16),
    # precision edges: fused (freq-1)<<16|cum fields saturate at pb=16;
    # pb=9 exercises the widest renorm thresholds; RANS64 20/31 cover the
    # reciprocal-encode range beyond the AVX2-decode pb<=16 window
    (Variant.BYTE, 16), (Variant.BYTE, 9), (Variant.WORD, 15),
    (Variant.ALIAS, 12), (Variant.RANS64, 20),
    pytest.param(Variant.RANS64, 31, marks=pytest.mark.slow),
])
def test_native_avx2_matches_scalar_engine(book1, variant, pb, monkeypatch):
    """Differential: the AVX2 encode AND decode paths must be
    byte-identical to the scalar lane engine on an AVX2-eligible layout
    (RANS_CORE_NO_AVX2 forces scalar; same process, getenv is read per
    call).  The odd symbol count leaves a partial final step so the
    scalar head of the vector engines runs too."""
    cfg = RansConfig(variant=variant, prob_bits=pb, n_lanes=256,
                     lanes_per_stream=64, block_symbols=1 << 18)
    data = book1[:(1 << 18) - 37]
    freqs, cum = stats.build_model(data, pb)
    payload, words = native.encode(cfg, data, freqs, cum)
    dec_simd = native.decode(cfg, payload, words, data.size, freqs, cum)
    monkeypatch.setenv("RANS_CORE_NO_AVX2", "1")
    dec_scalar = native.decode(cfg, payload, words, data.size, freqs, cum)
    p2, w2 = native.encode(cfg, data, freqs, cum)  # scalar encoder
    assert bytes(payload) == bytes(p2) and np.array_equal(words, w2)
    assert np.array_equal(dec_simd, dec_scalar)
    assert np.array_equal(dec_scalar, data)
